"""cosmax — a TPU-native cosmology parameter-fitting framework.

A ground-up JAX/XLA/Pallas rebuild of the capabilities of the reference
suite ``franciscotln/cosmology-model-fit`` (late-time dark-energy fits
against SN / BAO / CMB-compression / cosmic-chronometer / quasar / fσ8
data), re-designed TPU-first:

* background-expansion distances are batched fixed-order Gauss–Legendre
  quadrature, ``vmap``-ed over (redshift, walker) — replacing the
  reference's per-point ``numba`` trapezoid loops and adaptive
  ``scipy.integrate.quad`` (reference: bao/desi.py:29-37,
  cmb/data_chen_compression.py:70-82);
* every probe likelihood is a pure jitted chi^2 with the covariance
  Cholesky factor inverted once at build time, so the per-evaluation
  cost is one MXU matmul (reference: sn/pantheon.py:38-40);
* sampling is an on-device affine-invariant ensemble MCMC advancing all
  walkers in lockstep under ``lax.scan``, sharded over a
  ``jax.sharding.Mesh`` for pod slices (reference: emcee +
  multiprocessing.Pool, sn/pantheon.py:77-89);
* the Gaussian-process H(z) reconstruction is exact-GP JAX with
  gradient-based hyperparameter optimisation (reference:
  cosmic_chronometers/gp_lib.py, cc_gp.py).

Quick start::

    from cosmax.configs import get_preset
    from cosmax.samplers import run_ensemble
    preset = get_preset("bao.desi")
    result = run_ensemble(preset, seed=0)

or from the shell::

    python -m cosmax.fit --preset bao.desi --model lcdm
"""

from cosmax.version import __version__

__all__ = ["__version__", "enable_x64"]


def enable_x64() -> None:
    """Enable float64 globally (CPU parity / verification mode).

    TPUs have no native f64; the fast path runs f32 (see
    ``cosmax.utils.dtypes``). Tests and parity checks against the
    reference's numpy/numba float64 numerics call this first.
    """
    import jax

    jax.config.update("jax_enable_x64", True)
