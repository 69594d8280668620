"""Growth-rate fsigma8 likelihood with Alcock-Paczynski correction.

Theory fsigma8(z) from the jitted growth ODE (cosmax.models.growth).
Each data point carries the fiducial Omega_m of its source survey; the
AP factor is

    q_i = E(z_i) D_M(z_i) / (E_fid(z_i) D_M_fid(z_i))

(reference fs8/fs8.py:31-32,75). The fiducial denominators are
parameter-independent and precomputed with scipy at build time; the
model numerators are Gauss-Legendre. An error-rescaling nuisance
``f_err`` enters as chi^2 / f_err^2 with normalisation -N ln f_err
(fs8/fs8.py:72-85).
"""

import numpy as np
import scipy.integrate
import jax.numpy as jnp

from cosmax.likelihoods.base import Term
from cosmax.models.background import e_of_z
from cosmax.models.growth import fsigma8
from cosmax.models.distances import comoving_integral_gl
from cosmax.ops.linalg import chi2_from_whitener
from cosmax.data.loaders import CovDataset


def _fiducial_denominator(z, om_fid):
    """E_fid(z) * DM_fid(z) per point for flat LCDM fiducials, in the
    reference's dimensionless convention DM = int dz'/E (fs8/fs8.py:26-32)."""
    out = np.empty(z.size, dtype=np.float64)
    for i, (zi, omi) in enumerate(zip(z, om_fid)):
        e = lambda zp: np.sqrt(omi * (1 + zp) ** 3 + (1 - omi))
        integral = scipy.integrate.quad(lambda zp: 1.0 / e(zp), 0.0, zi)[0]
        out[i] = e(zi) * integral
    return out


def build_fs8_term(
    dataset: CovDataset,
    model: str,
    f_err_param: str = "f_err",
    gl_order: int = 64,
    ode_substeps: int = 4,
    name: str = "fs8",
) -> Term:
    from cosmax.likelihoods.fastmode import fast_mode

    z = np.asarray(dataset.z, dtype=np.float64)
    fs8_obs = np.asarray(dataset.values, dtype=np.float64)
    linv = dataset.linv
    n = dataset.n
    fid_denom = _fiducial_denominator(z, np.asarray(dataset.omega_fid))

    if fast_mode():
        # Whitened rank-space residual riding the preset bundle's ONE
        # shared contraction (round 5; the round-3/4 standalone Tucker
        # program, growth_emulator.make_fs8_chi2_emulator, was 31% of
        # the multiprobe joint's wall time as a separate dispatch
        # chain). The residual is Linv(obs*q_AP(theta)) - sigma8 *
        # Linv fs8(theta)/sigma8 — two geometry-only curves — so both
        # register as one GROUP (shared orthonormal basis, measured
        # joint rank 16 vs 9+10 separate on the multiprobe box) and
        # the runtime forms the rank-space residual coefficient before
        # squaring (models.linear_chi2.make_amp_pair_chi2). The growth
        # ODE, AP comoving integrals, data multiply and covariance
        # whitening are all folded into the build-time f64 tables,
        # disk-cached per preset box; chi^2 agreement with the parity
        # path is asserted in tests/test_growth_emulator.py and
        # tests/test_linear_chi2.py.
        import jax

        from cosmax.models.growth import growth_solution
        from cosmax.models.linear_chi2 import _hash_arrays, make_amp_pair_chi2

        obs_over_fid = np.asarray(fs8_obs, np.float64) / fid_denom
        linv64 = np.asarray(linv, np.float64)

        def curve_u(flat, to_params):
            def one(th):
                p = to_params(th)
                e = e_of_z(jnp.asarray(z), p, model)
                dm = comoving_integral_gl(z, p, model, order=gl_order)
                return (obs_over_fid * (e * dm)) @ linv64.T

            return np.asarray(
                jax.vmap(one)(jnp.asarray(flat, jnp.float64)), np.float64
            )

        def curve_v(flat, to_params):
            a_z = 1.0 / (1.0 + np.asarray(z))

            def one(th):
                p = to_params(th)
                a_grid, delta, ddelta = growth_solution(
                    p, model, substeps=ode_substeps
                )
                dd = jnp.interp(jnp.asarray(a_z), a_grid, ddelta)
                return (jnp.asarray(a_z) * dd / delta[-1]) @ linv64.T

            return np.asarray(
                jax.vmap(one)(jnp.asarray(flat, jnp.float64)), np.float64
            )

        raw_chi2 = make_amp_pair_chi2(
            model, curve_u, curve_v, "fs8",
            (_hash_arrays(z, linv64, obs_over_fid), gl_order, ode_substeps),
            "sigma8",
        )

    else:

        def theory_fs8(p):
            return fsigma8(z, p, model, substeps=ode_substeps)

        def dm_integral(p):
            return comoving_integral_gl(z, p, model, order=gl_order)

        def residual(p):
            theory = theory_fs8(p)
            e_model = e_of_z(jnp.asarray(z), p, model)
            q = e_model * dm_integral(p) / fid_denom
            return fs8_obs * q - theory

        def raw_chi2(p):
            return chi2_from_whitener(linv, residual(p))

    def chi2(p):
        f = p[f_err_param] if f_err_param else 1.0
        return raw_chi2(p) / f**2

    def log_norm(p):
        if not f_err_param:
            return jnp.zeros(())
        return -n * jnp.log(p[f_err_param])

    return Term(
        name=name, chi2=chi2, log_norm=log_norm, meta=dict(n=n, legend=dataset.legend)
    )
