"""Quadrature primitives — the TPU replacement for the reference's
per-point ``np.trapz`` loops (bao/desi.py:29-37), ``cumulative_trapezoid``
grids (sn/pantheon.py:33-34) and adaptive ``scipy.integrate.quad``
(cmb/data_chen_compression.py:70-82).

Design: all integrals become *fixed-order* rules whose nodes/weights are
precomputed in f64 numpy at build time and baked into the jitted program
as constants. Evaluation is then a fused elementwise integrand pass plus
a weighted reduction — static shapes, MXU/VPU friendly, trivially
``vmap``-able over both quadrature nodes and walker batches.

Two rule families:

* **Gauss–Legendre** (fast path): 10-100x fewer integrand evals than the
  reference's >=300-pt trapezoids at far higher accuracy.
* **Matched trapezoid** (parity path): reproduces the reference's exact
  discretisation (``np.linspace(0, z_i, max(n, int(n*z_i)))``) so chi^2
  agrees with the published docstring values to 1e-6.
"""

from contextlib import contextmanager
from functools import lru_cache

import numpy as np
import jax.numpy as jnp

# Prefix sums appear twice on the likelihood hot path (cumtrapz, the
# shared-panel GL ladder in models/distances.py). XLA lowers
# ``jnp.cumsum`` well, but Mosaic (pallas TPU kernels) has no cumsum
# lowering — so the implementation is switchable: the default is
# cumsum; inside ``matmul_prefix_sums()`` the same helpers trace to an
# upper-triangular-ones matmul (K <= ~65 here, MXU-trivial), which
# Mosaic can compile. ops/pallas/megakernel.py traces under the switch.
_PREFIX_IMPL = "cumsum"


@contextmanager
def matmul_prefix_sums():
    """Trace ``prefix_sum``/``prefix_sum_permuted`` as triangular
    matmuls instead of ``cumsum``/gather (Mosaic-compatible)."""
    global _PREFIX_IMPL
    prev = _PREFIX_IMPL
    _PREFIX_IMPL = "matmul"
    try:
        yield
    finally:
        _PREFIX_IMPL = prev


def prefix_sum(y, axis: int = -1):
    """``jnp.cumsum`` with a Mosaic-safe matmul variant (see above)."""
    if _PREFIX_IMPL == "cumsum":
        return jnp.cumsum(y, axis=axis)
    from cosmax.ops.linalg import pdot

    ym = jnp.moveaxis(y, axis, -1)
    k = ym.shape[-1]
    # out[i] = sum_{j<=i} y[j]  ==  y @ U,  U[j, i] = 1 iff j <= i.
    # HIGHEST precision: bf16 MXU inputs would truncate y itself.
    u = jnp.asarray(np.triu(np.ones((k, k))), dtype=jnp.result_type(ym))
    return jnp.moveaxis(pdot(ym, u), -1, axis)


def prefix_sum_permuted(y, inv_perm):
    """``jnp.cumsum(y, -1)[..., inv_perm]`` with a static ``inv_perm``
    (numpy), fused into ONE matmul under ``matmul_prefix_sums()`` —
    Mosaic supports neither cumsum nor gather, but
    ``M[j, i] = (j <= inv_perm[i])`` folds both into a contraction."""
    inv_perm = np.asarray(inv_perm)
    if _PREFIX_IMPL == "cumsum":
        return jnp.cumsum(y, axis=-1)[..., inv_perm]
    from cosmax.ops.linalg import pdot

    n = y.shape[-1]
    m = jnp.asarray(
        np.arange(n)[:, None] <= inv_perm[None, :], dtype=jnp.result_type(y)
    )
    return pdot(y, m)


def static_take(y, idx):
    """``y[..., idx]`` for a static numpy index vector; under
    ``matmul_prefix_sums()`` a one-hot matmul (Mosaic has no gather)."""
    idx = np.asarray(idx)
    if _PREFIX_IMPL == "cumsum":
        return y[..., idx]
    from cosmax.ops.linalg import pdot

    n = y.shape[-1]
    m = jnp.asarray(
        np.arange(n)[:, None] == idx[None, :], dtype=jnp.result_type(y)
    )
    return pdot(y, m)


@lru_cache(maxsize=None)
def gauss_legendre(order: int):
    """(nodes, weights) on [-1, 1], float64 numpy, cached."""
    x, w = np.polynomial.legendre.leggauss(order)
    return x, w


def gl_nodes_01(order: int):
    """(nodes, weights) rescaled to [0, 1]."""
    x, w = gauss_legendre(order)
    return 0.5 * (x + 1.0), 0.5 * w


def gl_integrate_01(f, order: int, dtype=None):
    """integral_0^1 f(t) dt with an order-``order`` GL rule.

    ``f`` must accept a jnp vector of nodes and is traced once; for
    parameter batches, close over the batch and let the integrand
    broadcast (nodes live on the last axis).
    """
    t, w = gl_nodes_01(order)
    t = jnp.asarray(t, dtype=dtype)
    w = jnp.asarray(w, dtype=dtype)
    return jnp.sum(f(t) * w, axis=-1)


def cumtrapz(y, x, axis: int = -1):
    """Cumulative trapezoid with initial=0, matching
    ``scipy.integrate.cumulative_trapezoid(y, x, initial=0)``
    (reference sn/pantheon.py:33).

    Implemented as a prefix sum — one ``cumsum`` on device.
    """
    y = jnp.moveaxis(y, axis, -1)
    dx = jnp.diff(jnp.asarray(x, dtype=y.dtype))
    seg = 0.5 * dx * (y[..., 1:] + y[..., :-1])
    out = jnp.concatenate(
        [jnp.zeros(y.shape[:-1] + (1,), dtype=y.dtype), prefix_sum(seg, axis=-1)],
        axis=-1,
    )
    return jnp.moveaxis(out, -1, axis)


def trapz_grid_weights(z_points, n_base: int, dynamic: bool = True):
    """Padded (grid, weights) reproducing the reference's per-point
    dynamic trapezoid rule (bao/desi.py:30-37)::

        x = np.linspace(0, z_i, num=max(n_base, int(n_base * z_i)))
        np.trapz(DH(x), x)

    Returns float64 numpy arrays ``grid[N, L]`` and ``w[N, L]`` with
    ``integral_i = sum_j w[i, j] * f(grid[i, j])``; rows are zero-padded
    to the longest grid (padding weights are 0, padding nodes repeat the
    endpoint so the integrand stays finite). Data redshifts are static,
    so this is all build-time numpy.

    With ``dynamic=False`` every row uses exactly ``n_base`` points —
    the fixed-grid variant some reference scripts use
    (quasars/qsr_desi.py:39-41 uses 3000-pt grids).
    """
    z_points = np.atleast_1d(np.asarray(z_points, dtype=np.float64))
    if dynamic:
        sizes = [max(n_base, int(n_base * z)) for z in z_points]
    else:
        sizes = [n_base for _ in z_points]
    L = max(sizes)
    grid = np.zeros((len(z_points), L), dtype=np.float64)
    w = np.zeros((len(z_points), L), dtype=np.float64)
    for i, (z, m) in enumerate(zip(z_points, sizes)):
        x = np.linspace(0.0, z, num=m)
        grid[i, :m] = x
        grid[i, m:] = x[-1]
        dx = np.diff(x)
        wi = np.zeros(m)
        wi[:-1] += 0.5 * dx
        wi[1:] += 0.5 * dx
        w[i, :m] = wi
    return grid, w
