"""Background distances, batched for TPU.

Replaces the reference's per-point ``numba`` trapezoid loops
(bao/desi.py:29-37) and the shared 1000-pt ``cumulative_trapezoid`` SN
grid (sn/pantheon.py:32-35) with fixed-shape quadrature that XLA fuses
into one elementwise pass + weighted reduction. All functions take
scalar ``params`` dicts and vector ``z``; walker batching is done by
``vmap`` at the log-probability level, which lifts the reductions into
MXU matmuls automatically.

Two modes:
* GL fast path (default): Gauss-Legendre, ~64 nodes per distance.
* matched-trapz parity path: exact reproduction of the reference grids,
  used by the verification tests (grids precomputed by
  ``cosmax.ops.quadrature.trapz_grid_weights``).
"""

import numpy as np
import jax.numpy as jnp

from cosmax.constants import C_KM_S
from cosmax.models.background import e_of_z, hubble
from cosmax.ops.quadrature import cumtrapz, gl_nodes_01, prefix_sum_permuted


def hubble_distance(z, params, model):
    """D_H(z) = c / H(z) [Mpc] (reference bao/desi.py:24-26)."""
    return C_KM_S / hubble(z, params, model)


def comoving_integral_gl(z, params, model, order: int = 64):
    """Dimensionless int_0^z dz'/E(z') by order-``order`` GL per point."""
    t, w = gl_nodes_01(order)
    z = jnp.asarray(z)
    t = jnp.asarray(t, dtype=jnp.result_type(z, 1.0))
    w = jnp.asarray(w, dtype=t.dtype)
    nodes = z[..., None] * t  # [N, order]
    integ = 1.0 / e_of_z(nodes, params, model)
    return z * jnp.sum(integ * w, axis=-1)


def comoving_distance_gl(z, params, model, order: int = 64):
    """D_M(z) = c/H0 * int_0^z dz'/E(z') [Mpc], GL fast path replacing
    the reference's dynamic trapezoids (bao/desi.py:29-37).

    z: [N] static data redshifts -> [N] distances in Mpc.
    """
    return (C_KM_S / params["H0"]) * comoving_integral_gl(z, params, model, order)


def make_prefix_comoving_integral(z_points, model, order: int = 8):
    """Shared-panel prefix quadrature for a *static* batch of sorted
    targets: int_0^{z_i} dz/E for every data redshift with one panel of
    ``order`` GL nodes between consecutive z's and a prefix sum —
    N*order integrand evaluations total instead of N*big_order for
    independent per-point rules (the SN compressed basis needs ~64
    targets; 8-node panels on the short gaps are converged far below
    f32). Build-time numpy; returns ``fn(params) -> I[z_points]`` in
    the original order.
    """
    z_points = np.atleast_1d(np.asarray(z_points, dtype=np.float64))
    perm = np.argsort(z_points)
    z_sorted = z_points[perm]
    edges = np.concatenate([[0.0], z_sorted])
    t, w = gl_nodes_01(order)
    # nodes[i, k] on panel (edges[i], edges[i+1])
    widths = np.diff(edges)
    nodes = edges[:-1, None] + widths[:, None] * t[None, :]
    weights = widths[:, None] * w[None, :]
    inv_perm = np.argsort(perm)
    nodes_j = jnp.asarray(nodes)
    weights_j = jnp.asarray(weights)
    # Mosaic path: the [S, order] panel grid vmaps to rank-3 tensors
    # ([W, S, order] broadcasts/reductions), which crash the Mosaic
    # compiler (bisected 2026-08-17: the flagship's bao/sn terms were
    # the only rank-3 producers and the only Mosaic-compile failures).
    # Under ``matmul_prefix_sums()`` evaluate on the flat node vector
    # and fold weights x segment-sum x prefix-sum x permutation into
    # ONE [S*order, N] contraction: rank-2 everywhere, MXU-trivial.
    nodes_flat_j = jnp.asarray(nodes.reshape(-1))
    seg_of_node = np.repeat(np.arange(len(widths)), order)
    fused = weights.reshape(-1)[:, None] * (
        seg_of_node[:, None] <= inv_perm[None, :]
    )
    fused_j = jnp.asarray(fused)

    def integral(params):
        from cosmax.ops import quadrature as _q

        if _q._PREFIX_IMPL == "matmul":
            from cosmax.ops.linalg import pdot

            integ = 1.0 / e_of_z(nodes_flat_j, params, model)
            return pdot(integ, fused_j.astype(integ.dtype))
        integ = 1.0 / e_of_z(nodes_j, params, model)
        segments = jnp.sum(integ * weights_j, axis=-1)
        return prefix_sum_permuted(segments, inv_perm)

    return integral


def comoving_distance_trapz(params, model, grid, weights):
    """Parity path: D_M over precomputed reference trapezoid grids.

    grid/weights: [N, L] from ``trapz_grid_weights`` — reproduces
    ``np.trapz(c/H(linspace(0, z_i, max(n, n*z_i))))`` (bao/desi.py:30-37).
    """
    integ = C_KM_S / hubble(grid, params, model)
    return jnp.sum(integ * weights, axis=-1)


def volume_distance(z, dh, dm):
    """D_V = (z * D_H * D_M^2)^{1/3} (reference bao/desi.py:40-44)."""
    return (z * dh * dm**2) ** (1.0 / 3.0)


def sn_comoving_integral(params, model, z_grid, z_data):
    """int_0^{z_data} dz/E via cumulative trapezoid on a fixed grid plus
    linear interpolation — the reference's SN path (sn/pantheon.py:32-35,
    sn/union3.py:28-31). Dimensionless (no c/H0 factor).
    """
    inv_e = 1.0 / e_of_z(z_grid, params, model)
    cum = cumtrapz(inv_e, z_grid)
    return jnp.interp(z_data, z_grid, cum)


def apparent_magnitude(params, model, z_grid, z_data, one_plus_z_hel, h0, mag_offset):
    """m(z) = offset + 25 + 5 log10((1+z_hel) * (c/H0) * I(z)).

    Covers all reference SN conventions:
    * Pantheon+ absolute mag M, free H0 folded into params (sn/pantheon.py:35)
    * Union3 / DES5Y Delta_M with fixed H0=70 (sn/union3.py:33-36,
      sn/des5y.py:27-31) — Union3 passes one_plus_z_hel = 1+z_cmb.
    """
    integral = sn_comoving_integral(params, model, z_grid, z_data)
    dl = one_plus_z_hel * (C_KM_S / h0) * integral
    return mag_offset + 25.0 + 5.0 * jnp.log10(dl)


def h0_free_log_dl(params, model, z_grid, z_data, one_plus_z_hel):
    """5 log10((1+z_hel) * I(z)) with c/H0 absorbed into the magnitude
    offset — the reference's H0-free SN parameterisation
    (bao/desi_des5y.py:34-37)."""
    integral = sn_comoving_integral(params, model, z_grid, z_data)
    return 5.0 * jnp.log10(one_plus_z_hel * integral)
