"""Build-time Chebyshev emulator of the growth factor.

The fsigma8 theory (models.growth) integrates a 999-step ODE per
likelihood evaluation — a sequential `lax.scan` whose latency dominates
fs8-containing joints on TPU. But the quantity the likelihood needs,
f(z_i; theta) = a_i * delta'(a_i) / delta(1), is a *smooth* function of
the 1-3 cosmological parameters it depends on (Om, w0[, wa]). So in
fast mode we solve the ODE once per node of a Chebyshev tensor grid
over the prior box at build time (vmapped RK4, a few hundred solves),
and each evaluation becomes a barycentric tensor contraction — O(n^2)
flops instead of a 4000-stage sequential integration, with spectral
accuracy (verified ≤1e-7 against the direct ODE in tests).

The emulated vector is fsigma8(z_data)/sigma8; the likelihood
multiplies by the sampled sigma8.
"""

import numpy as np
import jax
import jax.numpy as jnp

from cosmax.models.growth import growth_solution

# generous default domains covering every preset's prior box
DOMAINS = {
    "Om": (0.03, 0.75),
    "w0": (-3.2, 0.6),
    "wa": (-3.5, 2.6),
}

MODEL_PARAMS = {
    "lcdm": ("Om",),
    "wcdm": ("Om", "w0"),
    "wzcdm": ("Om", "w0"),
    "w0wacdm": ("Om", "w0", "wa"),
}


def _cheb_nodes(n, lo, hi):
    t = np.cos(np.pi * np.arange(n) / (n - 1))[::-1]
    return 0.5 * (lo + hi) + 0.5 * (hi - lo) * t


def _bary_weights(n):
    w = np.ones(n)
    w[1::2] = -1.0
    w[0] *= 0.5
    w[-1] *= 0.5
    return w


def make_fs8_emulator(z_data, model: str, n_nodes: int = None, substeps: int = 4):
    """Returns ``fn(p) -> fsigma8(z_data) / sigma8`` (jittable)."""
    pnames = MODEL_PARAMS[model]
    ndim_p = len(pnames)
    if n_nodes is None:
        # worst |emulator - ODE| over the full domain: 5e-8 (1D/48),
        # 5.9e-8 (2D/32), 6e-8 (3D/32). 24 nodes would still be accurate
        # (1.4e-6 in 2D) but is measurably SLOWER on the MXU — the
        # contraction pads to the same 128-lane tiles either way and the
        # off-power-of-two layout loses ~20% (measured on the v5e), so
        # 32 is both the accuracy and the speed optimum.
        n_nodes = {1: 48, 2: 32, 3: 32}[ndim_p]
    z_data = np.asarray(z_data, dtype=np.float64)

    axes = [_cheb_nodes(n_nodes, *DOMAINS[n]) for n in pnames]
    grids = np.meshgrid(*axes, indexing="ij")
    flat_params = np.stack([g.ravel() for g in grids], axis=1)  # [M, P]

    def solve_one(theta):
        p = {"Om": theta[0]}
        if ndim_p >= 2:
            p["w0"] = theta[1]
        if ndim_p >= 3:
            p["wa"] = theta[2]
        a_grid, delta, ddelta = growth_solution(p, model, substeps=substeps)
        a_z = 1.0 / (1.0 + jnp.asarray(z_data))
        dd = jnp.interp(a_z, a_grid, ddelta)
        return a_z * dd / delta[-1]

    # build-time: vmapped RK4 over all tensor nodes (batched, one scan)
    table = np.asarray(
        jax.vmap(solve_one)(jnp.asarray(flat_params))
    ).reshape(*( [n_nodes] * ndim_p ), z_data.size)

    # The fsigma8 curves are smooth in z, so the [nodes..., Nz] table is
    # very low-rank along z. A build-time truncated SVD (f64) factors it
    # as table ~= A[nodes..., R] @ B[R, Nz]; the per-walker barycentric
    # contraction then materialises a [W, nodes, R] intermediate instead
    # of [W, nodes, Nz] — at 131072 walkers the rank-65 vs rank-12
    # difference is ~2.4 ms/eval of pure HBM traffic (measured v5e,
    # round 3: fs8 was 48% of the multiprobe joint at rank 65).
    #
    # Rank selection is spectral, not an energy threshold: the
    # singular values decay spectrally (smooth curves) down to the
    # table's own RK4/interp noise floor (~1e-8 relative) and then
    # flatline — measured 2-D wzcdm: 1.1e-1, 3.3e-2, ... 6e-8, then
    # ~50 values stuck at 1-2e-8. Keep every component above the
    # floor, drop the flat noise tail (whose omission costs <= 4e-7
    # elementwise, the same order as the table's own error vs the
    # exact ODE); a Frobenius-tail cut at 1e-9 instead keeps rank
    # 65/66 — measured round 3 as ~2.4 ms/eval of pure HBM traffic at
    # 131072 walkers, 48% of the whole multiprobe joint. The
    # <=1e-6 ODE-agreement contract (tests/test_growth_emulator.py)
    # is asserted directly on the truncation below.
    flat = table.reshape(-1, z_data.size)
    u, s, vt = np.linalg.svd(flat, full_matrices=False)
    noise = s <= 2e-8 * s[0]
    rank = int(np.argmax(noise)) if noise.any() else s.size
    rank = max(rank, 1)
    while (
        rank < s.size
        and np.max(np.abs((u[:, :rank] * s[:rank]) @ vt[:rank] - flat))
        > 1e-6
    ):
        rank += 1
    if rank > min(flat.shape) // 2:
        # factorisation wouldn't pay (tiny tables, e.g. few-node test
        # grids) — keep the exact table; barycentric evaluation then
        # stays exact at the Chebyshev nodes.
        table_j = jnp.asarray(table)
        b_j = None
    else:
        a_fac = (u[:, :rank] * s[:rank]).reshape(
            *([n_nodes] * ndim_p), rank
        )
        table_j = jnp.asarray(a_fac)
        b_j = jnp.asarray(vt[:rank])
    axes_j = [jnp.asarray(ax) for ax in axes]
    bw = jnp.asarray(_bary_weights(n_nodes))

    def bary_vector(x, nodes):
        """Barycentric interpolation weight vector at scalar x."""
        diff = x - nodes
        near = jnp.abs(diff) < 1e-14
        safe = jnp.where(near, 1.0, diff)
        num = bw / safe
        w = num / jnp.sum(num)
        return jnp.where(jnp.any(near), near.astype(w.dtype), w)

    def emulate(p):
        import jax

        out = table_j
        for name, nodes in zip(pnames, axes_j):
            w = bary_vector(p[name], nodes)
            out = jnp.tensordot(
                w, out, axes=(0, 0), precision=jax.lax.Precision.HIGHEST
            )
        if b_j is None:
            return out
        # expand the rank-R coefficients back onto the data redshifts
        return jnp.tensordot(out, b_j, axes=(0, 0), precision=jax.lax.Precision.HIGHEST)

    return emulate
