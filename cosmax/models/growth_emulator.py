"""Build-time Chebyshev emulators of the growth factor.

The fsigma8 theory (models.growth) integrates a 999-step ODE per
likelihood evaluation — a sequential `lax.scan` whose latency dominates
fs8-containing joints on TPU. But the quantity the likelihood needs,
f(z_i; theta) = a_i * delta'(a_i) / delta(1), is a *smooth* function of
the 1-3 cosmological parameters it depends on (Om, w0[, wa]). So in
fast mode we solve the ODE once per node of a Chebyshev tensor grid
over the prior box at build time (vmapped RK4, a few hundred solves),
and each evaluation becomes a barycentric tensor contraction with
spectral accuracy (verified ≤1e-7 for the 1-2 parameter families and
≤2e-6 for w0wacdm against the direct ODE in tests; the CPL family
needs the split-axis treatment in :func:`_make_fs8_emulator_w0wa`).

Two emulators share the node tables:

* :func:`make_fs8_emulator` — the VALUE path, fn(p) ->
  fsigma8(z_data)/sigma8 (the likelihood multiplies by the sampled
  sigma8).
* :func:`make_fs8_chi2_emulator` — the production fast path: the
  whitened chi2 itself, with the AP comoving integrals, the data
  multiply and the covariance whitening all folded into build-time
  factors, so the runtime never materialises a length-N vector.

Both factor their coefficient tables (:func:`_compress`) as a
truncated z-SVD composed with either a Tucker HOSVD (1-2 parameter
axes) or a tensor train (3 axes), whichever evaluates in fewer flops;
every truncation is verified END-TO-END in data space against the
original table under one absolute contract (see ARCHITECTURE.md's
roofline section for the measured per-eval costs this buys).
"""

import numpy as np
import jax
import jax.numpy as jnp

from cosmax.models.growth import growth_solution
from cosmax.models.emu_core import (
    DOMAINS,
    MODEL_PARAMS,
    OR_DELTA_NODES,
    OR_REF,
    bary_vector as _bary_vector,
    bary_weights as _bary_weights,
    cheb_nodes as _cheb_nodes,
    coeff_contract as _coeff,
    compress as _compress,
    delta_subspace as _delta_subspace,
    f64_build as _f64_build,
    flatten_grid as _flatten_grid,
    svd_rank_factor as _svd_rank_factor,
    table_cached as _table_cached,
    # re-exported: tests exercise these directly
    eval_flops as _eval_flops,
    table_cache_path as _table_cache_path,
    tt as _tt,
    tucker as _tucker,
)

_TABLE_MEMO = {}


def _solve_table(flat_params, to_params, map_tag, model, z_data, substeps):
    """ODE-solve fsigma8/sigma8 at every node of a flattened grid.

    ``to_params(theta) -> dict`` maps a node coordinate vector to the
    cosmological parameter dict (identity for the native axes; the
    w0wacdm path uses it to undo the s = w0 + wa transform). Memoised
    on the node grid so the value and whitened-chi2 emulators share one
    set of ODE solves (the w0wacdm grid is 2 x 40^3 node solves).
    ``map_tag`` names the to_params mapping in the memo key — functions
    don't hash by semantics, and byte-identical node grids under
    DIFFERENT coordinate mappings must not share a table.

    Always solved in f64 on CPU (:func:`_f64_build`), so the memo is
    shared across runtime-precision switches.
    """
    key = (
        np.asarray(flat_params, np.float64).tobytes(),
        map_tag,
        model,
        np.asarray(z_data, np.float64).tobytes(),
        substeps,
    )
    if key in _TABLE_MEMO:
        return _TABLE_MEMO[key]

    def solve_one(theta):
        p = to_params(theta)
        a_grid, delta, ddelta = growth_solution(p, model, substeps=substeps)
        a_z = 1.0 / (1.0 + jnp.asarray(z_data))
        dd = jnp.interp(a_z, a_grid, ddelta)
        return a_z * dd / delta[-1]

    def build():
        with _f64_build():
            return np.asarray(
                jax.vmap(solve_one)(jnp.asarray(flat_params, jnp.float64))
            )

    out = _table_cached("solve", key, build)
    _TABLE_MEMO[key] = out
    return out


def _svd_factor(table, node_shape, nz):
    """Truncated z-SVD of ``table`` [*node_shape, nz] -> (A_j, B_j).

    The fsigma8 curves are smooth in z, so the [nodes..., Nz] table is
    very low-rank along z: a build-time f64 SVD factors it as
    table ~= A[nodes..., R] @ B[R, Nz]; the per-walker barycentric
    contraction then materialises a [W, nodes, R] intermediate instead
    of [W, nodes, Nz] — at 131072 walkers the rank-65 vs rank-12
    difference is ~2.4 ms/eval of pure HBM traffic (measured v5e,
    round 3: fs8 was 48% of the multiprobe joint at rank 65).

    Rank selection is spectral, not an energy threshold: the singular
    values decay spectrally (smooth curves) down to the table's own
    RK4/interp noise floor (~1e-8 relative) and then flatline —
    measured 2-D wzcdm: 1.1e-1, 3.3e-2, ... 6e-8, then ~50 values
    stuck at 1-2e-8. Keep every component above the floor, drop the
    flat noise tail (whose omission costs <= 4e-7 elementwise, the
    same order as the table's own error vs the exact ODE); a
    Frobenius-tail cut at 1e-9 instead keeps rank 65/66. The <=1e-6
    ODE-agreement contract (tests/test_growth_emulator.py) is
    asserted directly on the truncation below.

    Returns ``(("exact", A_j), None)`` — the exact unfactored table —
    when factorisation wouldn't pay (tiny grids), preserving exactness
    at the Chebyshev nodes. Otherwise the rank-R coefficient table is
    further compressed along the parameter axes (:func:`_compress`:
    TT for >= 3 axes, Tucker HOSVD otherwise), returning
    ``(rep, B)``.
    """
    flat = table.reshape(-1, nz)
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
        return ("exact", jnp.asarray(table)), None
    a_fac = (u[:, :rank] * s[:rank]).reshape(*node_shape, rank)
    # composed parameter-axis cut + z-cut held to the SAME 1e-6
    # absolute contract as the z-SVD loop above, verified against the
    # original table
    rep = _compress(a_fac, node_shape, 1e-6, proj=vt[:rank], ref=flat)
    return rep, jnp.asarray(vt[:rank])


def _contract(weights, rep, b_j):
    """HIGHEST-precision barycentric contraction against a tagged
    coefficient representation, with optional z-basis expansion."""
    out = _coeff(weights, rep)
    if b_j is None:
        return out
    # expand the rank-R coefficients back onto the data redshifts
    return jnp.tensordot(
        out, b_j, axes=(0, 0), precision=jax.lax.Precision.HIGHEST
    )


def _edm_table(flat_params, to_params, map_tag, model, z_data, order=64):
    """E(z_i) * int_0^{z_i} dz'/E at every node of a flattened grid.

    The AP-correction numerator (reference fs8/fs8.py:26-32,75) is a
    smooth function of the same 1-3 parameters as the growth factor, so
    it is tabulated on the same Chebyshev nodes (build-time vmapped GL,
    order 64 — far beyond the runtime prefix-GL panels it replaces).
    """
    from cosmax.models.background import e_of_z
    from cosmax.models.distances import comoving_integral_gl

    z64 = np.asarray(z_data, np.float64)
    fp64 = np.asarray(flat_params, np.float64)

    def one(theta):
        z_j = jnp.asarray(z64)
        p = to_params(theta)
        return e_of_z(z_j, p, model) * comoving_integral_gl(
            z_j, p, model, order=order
        )

    def build():
        with _f64_build():
            return np.asarray(jax.vmap(one)(jnp.asarray(fp64)))

    # map_tag stands in for to_params, as in :func:`_solve_table`
    key = (fp64.tobytes(), map_tag, model, z64.tobytes(), order)
    return _table_cached("edm", key, build)


def _whitened_chi2_factor(base, node_shape, delta, c_node_shape):
    """Factor the whitened node tables into the rank-space chi^2
    program chi2 = |(Cu + t Du) a_pair - sigma8 (Cv + t Dv) a_pair|^2.

    ``base`` is (u, v), two [M, N] tables on the fine node grid:

    * u = Linv (obs * q) — the data side of the residual (linear in
          the emulated AP curve),
    * v = Linv fsigma8/sigma8 — the theory side.

    ``delta`` is (du, dv), the SAME two tables evaluated at Or=OR_REF
    minus their Or=0 values, on the coarse ``c_node_shape`` grid — the
    radiation correction (t = Or / OR_REF interpolates the residual
    affinely in Or). Base and delta rows share ONE z-SVD: with the
    f64-built tables (:func:`_f64_build`) the delta curves lie inside
    the base z-span (the joint rank equals the base-only rank,
    measured on both the 2- and 3-axis families), so the shared basis
    costs no rank and the whole radiation correction collapses to an
    axpy in rank space — no second residual basis, no second [., 2m]
    matmul, and m <= min(N, 2R) exactly as without radiation.
    (Emulating the six product scalars u.du, ... directly instead
    under-resolves the base factor's spectral content on any
    affordable grid — measured 5.8e-3 chi2 error at the w0wacdm bulk.)

    Build: one f64 SVD of the row-concatenated [M + Mc, 2N] table
    gives A [*node_shape, R] and Ad [*c_node_shape, R] over a shared
    B [R, 2N]; an orthonormal basis Q of the residual span (columns
    of Bu^T|Bv^T, dimension m <= min(N, 2R)) rotates both sides into
    R^m without changing the 2-norm, so the runtime never
    materialises a length-N vector: per walker one barycentric
    contraction to a [R] (plus, when radiation is on, a coarse one to
    the delta's own rd-dim subspace of the rank space — rd < R, see
    the inline note — lifted by one [rd, R] matmul into an axpy in
    R^R), one [R, 2m] matmul, and an axpy + square-reduce.
    Every truncation is held to <= 1e-6 * max|base| elementwise — the
    same relative contract as the value emulator (tests assert the
    chi^2 agreement directly).
    """
    n = base[0].shape[1]
    stacked = np.concatenate(base, axis=1)  # [M, 2N]
    tol = 1e-6 * np.max(np.abs(stacked))
    dstacked = np.concatenate(delta, axis=1)  # [Mc, 2N]
    a_all, b = _svd_rank_factor(
        np.concatenate([stacked, dstacked], axis=0), tol
    )
    a_fac, ad_fac = a_all[: stacked.shape[0]], a_all[stacked.shape[0] :]

    # delta lives in its own rd < R subspace of the shared rank space
    # (measured rd = 11 vs R = 23 on the wzcdm 32^2 grid) — see
    # emu_core.delta_subspace for the rationale.
    pd_fac, smat = _delta_subspace(ad_fac, b, dstacked, tol)

    bu, bv = b[:, :n], b[:, n:]
    z = np.concatenate([bu.T, bv.T], axis=1)  # [N, 2R]
    qu, qs, _ = np.linalg.svd(z, full_matrices=False)
    m = max(int(np.sum(qs > 1e-12 * qs[0])), 1)
    q = qu[:, :m]  # [N, m] orthonormal residual basis
    ct = np.concatenate([(q.T @ bu.T).T, (q.T @ bv.T).T], axis=1)
    # composed parameter-axis cut + z-cut held to the SAME contract as
    # the z-cut alone, verified against the original stacked tables
    rep = _compress(
        a_fac.reshape(*node_shape, -1), node_shape, tol, proj=b, ref=stacked
    )
    repd = _compress(
        pd_fac.reshape(*c_node_shape, -1),
        c_node_shape,
        tol,
        proj=smat @ b,
        ref=dstacked,
    )
    return rep, jnp.asarray(ct), repd, jnp.asarray(smat), m


def _chi2_from_block(weights, rep, ct, m, sigma8, delta=None):
    """chi2 = |y_u - sigma8 y_v|^2 in the m-dim residual basis;
    ``delta = (cweights, repd, smat, t_or)`` adds the radiation
    correction t * (ad @ smat) to the shared rank-space coefficient
    first (ad lives in the delta's own rd-dim subspace; smat [rd, R]
    lifts it — see :func:`_whitened_chi2_factor`)."""
    hi = jax.lax.Precision.HIGHEST
    a = _coeff(weights, rep)  # [R]
    if delta is not None:
        cweights, repd, smat, t_or = delta
        ad = _coeff(cweights, repd)  # [rd]
        a = a + t_or * jnp.tensordot(ad, smat, axes=(0, 0), precision=hi)
    y = jnp.tensordot(a, ct, axes=(0, 0), precision=hi)
    r = y[:m] - sigma8 * y[m:]
    return jnp.sum(r * r)


_MEMO = {}


def make_fs8_chi2_emulator(
    z_data,
    model: str,
    linv,
    fs8_obs,
    fid_denom,
    n_nodes: int = None,
    substeps: int = 4,
):
    """Returns ``fn(p) -> chi2`` for the whitened fs8 residual
    ``Linv (fs8_obs * q(p) - sigma8 * fs8_theory(p)/sigma8)`` with the
    whitening, AP correction and basis expansion all folded into
    build-time factors (see :func:`_whitened_chi2_factor`). The f_err
    rescaling stays in the likelihood term.

    Accuracy contract: the truncations are bounded ABSOLUTELY in
    whitened-residual units (1e-6 of max|whitened table| per element,
    composed across the z-SVD and node-grid cuts), so the chi2 error
    scales as 2*sqrt(chi2)*|dy| — ~1e-3 near the posterior bulk and
    growing like sqrt(chi2) in the tails (measured worst 2.3e-2 at
    chi2 ~ 125, ~8 sigma out, over a random box sweep). That shifts
    logL by < 0.03 at points 60 chi2-units above the MAP: no
    posterior-level effect (tests/test_growth_emulator.py pins both
    the bulk and the far-tail bound; the 43-config validation sweep
    confirms parity).

    Memoised like :func:`make_fs8_emulator` (the w0wacdm build is
    2 x 40^3 ODE solves + as many GL distance integrals).
    """
    z64 = np.asarray(z_data, np.float64)
    linv64 = np.asarray(linv, np.float64)
    obs64 = np.asarray(fs8_obs, np.float64)
    fid64 = np.asarray(fid_denom, np.float64)
    key = (
        "chi2",
        z64.tobytes(),
        model,
        n_nodes,
        substeps,
        bool(jax.config.jax_enable_x64),
        linv64.tobytes(),
        obs64.tobytes(),
        fid64.tobytes(),
    )
    if key not in _MEMO:
        _MEMO[key] = _make_fs8_chi2_emulator(
            z64, model, linv64, obs64, fid64, n_nodes, substeps
        )
    return _MEMO[key]


def _make_fs8_chi2_emulator(z_data, model, linv, fs8_obs, fid_denom, n_nodes, substeps):
    obs_over_fid = fs8_obs / fid_denom

    def whitened_pair(flat_params, to_params, map_tag):
        v_tab = _solve_table(
            flat_params, to_params, map_tag, model, z_data, substeps
        )
        q_tab = _edm_table(flat_params, to_params, map_tag, model, z_data)
        return (obs_over_fid * q_tab) @ linv.T, v_tab @ linv.T

    def factor(axes, to_params, map_tag):
        # Radiation enters the AP integrals and the growth ODE only
        # through the tiny Or <= ~2e-4 the CMB/BBN-coupled presets
        # inject (presets._radiation), and the whitened tables respond
        # linearly in Or to well below the truncation contract — so two
        # table builds (Or = 0 and Or = OR_REF) capture it: the runtime
        # interpolates the RESIDUAL affinely in Or, which makes chi2's
        # quadratic-in-Or structure exact and leaves only the O(Or^2)
        # curvature of the tables themselves (measured < 9e-4 in chi2
        # near the posterior bulk; tests pin the multiprobe-style
        # agreement). The delta tables are built on the coarse
        # OR_DELTA_NODES grid and compressed into the base's SHARED
        # z-SVD rank space (:func:`_whitened_chi2_factor`), so the
        # whole correction is an axpy on the rank-space coefficient —
        # the base program's cost is untouched when radiation is off.
        node_shape = [len(ax) for ax in axes]
        u0, vw0 = whitened_pair(_flatten_grid(axes), to_params, map_tag)
        to_params_or = lambda th: dict(to_params(th), Or=OR_REF)
        c_axes = [
            _cheb_nodes(min(len(ax), OR_DELTA_NODES), ax[0], ax[-1])
            for ax in axes
        ]
        cflat = _flatten_grid(c_axes)
        u0c, vw0c = whitened_pair(cflat, to_params, map_tag)
        u1c, vw1c = whitened_pair(
            cflat, to_params_or, (map_tag, "or", OR_REF)
        )
        rep, ct, repd, smat, m = _whitened_chi2_factor(
            (np.asarray(u0, np.float64), np.asarray(vw0, np.float64)),
            node_shape,
            (
                np.asarray(u1c - u0c, np.float64),
                np.asarray(vw1c - vw0c, np.float64),
            ),
            [len(ax) for ax in c_axes],
        )
        c_axes_j = [jnp.asarray(ax) for ax in c_axes]
        c_bw = jnp.asarray(_bary_weights(len(c_axes[0])))
        return rep, ct, repd, smat, m, c_axes_j, c_bw

    if model == "w0wacdm":
        # split-axis treatment, same rationale as _make_fs8_emulator_w0wa
        n_nodes = 40 if n_nodes is None else n_nodes
        om_ax = _cheb_nodes(n_nodes, *DOMAINS["Om"])
        wa_ax = _cheb_nodes(n_nodes, *DOMAINS["wa"])
        s_bounds = (
            DOMAINS["w0"][0] + DOMAINS["wa"][0],
            DOMAINS["w0"][1] + DOMAINS["wa"][1],
        )
        halves = []
        for s_dom in ((s_bounds[0], 0.0), (0.0, s_bounds[1])):
            s_ax = _cheb_nodes(n_nodes, *s_dom)
            halves.append(
                (jnp.asarray(s_ax),)
                + factor(
                    [om_ax, wa_ax, s_ax],
                    lambda th: {"Om": th[0], "wa": th[1], "w0": th[2] - th[1]},
                    "w0wa-rot",
                )
            )

        om_j, wa_j = jnp.asarray(om_ax), jnp.asarray(wa_ax)
        bw = jnp.asarray(_bary_weights(n_nodes))

        def chi2(p):
            s = p["w0"] + p["wa"]
            orr = p.get("Or", None)
            w_om = _bary_vector(p["Om"], om_j, bw)
            w_wa = _bary_vector(p["wa"], wa_j, bw)
            outs = []
            for s_ax, rep, ct, repd, smat, m, c_axes_j, c_bw in halves:
                delta = None
                if orr is not None:
                    cw = [
                        _bary_vector(x, ax, c_bw)
                        for x, ax in zip((p["Om"], p["wa"], s), c_axes_j)
                    ]
                    delta = (cw, repd, smat, orr / OR_REF)
                outs.append(
                    _chi2_from_block(
                        [w_om, w_wa, _bary_vector(s, s_ax, bw)],
                        rep,
                        ct,
                        m,
                        p["sigma8"],
                        delta,
                    )
                )
            return jnp.where(s <= 0.0, outs[0], outs[1])

        return chi2

    pnames = MODEL_PARAMS[model]
    ndim_p = len(pnames)
    if n_nodes is None:
        n_nodes = {1: 48, 2: 32}[ndim_p]
    axes = [_cheb_nodes(n_nodes, *DOMAINS[n]) for n in pnames]
    rep, ct, repd, smat, m, c_axes_j, c_bw = factor(
        axes,
        lambda theta: dict(zip(pnames, theta)),
        ("native",) + pnames,
    )
    axes_j = [jnp.asarray(ax) for ax in axes]
    bw = jnp.asarray(_bary_weights(n_nodes))

    def chi2(p):
        weights = [
            _bary_vector(p[name], nodes, bw)
            for name, nodes in zip(pnames, axes_j)
        ]
        orr = p.get("Or", None)
        delta = None
        if orr is not None:
            cw = [
                _bary_vector(p[name], nodes, c_bw)
                for name, nodes in zip(pnames, c_axes_j)
            ]
            delta = (cw, repd, smat, orr / OR_REF)
        return _chi2_from_block(weights, rep, ct, m, p["sigma8"], delta)

    return chi2


def make_fs8_emulator(z_data, model: str, n_nodes: int = None, substeps: int = 4):
    """Returns ``fn(p) -> fsigma8(z_data) / sigma8`` (jittable).

    Builds are memoised per (z grid, model, nodes, substeps, x64 flag)
    — the w0wacdm table is 2 x 40^3 ODE solves, which the test suite
    and multi-preset CLI sessions would otherwise repeat.
    """
    key = (
        np.asarray(z_data, np.float64).tobytes(),
        model,
        n_nodes,
        substeps,
        bool(jax.config.jax_enable_x64),
    )
    if key not in _MEMO:
        _MEMO[key] = _make_fs8_emulator(z_data, model, n_nodes, substeps)
    return _MEMO[key]


def _make_fs8_emulator(z_data, model, n_nodes, substeps):
    if model == "w0wacdm":
        return _make_fs8_emulator_w0wa(z_data, n_nodes, substeps)
    pnames = MODEL_PARAMS[model]
    ndim_p = len(pnames)
    if n_nodes is None:
        # worst |emulator - ODE| over the full domain: 5e-8 (1D/48),
        # 5.9e-8 (2D/32). 24 nodes would still be accurate
        # (1.4e-6 in 2D) but is measurably SLOWER on the MXU — the
        # contraction pads to the same 128-lane tiles either way and the
        # off-power-of-two layout loses ~20% (measured on the v5e), so
        # 32 is both the accuracy and the speed optimum.
        n_nodes = {1: 48, 2: 32}[ndim_p]
    z_data = np.asarray(z_data, dtype=np.float64)

    axes = [_cheb_nodes(n_nodes, *DOMAINS[n]) for n in pnames]
    grids = np.meshgrid(*axes, indexing="ij")
    flat_params = np.stack([g.ravel() for g in grids], axis=1)  # [M, P]

    # build-time: vmapped RK4 over all tensor nodes (batched, one scan)
    table = _solve_table(
        flat_params,
        lambda theta: dict(zip(pnames, theta)),
        ("native",) + pnames,
        model,
        z_data,
        substeps,
    ).reshape(*([n_nodes] * ndim_p), z_data.size)

    rep, b_j = _svd_factor(table, [n_nodes] * ndim_p, z_data.size)
    axes_j = [jnp.asarray(ax) for ax in axes]
    bw = jnp.asarray(_bary_weights(n_nodes))

    def emulate(p):
        weights = [
            _bary_vector(p[name], nodes, bw)
            for name, nodes in zip(pnames, axes_j)
        ]
        return _contract(weights, rep, b_j)

    return emulate


def _make_fs8_emulator_w0wa(z_data, n_nodes, substeps):
    """w0wacdm emulator in (Om, wa, s = w0 + wa), s-axis split at 0.

    A single Chebyshev box over (Om, w0, wa) converges only
    algebraically for this family: the CPL equation of state has
    w(z→∞) = w0 + wa, so along the plane w0 + wa = 0 the early
    universe switches between DE-negligible and DE-dominated — a
    boundary layer in the (w0, wa) plane that global polynomial
    interpolation resolves poorly ANYWHERE in the box (measured worst
    |rel| ~ 2e-3 at 32 nodes, ~3e-4 at 48, concentrated at
    |w0+wa| < 0.4). Rotating the third axis to s = w0 + wa aligns the
    layer with a coordinate plane, and splitting that axis at s = 0
    puts it at an interval ENDPOINT of both halves — exactly where
    Chebyshev nodes cluster — restoring spectral convergence:
    measured worst |rel| over the preset prior hull is 2.1e-5 at 32
    nodes/half and 1.3e-6 at the default 40 (vs 2e-3 for the
    unrotated single box at the same cost). Evaluation contracts both
    halves and selects by sign(s); the halves share the (Om, wa)
    barycentric weights.
    """
    n_nodes = 40 if n_nodes is None else n_nodes
    z_data = np.asarray(z_data, dtype=np.float64)
    om_ax = _cheb_nodes(n_nodes, *DOMAINS["Om"])
    wa_ax = _cheb_nodes(n_nodes, *DOMAINS["wa"])
    s_bounds = (
        DOMAINS["w0"][0] + DOMAINS["wa"][0],
        DOMAINS["w0"][1] + DOMAINS["wa"][1],
    )

    halves = []
    for s_dom in ((s_bounds[0], 0.0), (0.0, s_bounds[1])):
        s_ax = _cheb_nodes(n_nodes, *s_dom)
        grids = np.meshgrid(om_ax, wa_ax, s_ax, indexing="ij")
        flat_params = np.stack([g.ravel() for g in grids], axis=1)
        table = _solve_table(
            flat_params,
            lambda th: {"Om": th[0], "wa": th[1], "w0": th[2] - th[1]},
            "w0wa-rot",
            "w0wacdm",
            z_data,
            substeps,
        ).reshape(n_nodes, n_nodes, n_nodes, z_data.size)
        rep, b_j = _svd_factor(table, [n_nodes] * 3, z_data.size)
        halves.append((jnp.asarray(s_ax), rep, b_j))

    om_j, wa_j = jnp.asarray(om_ax), jnp.asarray(wa_ax)
    bw = jnp.asarray(_bary_weights(n_nodes))

    def emulate(p):
        s = p["w0"] + p["wa"]
        w_om = _bary_vector(p["Om"], om_j, bw)
        w_wa = _bary_vector(p["wa"], wa_j, bw)
        outs = [
            _contract([w_om, w_wa, _bary_vector(s, s_ax, bw)], rep, bj)
            for s_ax, rep, bj in halves
        ]
        return jnp.where(s <= 0.0, outs[0], outs[1])

    return emulate
