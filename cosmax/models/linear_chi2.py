"""Rank-space emulators for whitened chi^2 terms that are linear in
every non-geometric parameter.

The SN, CC and BAO residuals share one algebraic shape:

    r(p) = u0 - beta(p) * y(theta) - W @ gamma(p)

where ``theta`` is the dark-energy family's geometric parameters
(Om, w0[, wa]) plus the tiny radiation density Or the CMB/BBN-coupled
presets inject, and ``beta`` / ``gamma`` are cheap analytic scalar
functions of the remaining (nuisance) parameters:

* SN  (sn.py, reference sn/pantheon.py:32-40): y = the whitened-metric
  Chebyshev-coefficient deviation of the distance-modulus curve;
  beta = 1; gamma = (magnitude shift, -5 log10(h/h_ref) shift) acting
  through two fixed columns — both enter mu additively.
* CC  (cc.py, reference cosmic_chronometers/cc.py:40-55):
  y = Linv E(z_i; theta); beta = H0 (H(z) = H0 E(z)); no W.
* BAO (bao.py, reference bao/desi.py:47-83): y = Linv t_hat(theta)
  with t_hat the DH/DM/DV mix at H0 = c, r_d = 1 — every BAO
  observable is homogeneous of degree 1 in c/H0, so
  beta = (c/H0)/r_d(p) covers ALL r_d treatments unchanged; no W.

Build (all f64, disk-cached like the fs8 tables): tabulate each
term's c-space curve on Chebyshev tensor grids over the family's
DOMAINS (w0wacdm uses the same s = w0 + wa split-axis rotation as the
growth emulator — see growth_emulator._make_fs8_emulator_w0wa for the
boundary-layer rationale), a per-term truncated SVD over the stacked
[base; Or-delta] rows (radiation becomes the same secant axpy as in
make_fs8_chi2_emulator, with the delta resolved on the SAME fine grid
— these tables are quadrature, not RK4, so the fs8 coarse-grid
economy buys nothing), and the chi^2 expanded EXACTLY around a fixed
reference point so the f32 runtime never cancels catastrophically:

    e = beta(p) * s_t * (a_t + t ad_t) - beta_ref * s_t * a_ref
    g = gamma(p) - gamma_ref
    chi2 = c_ref - 2 e.v_ref + e.e + g.(S g - 2 q_ref) + 2 e.(P g)

(the expansion is an identity for ANY fixed (a_ref, gamma_ref); the
reference point only conditions the f32 arithmetic).

**Bundling — the part that makes this fast on TPU.** Per-evaluation
time for these tiny walker-batched programs is set by the NUMBER of
small matmul dispatches, not their inner dimensions: a [W, 32] x
[32, r] contraction pads to the same MXU tiles for any r <= 128
(measured in round 3 on the fs8 node-count sweep; confirmed here —
three independent per-term Tucker programs ran the flagship at 75M
evals/s vs 113M for the quadrature path they replaced, despite 8x
fewer logical bytes). So all terms of a joint that share (model,
grid) register their curves into one BUNDLE per fast-mode scope
(use_fast_mode opens one; get_preset(fast=True) therefore bundles a
whole preset): their per-term rank-R_t coefficient tables are stacked
along one axis and co-compressed into a SINGLE tagged program, so the
whole joint's geometry costs ONE barycentric contraction —
2 weight vectors, 2 factor projections, 1 core sweep — whatever the
number of terms, and each term slices its [R_t] (+ [R_t] delta)
coefficients out of the shared output vector. XLA CSE merges the
identical subgraph each term traces, so no runtime coordination is
needed. Per-term bases stay orthonormal (the stack holds
COEFFICIENTS, each against its own B_t), keeping every quadratic
form O(R_t).

The truncations are held to an absolute elementwise contract in each
term's own scaled units (TOL_SCALE * max|table|, the fs8 form), so
the chi2 error scales as 2*sqrt(chi2)*|dy| — measured <= ~1e-3 at
posterior bulks and Or-secant-dominated (~6e-4) when radiation is on
(tests assert fast-vs-parity chi2 agreement directly).
"""

from contextlib import contextmanager
import hashlib

import numpy as np
import scipy.linalg
import jax
import jax.numpy as jnp

from cosmax.models.emu_core import (
    DOMAINS,
    MODEL_PARAMS,
    OR_REF,
    bary_vector,
    bary_vector_np,
    bary_weights,
    cheb_nodes,
    coeff_contract,
    compress,
    f64_build,
    flatten_grid,
    svd_rank_factor,
    table_cached,
)

# Truncation contract, relative to each term's own max (the same
# absolute-elementwise form as the fs8 emulator): the error
# propagation 2*sqrt(chi2)*|dy| puts the bulk chi2 error at ~1e-4 and
# the Or-secant curvature (~6e-4, inherent to the linearisation)
# dominates whenever radiation is on, so tightening further buys
# nothing measurable (scanned 1e-6..1e-8 on bao/sn wzcdm).
TOL_SCALE = 1e-6

_FINALIZE_MEMO = {}


def _hash_arrays(*arrays):
    h = hashlib.sha256()
    for a in arrays:
        h.update(np.ascontiguousarray(np.asarray(a, np.float64)).tobytes())
    return h.hexdigest()


def _cached_curve(model, curve_fn, flat, to_params, map_tag, tag, key_extra):
    # ``model`` MUST be part of the key: the curve_fn closures the model
    # family (e_of_z / growth_solution calls), but wcdm and wzcdm share
    # pnames ("Om", "w0") — identical map_tag AND identical flat nodes
    # whenever two presets' prior boxes coincide. Without the model tag
    # whichever family built first poisoned the other's tables on disk
    # (found by the round-5 validation sweep: fs8.fs8[wcdm] sampled a
    # bit-identical copy of the wzcdm posterior).
    key = (
        "linear_curve",
        model,
        tag,
        key_extra,
        map_tag,
        np.asarray(flat, np.float64).tobytes(),
    )

    def build():
        with f64_build():
            return np.asarray(curve_fn(flat, to_params), np.float64)

    return table_cached("linear_curve", key, build)


def _grid_spec(model, n_nodes, domains):
    """The family's fine grid: list of (axes, to_params, map_tag,
    theta_ref_vec) — two entries (halves) for the split w0wacdm box.

    ``domains`` defaults to the generous shared DOMAINS box, but a
    preset-scoped bundle narrows it to the preset's own prior box
    (set_scope_domains): unlike the fs8 ODE tables — which are minutes
    of build and shared across presets on the wide box — these
    quadrature tables rebuild in seconds, and the narrow box both cuts
    the per-term rank (the curves are tamer) and shrinks max|table|,
    which the absolute truncation contract is relative to.
    """
    def dom(nm):
        return domains.get(nm, DOMAINS[nm])

    def clamp_ref(x, lo, hi):
        return min(max(x, lo + 0.25 * (hi - lo)), hi - 0.25 * (hi - lo))

    if model == "w0wacdm":
        n = 40 if n_nodes is None else n_nodes
        om_ax = cheb_nodes(n, *dom("Om"))
        wa_ax = cheb_nodes(n, *dom("wa"))
        s_bounds = (
            dom("w0")[0] + dom("wa")[0],
            dom("w0")[1] + dom("wa")[1],
        )
        om_ref = clamp_ref(0.3, *dom("Om"))
        wa_ref = clamp_ref(0.0, *dom("wa"))
        # each half needs a non-degenerate interval even when the box
        # sits entirely on one side of s = 0 (the unselected half is
        # then dead weight but must still build)
        s_lo = (min(s_bounds[0], -1e-2), 0.0)
        s_hi = (0.0, max(s_bounds[1], 1e-2))
        halves = []
        for s_dom in (s_lo, s_hi):
            s_ref = 0.5 * (s_dom[0] + s_dom[1])
            halves.append((
                [om_ax, wa_ax, cheb_nodes(n, *s_dom)],
                lambda th: {"Om": th[0], "wa": th[1], "w0": th[2] - th[1]},
                "w0wa-rot",
                (om_ref, wa_ref, s_ref),
            ))
        return "split", halves
    pnames = MODEL_PARAMS[model]
    if n_nodes is None:
        n_nodes = {1: 48, 2: 32}[len(pnames)]
    axes = [cheb_nodes(n_nodes, *dom(nm)) for nm in pnames]
    ref = {"Om": 0.3, "w0": -1.0}
    return "native", [(
        axes,
        lambda th: dict(zip(pnames, th)),
        ("native",) + pnames,
        tuple(clamp_ref(ref[nm], *dom(nm)) for nm in pnames),
    )]


class _Handle:
    """A term's window into its bundle, resolved at finalize: per-half
    ``(slots, B_t [R_t, K] f64, scale_t)`` with one
    ``(sl_a, sl_d, a_ref_t [R_t] f64)`` slot per curve of the entry's
    group (single-curve entries have one slot; a GROUP registers
    several curves that are SVD'd jointly so they share one
    orthonormal basis — the fs8 data/theory pair needs this to form
    its residual coefficient vector before squaring, see
    :func:`make_amp_pair_chi2`)."""

    def __init__(self, bundle):
        self.bundle = bundle
        self.per_half = None
        self.gen = -1  # bumped by each finalize; guards stale forms


class _Bundle:
    """All linear-chi2 curves of one (model, n_nodes) inside one
    fast-mode scope, co-compressed into a single coefficient program."""

    def __init__(self, model, n_nodes):
        self.model = model
        self.n_nodes = n_nodes
        self.domains = {}  # param -> (lo, hi); falls back to DOMAINS
        self.regs = {}  # (tag, key_extra) -> (curve_fn, _Handle)
        self._final = None
        self._gen = 0

    def set_domains(self, domains):
        if domains != self.domains:
            self.domains = dict(domains)
            self._final = None

    def register(self, curve_fns, tag, key_extra):
        """``curve_fns``: tuple of curve functions forming one group
        (jointly SVD'd into a shared basis)."""
        key = (tag, key_extra)
        if key not in self.regs:
            self.regs[key] = (tuple(curve_fns), _Handle(self))
            self._final = None  # new curve: refinalize lazily
        return self.regs[key][1]

    def finalized(self):
        if self._final is None:
            # table builds and constant materialisation must escape
            # any ambient jit trace (scope exit finalizes eagerly, but
            # a late registration can refinalize at first use)
            with jax.ensure_compile_time_eval():
                self._final = self._finalize()
        return self._final

    def _finalize(self):
        memo_key = (
            self.model,
            self.n_nodes,
            tuple(sorted(self.domains.items())),
            tuple(sorted(self.regs)),
            bool(jax.config.jax_enable_x64),
        )
        self._gen += 1
        if memo_key in _FINALIZE_MEMO:
            final, per_reg = _FINALIZE_MEMO[memo_key]
            for key, (curve_fn, handle) in self.regs.items():
                handle.per_half = per_reg[key]
                handle.gen = self._gen
            return final

        kind, halves_spec = _grid_spec(self.model, self.n_nodes, self.domains)
        reg_keys = sorted(self.regs)
        halves = []
        per_reg = {key: [] for key in reg_keys}
        for axes, to_params, map_tag, theta_ref_vec in halves_spec:
            node_shape = [len(ax) for ax in axes]
            flat = flatten_grid(axes)
            to_params_or = lambda th: dict(to_params(th), Or=OR_REF)

            blocks, projs, refs = [], [], []
            offset = 0
            windows = {}
            for key in reg_keys:
                curve_fns = self.regs[key][0]
                tag, key_extra = key
                tabs = []
                for ci, cf in enumerate(curve_fns):
                    ce = (
                        key_extra if len(curve_fns) == 1
                        else (key_extra, ci)
                    )
                    base = _cached_curve(
                        self.model, cf, flat, to_params, map_tag, tag, ce)
                    d = _cached_curve(
                        self.model, cf, flat, to_params_or,
                        (map_tag, "or", OR_REF), tag, ce,
                    ) - base
                    for which, t in (("base", base), ("or-delta", d)):
                        if not np.all(np.isfinite(t)):
                            i = int(np.argwhere(
                                ~np.isfinite(t).all(axis=-1)
                            )[0, 0])
                            raise FloatingPointError(
                                f"linear_chi2 table '{tag}' ({which}) is "
                                f"non-finite at grid node theta="
                                f"{np.asarray(flat)[i].tolist()} — the "
                                "padded domain left the curve's physical "
                                "region (see set_scope_domains)"
                            )
                    tabs.append((base, d))
                # group scale: the truncation contract is held in the
                # GROUP's units (one scale), so a multi-curve entry's
                # residual combination stays inside the contract too
                scale = float(max(np.max(np.abs(b)) for b, _ in tabs))
                # per-entry SVD over stacked [base_c; delta_c]* rows in
                # the entry's own scaled units: one orthonormal B_t
                # serves every curve of the group AND its radiation
                # delta, so the Or correction becomes an axpy on the
                # coefficient slice (the fs8 shared-basis trick,
                # growth_emulator._whitened_chi2_factor) and a group's
                # curves combine linearly in ONE rank space
                a_all, b_t = svd_rank_factor(
                    np.concatenate(
                        [t for pair in tabs for t in pair], axis=0
                    ) / scale,
                    TOL_SCALE,
                )
                m = tabs[0][0].shape[0]
                r_t = b_t.shape[0]
                slots = []
                for ci, (base, dtab) in enumerate(tabs):
                    a_fac = a_all[2 * ci * m:(2 * ci + 1) * m]
                    ad_fac = a_all[(2 * ci + 1) * m:(2 * ci + 2) * m]
                    blocks.extend([a_fac, ad_fac])
                    # composed-verification bookkeeping: both the base
                    # and the delta reconstruction go through B_t
                    projs.extend([b_t, b_t])
                    refs.extend([base / scale, dtab / scale])
                    a_ref = a_fac.reshape(*node_shape, -1)
                    for x, ax in zip(theta_ref_vec, axes):
                        a_ref = np.tensordot(
                            bary_vector_np(x, ax), a_ref, axes=(0, 0)
                        )
                    slots.append((
                        slice(offset, offset + r_t),
                        slice(offset + r_t, offset + 2 * r_t),
                        np.asarray(a_ref, np.float64),
                    ))
                    offset += 2 * r_t
                windows[key] = (tuple(slots), b_t, scale)

            stacked = np.concatenate(blocks, axis=1)  # [M, R_all]
            rep = compress(
                stacked.reshape(*node_shape, -1),
                node_shape,
                TOL_SCALE,
                proj=scipy.linalg.block_diag(*projs),
                ref=np.concatenate(refs, axis=1),
            )
            halves.append({
                "rep": rep,
                "axes": [jnp.asarray(ax) for ax in axes],
                "bw": jnp.asarray(bary_weights(len(axes[0]))),
            })
            for key in reg_keys:
                per_reg[key].append(windows[key])

        final = (kind, halves)
        for key, (curve_fn, handle) in self.regs.items():
            handle.per_half = per_reg[key]
            handle.gen = self._gen
        _FINALIZE_MEMO[memo_key] = (final, per_reg)
        return final

    def coeff(self, p, half_index):
        """The shared [R_all] coefficient vector — every term of the
        bundle traces this same subgraph; XLA CSE evaluates it once."""
        kind, halves = self.finalized()
        half = halves[half_index]
        if self.model == "w0wacdm":
            coords = (p["Om"], p["wa"], p["w0"] + p["wa"])
        else:
            coords = tuple(p[nm] for nm in MODEL_PARAMS[self.model])
        weights = [
            bary_vector(x, ax, half["bw"])
            for x, ax in zip(coords, half["axes"])
        ]
        return coeff_contract(weights, half["rep"])


# --- fast-mode scoping -------------------------------------------------------

_SCOPES = []


@contextmanager
def bundle_scope():
    """Terms built inside one scope co-compress per (model, n_nodes).
    fastmode.use_fast_mode opens one, so get_preset(fast=True) bundles
    each preset's terms together. Bundles finalize at scope exit —
    table builds run jax under the hood, so they must NOT be deferred
    into a consumer's jit trace."""
    scope = {}
    _SCOPES.append(scope)
    try:
        yield
    finally:
        _SCOPES.pop()
        for bundle in scope.values():
            bundle.finalized()


def _get_bundle(model, n_nodes):
    if _SCOPES:
        bundles = _SCOPES[-1]
        bkey = (model, n_nodes)
        if bkey not in bundles:
            bundles[bkey] = _Bundle(model, n_nodes)
        return bundles[bkey]
    return _Bundle(model, n_nodes)  # unscoped: a private single-term bundle


def set_scope_domains(bounds_by_name, pad: float = 0.03):
    """Narrow every bundle in the ACTIVE scope to the caller's prior
    box (get_preset calls this with the preset's spec bounds while its
    fast-mode scope is still open). Finalize is lazy — no table has
    been built yet — so this re-grids for free. Padded a little so the
    box edges stay interior to the interpolation grid."""
    if not _SCOPES:
        return
    domains = {}
    for nm in ("Om", "w0", "wa"):
        if nm in bounds_by_name:
            lo, hi = bounds_by_name[nm]
            w = pad * (hi - lo)
            lo, hi = float(lo - w), float(hi + w)
            # physical clamp: several presets bound Om at exactly 0 or
            # 1 (e.g. sn.union3's (0, 1), reference sn/union3.py:48).
            # Padding past either end lets a density coefficient go
            # negative — Om < 0 directly, Om > 1 - OR_REF through
            # Ode = 1 - Om - Or on the radiation-delta table — and the
            # split w0wacdm grid's (wa, s) corners reach effective
            # w0 = s - wa far outside the preset box, where a
            # negative-Ode rho_de term drives E^2(z) < 0 -> NaN tables
            # (caught by the finiteness check in _finalize). With
            # Or, Om, Ode all >= 0 and rho_de > 0, E^2 > 0 for every
            # family at ANY (w0, wa), so clamping Om to
            # [0, 1 - OR_REF] is sufficient for all grids. An Om = 0
            # box edge lands ON the grid's Lobatto endpoint (exact);
            # an Om = 1 edge sits 2e-4 outside (negligible
            # extrapolation of an analytic interpolant, far inside
            # the truncation contract).
            if nm == "Om":
                lo, hi = max(lo, 0.0), min(hi, 1.0 - OR_REF)
            domains[nm] = (lo, hi)
    for bundle in _SCOPES[-1].values():
        bundle.set_domains(domains)


# --- the per-term quadratic form --------------------------------------------


def make_linear_chi2(
    model: str,
    curve_fn,
    tag: str,
    key_extra: str,
    u0_c,
    u0_sq: float,
    w_c=None,
    q0=None,
    s_mat=None,
    beta_fn=None,
    gamma_fn=None,
    beta_ref: float = 1.0,
    gamma_ref=None,
    n_nodes: int = None,
):
    """Emulated ``fn(p) -> chi2`` for r(p) = u0 - beta(p) y(theta) - W gamma(p).

    ``curve_fn(flat_thetas [M, P] f64, to_params) -> [M, K]`` evaluates
    the c-space curve (an isometric image of the whitened theory
    vector) at grid nodes; it runs under ``f64_build`` and is
    disk-cached, keyed by ``(tag, key_extra, grid)`` — ``key_extra``
    must hash every array the curve closes over (z points, whitening,
    basis maps).

    The caller supplies the u0/W-side inner products in FULL residual
    space (they may have components outside the emulated subspace):
    ``u0_c`` [K] = the c-space image of u0; ``u0_sq`` = |u0|^2;
    ``w_c`` [K, J] = c-space image of the W columns; ``q0`` [J] =
    W^T u0; ``s_mat`` [J, J] = W^T W. ``beta_fn(p)`` defaults to 1;
    ``gamma_fn(p) -> [J]`` required iff W is given.
    """
    bundle = _get_bundle(model, n_nodes)
    handle = bundle.register((curve_fn,), tag, key_extra)
    if not _SCOPES:
        bundle.finalized()  # solo bundle: build now, never inside a trace

    u0_c = np.asarray(u0_c, np.float64)
    n_w = 0 if w_c is None else np.asarray(w_c).shape[1]
    if n_w:
        w_c64 = np.asarray(w_c, np.float64)
        q064 = np.asarray(q0, np.float64)
        s64 = np.asarray(s_mat, np.float64)
        g_ref = (
            np.zeros(n_w) if gamma_ref is None
            else np.asarray(gamma_ref, np.float64)
        )

    hi = jax.lax.Precision.HIGHEST
    vdot = lambda x, y: jnp.tensordot(x, y, axes=(0, 0), precision=hi)
    form_cache = {}

    def _form(half_index):
        """Assemble the half's f64 quadratic-form constants on first
        use (finalize must have run so the handle window is known).
        Keyed by the bundle generation: a later registration into the
        same bundle refinalizes it and re-windows every handle."""
        if form_cache.get("gen") != handle.gen:
            form_cache.clear()
            form_cache["gen"] = handle.gen
        if half_index in form_cache:
            return form_cache[half_index]
        with jax.ensure_compile_time_eval():
            return _build_form(half_index)

    def _build_form(half_index):
        slots, b_t, scale = handle.per_half[half_index]
        sl_a, sl_d, a_ref = slots[0]
        v0 = b_t @ u0_c  # [R_t]
        bs_ref = beta_ref * scale
        v_ref = v0 - bs_ref * a_ref
        c_ref = (
            u0_sq - 2.0 * bs_ref * float(a_ref @ v0)
            + bs_ref**2 * float(a_ref @ a_ref)
        )
        form = {
            "sl_a": sl_a,
            "sl_d": sl_d,
            "scale": scale,
            "ba_ref": jnp.asarray(bs_ref * a_ref),
        }
        if n_w:
            p_mat = b_t @ w_c64  # [R_t, J]
            q_ref = q064 - bs_ref * (p_mat.T @ a_ref)
            c_ref += float(-2.0 * g_ref @ q_ref + g_ref @ s64 @ g_ref)
            q_ref = q_ref - s64 @ g_ref
            v_ref = v_ref - p_mat @ g_ref
            form["p_mat"] = jnp.asarray(p_mat)
            form["q_ref"] = jnp.asarray(q_ref)
            form["s_mat"] = jnp.asarray(s64)
            form["g_ref"] = jnp.asarray(g_ref)
        form["v_ref"] = jnp.asarray(v_ref)
        form["c_ref"] = c_ref
        form_cache[half_index] = form
        return form

    def _half_chi2(p, half_index):
        a_all = bundle.coeff(p, half_index)  # shared across the bundle
        form = _form(half_index)
        a = a_all[form["sl_a"]]
        orr = p.get("Or", None)
        if orr is not None:
            a = a + (orr / OR_REF) * a_all[form["sl_d"]]
        beta = 1.0 if beta_fn is None else beta_fn(p)
        e = (beta * form["scale"]) * a - form["ba_ref"]
        out = form["c_ref"] - 2.0 * vdot(e, form["v_ref"]) + vdot(e, e)
        if n_w:
            g = gamma_fn(p) - form["g_ref"]
            out = (
                out
                + vdot(g, jnp.tensordot(
                    form["s_mat"], g, axes=(1, 0), precision=hi))
                - 2.0 * vdot(g, form["q_ref"])
                + 2.0 * vdot(e, jnp.tensordot(
                    form["p_mat"], g, axes=(1, 0), precision=hi))
            )
        return out

    def chi2(p):
        return _dispatch_halves(bundle, p, _half_chi2)

    return chi2


def _dispatch_halves(bundle, p, half_fn):
    """Evaluate ``half_fn(p, i)`` with the family's half-selection
    rule. The split w0wacdm box evaluates BOTH halves under
    ``jnp.where``: under the vmapped-walker batching every consumer
    uses, ``lax.cond`` lowers to ``select`` anyway (both branches
    execute per batch), and a measured cond-variant on the w0wacdm
    flagship showed no win (see ARCHITECTURE.md, round 5) — the
    seam stays branch-free and differentiable instead."""
    kind, halves = bundle.finalized()
    if kind == "split":
        s = p["w0"] + p["wa"]
        return jnp.where(s <= 0.0, half_fn(p, 0), half_fn(p, 1))
    return half_fn(p, 0)


def make_curve_values(model, curve_fn, tag, key_extra, n_nodes=None):
    """Emulated ``fn(p) -> [K]`` curve values riding the bundle's single
    shared contraction.

    For terms whose metric is PARAMETER-DEPENDENT — the quasar
    likelihood's diagonal ``sigma_i^2 + s^2`` (reference
    quasars/qsr_desi.py:68-80) — chi^2 cannot be collapsed to a fixed
    quadratic form at build time, but the geometry curve (here the
    distance-modulus deviation mu(theta) - mu_ref) is still a smooth
    function of the family's 1-3 parameters: register it in the bundle
    and reconstruct the K data-space values per eval with one
    [R_t, K] lift (2*K*R_t flops), then apply the parameter-dependent
    metric analytically over the K components. Radiation enters as the
    usual Or-secant axpy on the coefficient slice.
    """
    bundle = _get_bundle(model, n_nodes)
    handle = bundle.register((curve_fn,), tag, key_extra)
    if not _SCOPES:
        bundle.finalized()

    hi = jax.lax.Precision.HIGHEST
    cache = {}

    def _mats(half_index):
        if cache.get("gen") != handle.gen:
            cache.clear()
            cache["gen"] = handle.gen
        if half_index not in cache:
            with jax.ensure_compile_time_eval():
                slots, b_t, scale = handle.per_half[half_index]
                sl_a, sl_d, _ = slots[0]
                cache[half_index] = (sl_a, sl_d, jnp.asarray(scale * b_t))
        return cache[half_index]

    def _vals(p, half_index):
        a_all = bundle.coeff(p, half_index)
        sl_a, sl_d, b_scaled = _mats(half_index)
        a = a_all[sl_a]
        orr = p.get("Or", None)
        if orr is not None:
            a = a + (orr / OR_REF) * a_all[sl_d]
        return jnp.tensordot(a, b_scaled, axes=(0, 0), precision=hi)

    def values(p):
        return _dispatch_halves(bundle, p, _vals)

    return values


def make_amp_pair_chi2(
    model, curve_u_fn, curve_v_fn, tag, key_extra, amp_param: str,
    n_nodes=None,
):
    """Emulated ``fn(p) -> |y_u(theta) - p[amp_param] * y_v(theta)|^2``.

    The fs8 residual shape (reference fs8/fs8.py:72-85): a whitened
    DATA-side curve y_u = Linv(fs8_obs * q_AP(theta)) minus an
    amplitude-scaled whitened THEORY curve y_v = Linv fs8(theta)/s8,
    both functions of the family geometry only. The two curves are
    registered as one GROUP, so the joint SVD gives them a single
    orthonormal basis: the runtime forms the rank-space RESIDUAL
    coefficient r = scale*((a_u + t a_du) - amp*(a_v + t a_dv)) BEFORE
    squaring — |r|^2 is exactly |y_u - amp y_v|^2 within the group
    truncation contract, with none of the f32 cancellation a
    |y_u|^2 - 2 amp y_u.y_v + amp^2 |y_v|^2 expansion would suffer
    (each of those terms is ~30x chi^2 at the fs8 posterior bulk).
    Measured on the narrowed multiprobe box: shared-basis rank 16 vs
    9 + 10 separate, i.e. 4*16 = 64 bundle columns replace the
    standalone fs8 Tucker program (16.8k flops/eval, 31% of the
    multiprobe joint's wall time before this fold-in).
    """
    bundle = _get_bundle(model, n_nodes)
    handle = bundle.register((curve_u_fn, curve_v_fn), tag, key_extra)
    if not _SCOPES:
        bundle.finalized()

    hi = jax.lax.Precision.HIGHEST
    cache = {}

    def _slots(half_index):
        if cache.get("gen") != handle.gen:
            cache.clear()
            cache["gen"] = handle.gen
        if half_index not in cache:
            slots, b_t, scale = handle.per_half[half_index]
            (sl_au, sl_du, _), (sl_av, sl_dv, _) = slots
            cache[half_index] = (sl_au, sl_du, sl_av, sl_dv, scale)
        return cache[half_index]

    def _half(p, half_index):
        a_all = bundle.coeff(p, half_index)
        sl_au, sl_du, sl_av, sl_dv, scale = _slots(half_index)
        a_u, a_v = a_all[sl_au], a_all[sl_av]
        orr = p.get("Or", None)
        if orr is not None:
            t = orr / OR_REF
            a_u = a_u + t * a_all[sl_du]
            a_v = a_v + t * a_all[sl_dv]
        r = scale * (a_u - p[amp_param] * a_v)
        return jnp.tensordot(r, r, axes=(0, 0), precision=hi)

    def chi2(p):
        return _dispatch_halves(bundle, p, _half)

    return chi2
