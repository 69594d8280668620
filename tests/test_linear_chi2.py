"""The rank-space linear-residual chi^2 emulators (models.linear_chi2)
and their SN / CC / BAO fast paths.

Contract under test: the emulated chi^2 tracks the exact-algebra path
it replaces (compressed SN / GL BAO / direct CC — all of which are
themselves pinned against the reference parity paths elsewhere) to
within the truncation + Or-secant budget near the posterior bulk, with
gradients good enough for HMC, across every model family, nuisance
convention and r_d treatment — solo or co-compressed in a bundle.
"""

import numpy as np
import pytest
import jax

from cosmax.data import load_bao, load_cc, load_sn
from cosmax.likelihoods.bao import (
    build_bao_term,
    rd_fixed,
    rd_from_r_drag,
    rd_over_h,
    rd_param,
)
from cosmax.likelihoods.cc import build_cc_term
from cosmax.likelihoods.sn import build_sn_term


def _sweep(term_a, term_b, points, tol, grad_tol=None, grad_keys=()):
    worst = 0.0
    for p in points:
        a, b = float(term_a.chi2(p)), float(term_b.chi2(p))
        worst = max(worst, abs(a - b))
        assert a == pytest.approx(b, abs=tol), (p, a, b)
    if grad_tol:
        p = points[0]
        for k in grad_keys:
            ga = float(jax.grad(lambda t: term_a.chi2({**p, k: t}))(p[k]))
            gb = float(jax.grad(lambda t: term_b.chi2({**p, k: t}))(p[k]))
            assert gb == pytest.approx(ga, abs=grad_tol * max(1.0, abs(ga))), k
    return worst


def _points(rng, n, model, extra):
    pts = []
    for _ in range(n):
        p = {"Om": rng.uniform(0.2, 0.45)}
        if model in ("wcdm", "wzcdm", "w0wacdm"):
            p["w0"] = rng.uniform(-1.5, -0.5)
        if model == "w0wacdm":
            p["wa"] = rng.uniform(-1.5, 1.0)
        for k, (lo, hi) in extra.items():
            p[k] = rng.uniform(lo, hi)
        if "H0" in p:
            p["Or"] = 4.15e-5 / (p["H0"] / 100.0) ** 2
        pts.append(p)
    return pts


@pytest.mark.parametrize("model", ["lcdm", "wcdm", "wzcdm", "w0wacdm"])
def test_sn_emulated_tracks_compressed(x64, model):
    ds = load_sn("union3")
    kw = dict(mag_param="dM", h0=70.0, use_z_hel=False)
    comp = build_sn_term(ds, model, method="compressed", **kw)
    emu = build_sn_term(ds, model, method="emulated", **kw)
    pts = _points(np.random.default_rng(0), 12, model, {"dM": (-0.5, 0.5)})
    _sweep(comp, emu, pts, tol=2e-3, grad_tol=1e-4, grad_keys=("Om", "dM"))


def test_sn_emulated_numeric_h0_types(x64):
    """A numeric h0 that is not a Python float (np.float64, int) must
    behave exactly like the float: build_sn_term coerces it, so the
    emulated path keeps the constant -5 log10(h0/70) magnitude shift
    (ADVICE r4: np.float64 used to fall back to h0_ref=70 silently)."""
    ds = load_sn("union3")
    kw = dict(mag_param="dM", use_z_hel=False, method="emulated")
    ref = build_sn_term(ds, "lcdm", h0=67.0, **kw)
    as_np = build_sn_term(ds, "lcdm", h0=np.float64(67.0), **kw)
    as_int = build_sn_term(ds, "lcdm", h0=67, **kw)
    p = {"Om": 0.3, "dM": 0.1}
    want = float(ref.chi2(p))
    assert float(as_np.chi2(p)) == pytest.approx(want, abs=1e-9)
    assert float(as_int.chi2(p)) == pytest.approx(want, abs=1e-9)


def test_sn_emulated_sampled_h0_radiation(x64):
    """The flagship convention: sampled H0 acts as a uniform -5 log10 h
    magnitude shift (an analytic gamma column), radiation via the
    secant delta — both against the compressed path evaluating them
    exactly. Gradients for every parameter HMC would touch."""
    ds = load_sn("des5y")
    kw = dict(mag_param="dM", h0="H0")
    comp = build_sn_term(ds, "wzcdm", method="compressed", **kw)
    emu = build_sn_term(ds, "wzcdm", method="emulated", **kw)
    pts = _points(
        np.random.default_rng(1), 10, "wzcdm",
        {"dM": (-0.5, 0.5), "H0": (62.0, 74.0)},
    )
    # chi2 ~ 1650 here; 1e-2 abs = ~6e-6 relative (Or-secant dominated)
    _sweep(comp, emu, pts, tol=1e-2, grad_tol=1e-4,
           grad_keys=("Om", "w0", "dM", "H0"))


def test_sn_emulated_cepheids(x64):
    """SH0ES variant: calibrator rows are constants + M; the H0 shift
    must NOT touch them (zeroed basis rows -> zeroed gamma columns)."""
    ds = load_sn("pantheon_plus_shoes")
    kw = dict(mag_param="M", h0="H0", cepheids=True)
    comp = build_sn_term(ds, "wzcdm", method="compressed", **kw)
    emu = build_sn_term(ds, "wzcdm", method="emulated", **kw)
    pts = _points(
        np.random.default_rng(2), 8, "wzcdm",
        {"M": (-19.45, -19.15), "H0": (66.0, 76.0)},
    )
    _sweep(comp, emu, pts, tol=1e-2, grad_tol=1e-4, grad_keys=("M", "H0"))


def test_sn_emulated_h0_free(x64):
    """H0-free parameterisation: the offset absorbs 5 log10(c/H0); no
    gamma column for h at all (bao/desi_des5y.py:34-37)."""
    ds = load_sn("des5y")
    comp = build_sn_term(ds, "wzcdm", "dM", h0=None, method="compressed")
    emu = build_sn_term(ds, "wzcdm", "dM", h0=None, method="emulated")
    pts = _points(np.random.default_rng(3), 8, "wzcdm", {"dM": (-9.4, -9.0)})
    _sweep(comp, emu, pts, tol=5e-3)


@pytest.mark.parametrize(
    "rd_case",
    ["fixed", "param", "over_h", "r_drag"],
)
def test_bao_emulated_all_rd_treatments(x64, rd_case):
    """beta = (c/H0)/r_d covers every r_d treatment unchanged — the
    emulated tables never see r_d at all."""
    ds = load_bao("desi_dr2")
    rd_fn, extra = {
        "fixed": (rd_fixed(147.09), {}),
        "param": (rd_param("rd"), {"rd": (138.0, 155.0)}),
        "over_h": (rd_over_h("rd_h"), {"rd_h": (95.0, 105.0)}),
        "r_drag": (rd_from_r_drag("aizpuru"), {"Obh2": (0.021, 0.023)}),
    }[rd_case]
    gl = build_bao_term(ds, "wzcdm", rd_fn, grid=("gl", 64))
    emu = build_bao_term(ds, "wzcdm", rd_fn, grid=("emu",))
    pts = _points(
        np.random.default_rng(4), 10, "wzcdm",
        dict(extra, H0=(62.0, 73.0)),
    )
    _sweep(gl, emu, pts, tol=2e-2, grad_tol=1e-4, grad_keys=("Om", "H0"))


@pytest.mark.parametrize("model", ["lcdm", "w0wacdm"])
def test_cc_emulated_tracks_direct(x64, model):
    ds = load_cc()
    for conv in ("divide", "multiply"):
        dr = build_cc_term(ds, model, "f", conv, method="direct")
        em = build_cc_term(ds, model, "f", conv, method="emulated")
        pts = _points(
            np.random.default_rng(5), 8, model,
            {"H0": (60.0, 75.0), "f": (0.5, 1.2)},
        )
        _sweep(dr, em, pts, tol=5e-3, grad_tol=1e-4, grad_keys=("H0", "f"))


def test_bundle_matches_solo_builds(x64):
    """Co-compressed terms give the same chi^2 as standalone builds:
    bundling changes the factorisation, not the function."""
    from cosmax.models.linear_chi2 import bundle_scope

    bao_ds = load_bao("desi_dr2")
    sn_ds = load_sn("union3")
    solo_bao = build_bao_term(bao_ds, "wzcdm", rd_param("rd"), grid=("emu",))
    solo_sn = build_sn_term(
        sn_ds, "wzcdm", "dM", h0=70.0, use_z_hel=False, method="emulated"
    )
    with bundle_scope():
        b_bao = build_bao_term(bao_ds, "wzcdm", rd_param("rd"), grid=("emu",))
        b_sn = build_sn_term(
            sn_ds, "wzcdm", "dM", h0=70.0, use_z_hel=False, method="emulated"
        )
    for p in _points(
        np.random.default_rng(6), 6, "wzcdm",
        {"H0": (62.0, 73.0), "rd": (140.0, 152.0), "dM": (-0.4, 0.4)},
    ):
        # both factorisations carry the same absolute contract, whose
        # chi2 image scales as 2*sqrt(chi2)*|dy|
        for solo, bundled in ((solo_bao, b_bao), (solo_sn, b_sn)):
            want = float(solo.chi2(p))
            tol = 1e-3 + 2e-4 * np.sqrt(max(want, 0.0))
            assert float(bundled.chi2(p)) == pytest.approx(want, abs=tol)


def test_bundle_refinalize_after_late_registration(x64):
    """A term traced BEFORE a sibling registers must still be correct
    after the bundle refinalizes (the stale-window bug class: handles
    are re-sliced, cached quadratic forms must regenerate)."""
    from cosmax.models.linear_chi2 import bundle_scope

    bao_ds = load_bao("desi_dr2")
    sn_ds = load_sn("union3")
    ref_bao = build_bao_term(bao_ds, "wcdm", rd_fixed(147.09), grid=("gl", 64))
    p = {"Om": 0.31, "w0": -0.95, "H0": 68.0, "dM": -0.05}
    with bundle_scope():
        b_bao = build_bao_term(bao_ds, "wcdm", rd_fixed(147.09), grid=("emu",))
        first = float(b_bao.chi2(p))  # finalizes a 1-term bundle
        b_sn = build_sn_term(
            sn_ds, "wcdm", "dM", h0=70.0, use_z_hel=False, method="emulated"
        )
        _ = float(b_sn.chi2(p))  # refinalizes with 2 terms
        second = float(b_bao.chi2(p))  # must use the NEW windows
    want = float(ref_bao.chi2(p))
    assert first == pytest.approx(want, abs=1e-3)
    assert second == pytest.approx(want, abs=1e-3)


def test_preset_domains_cover_prior_box(x64):
    """get_preset(fast=True) narrows the emulator grid to the preset's
    own prior box: the chi^2 must still track parity AT the bounds
    (the 3% pad keeps them interior) and stay finite slightly outside
    (samplers evaluate rejected proposals there)."""
    from cosmax.configs import get_preset

    fast = get_preset("bao.desi_cmb_des5y", "wzcdm", fast=True)
    par = get_preset("bao.desi_cmb_des5y", "wzcdm")
    lo, hi = par.spec.bounds[:, 0], par.spec.bounds[:, 1]
    for frac in (0.0, 1.0):
        theta = lo + frac * (hi - lo)
        fb = sum(float(v) for v in fast.chi2_breakdown()(theta).values())
        pb = sum(float(v) for v in par.chi2_breakdown()(theta).values())
        # box corners sit far up the chi^2 surface; the truncation
        # contract scales as sqrt(chi2)
        assert fb == pytest.approx(pb, abs=2e-4 * max(pb, 1.0) + 5e-2)
    outside = np.asarray(hi + 0.005 * (hi - lo))
    vals = fast.chi2_breakdown()(outside)
    assert all(np.isfinite(float(v)) for v in vals.values())


def test_omega_edge_preset_builds(x64):
    """Presets whose prior box bounds Om at exactly 0 or 1 (reference
    sn/union3.py:48 etc.) must build finite emulator tables: the 3%
    grid pad is clamped to the physical Om range [0, 1 - OR_REF]
    (set_scope_domains), because a node with a negative density
    coefficient drives E^2(z) < 0 -> NaN tables -> SVD failure at
    finalize. w0wacdm is the worst case — its rotated (wa, s) grid
    corners reach effective w0 = s - wa far outside the preset box.
    Regression for the round-5 sweep failure."""
    from cosmax.configs import get_preset

    for name, model in (
        ("sn.union3", "wcdm"),
        ("sn.union3", "w0wacdm"),
        ("sn.des5y_bins", "w0wacdm"),
    ):
        fit = get_preset(name, model, fast=True)
        lo, hi = fit.spec.bounds[:, 0], fit.spec.bounds[:, 1]
        for frac in (0.0, 0.5, 1.0):
            theta = lo + frac * (hi - lo)
            val = float(fit.log_prob()(np.asarray(theta)))
            assert np.isfinite(val) or val == -np.inf, (name, model, frac)
        # parity at the box midpoint (posterior-bulk-adjacent)
        par = get_preset(name, model)
        mid = 0.5 * (lo + hi)
        fb = sum(float(v) for v in fit.chi2_breakdown()(mid).values())
        pb = sum(float(v) for v in par.chi2_breakdown()(mid).values())
        assert fb == pytest.approx(pb, abs=2e-4 * max(pb, 1.0) + 5e-2), (
            name, model)


def test_quasar_emulated_tracks_direct(x64):
    """The bundle-registered mu(z; theta) curve (make_curve_values)
    against the 3000-pt cumulative-trapezoid parity path, with the
    s-dependent diagonal metric applied analytically — chi2, log-norm
    and gradients for every parameter HMC touches, radiation on."""
    from cosmax.data import load_quasars
    from cosmax.likelihoods.fastmode import use_fast_mode
    from cosmax.likelihoods.quasars import build_quasar_term

    _, qz, qmu, qsig = load_quasars(22)
    direct = build_quasar_term(qz, qmu, qsig, "wzcdm")
    with use_fast_mode():
        emu = build_quasar_term(qz, qmu, qsig, "wzcdm")
    pts = _points(
        np.random.default_rng(7), 10, "wzcdm",
        {"dM_qsr": (-0.4, 0.4), "s": (0.05, 1.2)},
    )
    for p in pts:
        p["Or"] = 8e-5
    # parity grid's own trapz error ~1e-3 in chi2; the emulated curve
    # is converged (prefix-GL 16) so the difference IS the grid error
    _sweep(direct, emu, pts, tol=2e-2, grad_tol=2e-3,
           grad_keys=("Om", "w0", "dM_qsr", "s"))
    # log_norm is metric-only and must be identical
    p = pts[0]
    assert float(emu.log_norm(p)) == pytest.approx(
        float(direct.log_norm(p)), rel=1e-6
    )


def test_fs8_pair_tracks_parity(x64):
    """The group-registered fs8 data/theory pair (make_amp_pair_chi2)
    against the growth-ODE parity path: chi2 and gradients (including
    sigma8, the amplitude the rank-space residual scales by, and Or
    through both curves' delta slices)."""
    from cosmax.data import load_fs8
    from cosmax.likelihoods.fastmode import use_fast_mode
    from cosmax.likelihoods.fs8 import build_fs8_term

    ds = load_fs8()
    par = build_fs8_term(ds, "wzcdm")
    with use_fast_mode():
        emu = build_fs8_term(ds, "wzcdm")
    pts = _points(
        np.random.default_rng(8), 8, "wzcdm",
        {"sigma8": (0.6, 1.0), "f_err": (0.7, 1.3)},
    )
    for p in pts:
        p["Or"] = 1.2e-4
    _sweep(par, emu, pts, tol=5e-2, grad_tol=2e-3,
           grad_keys=("Om", "w0", "sigma8", "f_err"))


def test_w0wacdm_seam_continuity(x64):
    """chi^2 and its (w0, wa) gradient across the split-half seam
    s = w0 + wa = 0, where two independently-built interpolants meet
    (VERDICT r4 weak #4). Both halves interpolate the SAME analytic
    curve tables, and s = 0 is a Chebyshev-Lobatto endpoint of both
    grids, so the seam jump is bounded by twice the truncation
    contract — not by interpolation error."""
    import jax

    sn_ds = load_sn("union3")
    bao_ds = load_bao("desi_dr2")
    sn = build_sn_term(
        sn_ds, "w0wacdm", "dM", h0=70.0, use_z_hel=False, method="emulated"
    )
    bao = build_bao_term(bao_ds, "w0wacdm", rd_param("rd"), grid=("emu",))
    # 1e-7/1e-5 probe the DISCONTINUITY; wider eps would mostly measure
    # the smooth O(|dchi2/ds| * eps) variation (~0.1 at eps=1e-3 here)
    eps_list = (1e-7, 1e-5)
    for term, nuis in ((sn, {"dM": -0.05}), (bao, {"H0": 68.0, "rd": 147.0})):
        for om, w0 in ((0.31, -0.9), (0.25, -1.2), (0.42, -0.6)):
            for eps in eps_list:
                lo = dict(nuis, Om=om, w0=w0, wa=-w0 - eps)  # s = -eps
                hi = dict(nuis, Om=om, w0=w0, wa=-w0 + eps)  # s = +eps
                c_lo, c_hi = float(term.chi2(lo)), float(term.chi2(hi))
                scale = max(1.0, np.sqrt(max(c_lo, c_hi)))
                # value continuity: within the two halves' combined
                # truncation budget (2*sqrt(chi2)*tol_y per side) plus
                # the true O(eps) variation
                assert abs(c_hi - c_lo) <= 6e-3 * scale + 10.0 * eps, (
                    term.name, om, w0, eps, c_lo, c_hi)
            # gradient continuity at the tightest eps, both params
            for k in ("w0", "wa"):
                eps = 1e-5
                lo = dict(nuis, Om=om, w0=w0, wa=-w0 - eps)
                hi = dict(nuis, Om=om, w0=w0, wa=-w0 + eps)
                g = [
                    float(jax.grad(lambda t, pp=pp, kk=k: term.chi2(
                        {**pp, kk: t}))(pp[k]))
                    for pp in (lo, hi)
                ]
                ref = max(1.0, abs(g[0]), abs(g[1]))
                assert abs(g[0] - g[1]) <= 2e-2 * ref, (
                    term.name, k, om, w0, g)


def test_table_cache_isolates_model_families(x64, tmp_path, monkeypatch):
    """wcdm and wzcdm share pnames ("Om", "w0"), so their grid nodes
    and map_tag are byte-identical on equal domains — the disk cache
    key must separate their tables by itself (_cached_curve folds the
    bundle's model in; SN/BAO/CC additionally tag per model, but the
    fs8/quasar registrations did not). Regression for the round-5
    sweep bug where fs8.fs8[wcdm] sampled a bit-identical copy of the
    wzcdm posterior and qsr.*[wzcdm] drifted 0.37-0.47 sigma:
    whichever family built its quasar/fs8 curve table first had
    poisoned the shared cache entry for the other."""
    from cosmax.data import load_quasars
    from cosmax.likelihoods.fastmode import use_fast_mode
    from cosmax.likelihoods.quasars import build_quasar_term

    monkeypatch.setenv("COSMAX_TABLE_CACHE", str(tmp_path))
    _, qz, qmu, qsig = load_quasars(22)
    # build order matters: wcdm seeds the on-disk cache, wzcdm must
    # NOT read it back (pre-fix it did, so em_z tracked dr_w)
    with use_fast_mode():
        em_w = build_quasar_term(qz, qmu, qsig, "wcdm")
        em_z = build_quasar_term(qz, qmu, qsig, "wzcdm")
    dr_w = build_quasar_term(qz, qmu, qsig, "wcdm")
    dr_z = build_quasar_term(qz, qmu, qsig, "wzcdm")
    pts = _points(
        np.random.default_rng(11), 4, "wcdm",
        {"dM_qsr": (-0.4, 0.4), "s": (0.05, 1.2)},
    )
    _sweep(dr_w, em_w, pts, tol=2e-2)
    _sweep(dr_z, em_z, pts, tol=2e-2)
    # and the two families genuinely differ at w0 != -1 (guards the
    # test itself against a degenerate point choice)
    p = dict(pts[0], w0=-0.6)
    assert abs(float(dr_w.chi2(p)) - float(dr_z.chi2(p))) > 0.5
