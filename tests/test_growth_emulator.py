"""Chebyshev growth emulator vs the direct ODE solution."""

import numpy as np
import pytest

from cosmax.models.growth import fsigma8
from cosmax.models.growth_emulator import make_fs8_emulator


Z = np.array([0.02, 0.15, 0.44, 0.8, 1.36, 1.944])


@pytest.mark.parametrize(
    "model,params",
    [
        ("lcdm", {"Om": 0.29}),
        ("wzcdm", {"Om": 0.31, "w0": -0.85}),
        ("wzcdm", {"Om": 0.12, "w0": -2.3}),
        ("w0wacdm", {"Om": 0.32, "w0": -0.7, "wa": -0.9}),
    ],
)
def test_emulator_matches_ode(x64, model, params):
    emu = make_fs8_emulator(Z, model)
    p = dict(params, sigma8=1.0)
    got = np.asarray(emu(p))
    want = np.asarray(fsigma8(Z, dict(p), model)) / 1.0
    np.testing.assert_allclose(got, want, rtol=1e-6, atol=1e-9)


@pytest.mark.parametrize(
    "model,params",
    [
        ("wzcdm", {"Om": 0.31, "w0": -0.85}),
        ("w0wacdm", {"Om": 0.32, "w0": -0.7, "wa": -0.9}),
    ],
)
def test_emulator_factored_path_matches_ode(x64, model, params):
    # A production-size z grid (fs8 dataset has 66 redshifts) makes the
    # z-SVD factorisation pay, so this exercises the truncated-rank
    # path (tiny grids like Z above fall back to the exact table) and
    # pins its build-time <=1e-6 elementwise truncation contract
    # against the direct ODE.
    z = np.linspace(0.02, 1.944, 66)
    emu = make_fs8_emulator(z, model)
    p = dict(params, sigma8=1.0)
    got = np.asarray(emu(p))
    want = np.asarray(fsigma8(z, dict(p), model))
    np.testing.assert_allclose(got, want, rtol=2e-6, atol=1e-9)


def test_w0wacdm_emulator_near_crease(x64):
    # Regression: the CPL family's early-universe equation of state is
    # w0 + wa, and the unrotated (Om, w0, wa) Chebyshev box converged
    # only algebraically across the w0 + wa = 0 boundary layer (worst
    # rel ~ 2.4e-3 exactly here). The split-axis build must hold the
    # spectral contract at the old worst point and across the layer.
    z = np.linspace(0.02, 1.944, 66)
    emu = make_fs8_emulator(z, "w0wacdm")
    for w0, wa in [(-0.3, 0.5), (-0.54, 0.9), (-0.3, 0.1), (-0.9, 0.9)]:
        p = {"Om": 0.1, "w0": w0, "wa": wa, "sigma8": 1.0}
        got = np.asarray(emu(p))
        want = np.asarray(fsigma8(z, dict(p), "w0wacdm"))
        np.testing.assert_allclose(got, want, rtol=5e-6, atol=1e-9)


def test_emulator_exact_at_nodes(x64):
    from cosmax.models.growth_emulator import _cheb_nodes, DOMAINS

    emu = make_fs8_emulator(Z, "lcdm", n_nodes=16)
    om_node = float(_cheb_nodes(16, *DOMAINS["Om"])[7])
    p = {"Om": om_node, "sigma8": 1.0}
    got = np.asarray(emu(p))
    want = np.asarray(fsigma8(Z, p, "lcdm"))
    np.testing.assert_allclose(got, want, rtol=1e-10)


def test_tucker_compresses_smooth_tables_not_noise(x64):
    # _tucker must (a) find small per-axis ranks on a spectrally
    # smooth table, (b) hold the COMPOSED data-space error to tol,
    # and (c) not chase incompressible noise below the floor — it
    # falls back to the exact table when tol is unreachable.
    from cosmax.models.growth_emulator import _tucker

    rng = np.random.default_rng(0)
    n, R, N = 32, 6, 40
    x = np.linspace(-1, 1, n)
    # separable smooth factors -> per-axis rank ~ a few
    modes_a = np.stack([np.exp(-(k + 1) * x**2) for k in range(R)], axis=1)
    modes_b = np.stack([np.cos((k + 1) * x) for k in range(R)], axis=1)
    table = np.einsum("ik,jk->ijk", modes_a, modes_b)  # [n, n, R]
    proj = np.linalg.qr(rng.standard_normal((N, R)))[0].T  # [R, N]
    ref = table.reshape(-1, R) @ proj

    factors, core = _tucker(table, (n, n), 1e-6, proj=proj, ref=ref)
    assert factors is not None
    r1, r2 = factors[0].shape[1], factors[1].shape[1]
    assert r1 <= 10 and r2 <= 10, (r1, r2)
    rec = np.einsum("ia,jb,abk->ijk", *[np.asarray(f) for f in factors],
                    np.asarray(core))
    err = np.max(np.abs(rec.reshape(-1, R) @ proj - ref))
    assert err <= 1e-6

    # full-rank noise: tol unreachable -> exact-table fallback
    noisy = rng.standard_normal(table.shape)
    ref_n = noisy.reshape(-1, R) @ proj
    factors_n, core_n = _tucker(noisy, (n, n), 1e-6, proj=proj, ref=ref_n)
    assert factors_n is None
    np.testing.assert_array_equal(np.asarray(core_n), noisy)


def test_fast_fs8_chi2_far_tail_bound(x64):
    # Pin the measured worst point of a 24-point random sweep over the
    # full w0wacdm prior box: an early-DE-dominated corner ~8 sigma
    # from the posterior bulk. The truncation error is absolute in
    # whitened units, so chi2 error grows as sqrt(chi2): here the
    # measured |dchi2| is 2.2e-2 on chi2 ~ 125 (rel 1.8e-4) — bounded
    # at 0.05 absolute, which shifts logL by < 0.03 at a point 60
    # chi2-units above the MAP (no posterior effect; the 43-config
    # validation sweep confirms parity at <= 0.05 sigma).
    from cosmax.configs import get_preset

    fast = get_preset("fs8.fs8", "w0wacdm", fast=True)
    slow = get_preset("fs8.fs8", "w0wacdm")
    theta = np.array([0.175, 1.016, -1.551, 1.894, 0.926])
    a = float(sum(fast.chi2_breakdown()(theta).values()))
    b = float(sum(slow.chi2_breakdown()(theta).values()))
    assert a == pytest.approx(b, abs=0.05), (a, b)


def test_tt_3axis_tables_match_direct_contraction(x64):
    # The tensor-train sweep (_tt + _coeff) must reproduce the direct
    # full-table barycentric contraction at small bond ranks on a
    # separable smooth table, and _compress must pick the exact
    # flop-count minimum of {tt, tucker}.
    import jax.numpy as jnp
    from cosmax.models.growth_emulator import (
        _compress, _coeff, _eval_flops, _tt, _tucker,
    )

    rng = np.random.default_rng(0)
    n, R, N = 24, 5, 30
    x = np.linspace(-1, 1, n)
    ma = np.stack([np.exp(-(k + 1) * x**2) for k in range(R)], axis=1)
    mb = np.stack([np.cos((k + 1) * x) for k in range(R)], axis=1)
    mc = np.stack([1.0 / (2.0 + k + x) for k in range(R)], axis=1)
    table = np.einsum("ik,jk,lk->ijlk", ma, mb, mc)  # [n, n, n, R]
    proj = np.linalg.qr(rng.standard_normal((N, R)))[0].T
    ref = table.reshape(-1, R) @ proj

    tt = _tt(table, (n, n, n), 1e-6, proj=proj, ref=ref)
    assert tt is not None
    rep_tt = ("tt",) + tt
    bonds = [c.shape[-1] for c in rep_tt[2]]
    assert max(bonds) <= 12, bonds
    assert _eval_flops(rep_tt) < 2 * n**3 * R  # beats exact contraction

    weights = [jnp.asarray(rng.standard_normal(n)) for _ in range(3)]
    got = np.asarray(_coeff(weights, rep_tt))
    want = table
    for w in weights:
        want = np.tensordot(np.asarray(w), want, axes=(0, 0))
    err = np.max(np.abs((got - want) @ proj))
    assert err <= 2e-6 * max(np.max(np.abs(np.asarray(w))) for w in weights) ** 3

    # _compress returns the flop-count minimum of the two verified reps
    rep = _compress(table, (n, n, n), 1e-6, proj=proj, ref=ref)
    factors, core = _tucker(table, (n, n, n), 1e-6, proj=proj, ref=ref)
    rep_tuck = ("exact", core) if factors is None else ("tucker", factors, core)
    assert _eval_flops(rep) == min(_eval_flops(rep_tt), _eval_flops(rep_tuck))


def test_fast_fs8_term_matches_parity(x64):
    from cosmax.configs import get_preset

    theta = np.array([0.268, 0.789, 0.78])
    fast = get_preset("fs8.fs8", "lcdm", fast=True)
    slow = get_preset("fs8.fs8", "lcdm")
    a = float(sum(fast.chi2_breakdown()(theta).values()))
    b = float(sum(slow.chi2_breakdown()(theta).values()))
    assert a == pytest.approx(b, abs=1e-4)


def test_fast_fs8_term_matches_parity_wzcdm(x64):
    # The whitened rank-space chi2 emulator (make_fs8_chi2_emulator)
    # folds AP correction, data multiply and covariance whitening into
    # build-time factors; its only approximations are the Chebyshev
    # interpolation and the 1e-6-relative SVD truncations, so fast chi2
    # must match the parity path (direct ODE + GL-64 AP + explicit
    # whitening) at reference-discriminating accuracy.
    from cosmax.configs import get_preset

    fast = get_preset("fs8.fs8", "wzcdm", fast=True)
    slow = get_preset("fs8.fs8", "wzcdm")
    for theta in [
        np.array([0.268, 0.789, -1.1, 0.78]),
        np.array([0.45, 0.65, -0.4, 1.2]),
        np.array([0.15, 1.1, -2.2, 0.3]),
    ]:
        a = float(sum(fast.chi2_breakdown()(theta).values()))
        b = float(sum(slow.chi2_breakdown()(theta).values()))
        # The fast path's truncations are bounded ABSOLUTELY in
        # whitened-residual units (composed z-SVD + node cuts, 1e-6 of
        # max|whitened table| per element), so the chi2 error scales
        # as 2*sqrt(chi2)*|dy| — tiny relative error near the bulk,
        # growing like sqrt(chi2) in the far tails (measured worst
        # |dchi2| 2.3e-2 at chi2 ~ 125 over a 24-point random box
        # sweep; see test_fast_fs8_chi2_far_tail_bound).
        assert a == pytest.approx(b, rel=3e-6, abs=1e-3), theta


def test_fast_fs8_chi2_tracks_radiation(x64):
    # CMB/BBN-coupled presets inject Or into every term's params
    # (presets._radiation), and the parity fs8 path threads it through
    # e_of_z / the growth ODE — so the fast chi2 emulator interpolates
    # the whitened residual affinely in Or between build tables at
    # Or=0 and OR_REF (growth_emulator OR_REF). Before that fix the
    # fast path silently ignored Or: chi2 off by ~0.22 at Or=1e-4
    # (dchi2/dOr ~ 2240 on the multiprobe joint's fs8 term).
    from cosmax.data import load_fs8
    from cosmax.likelihoods.fs8 import build_fs8_term
    from cosmax.likelihoods.fastmode import use_fast_mode

    ds = load_fs8()
    for model, extra in [("wzcdm", {}), ("w0wacdm", {"wa": -0.4})]:
        par = build_fs8_term(ds, model)
        with use_fast_mode():
            fast = build_fs8_term(ds, model)
        for orr in (5e-5, 1e-4, 1.7e-4):
            p = dict(
                {"Om": 0.31, "w0": -1.0, "sigma8": 0.81, "f_err": 1.0},
                Or=orr,
                **extra,
            )
            a = float(par.chi2(p))
            b = float(fast.chi2(p))
            # secant curvature + delta-grid interp, both ~1e-3 near
            # the posterior bulk (see OR_DELTA_NODES rationale)
            assert a == pytest.approx(b, abs=5e-3), (model, orr)


def test_fast_fs8_term_matches_parity_w0wacdm_crease(x64):
    # w0wacdm goes through the split-axis chi2 build; pin the contract
    # at the old single-box worst point (the w0 + wa ~ 0 boundary
    # layer, see _make_fs8_emulator_w0wa).
    from cosmax.configs import get_preset

    fast = get_preset("fs8.fs8", "w0wacdm", fast=True)
    slow = get_preset("fs8.fs8", "w0wacdm")
    for om, s8, w0, wa, f in [
        (0.268, 0.789, -0.7, -0.9, 0.78),
        (0.1, 0.9, -0.54, 0.5, 1.0),
        (0.3, 0.8, -0.3, 0.3, 0.6),
    ]:
        theta = np.array([om, s8, w0, wa, f])
        a = float(sum(fast.chi2_breakdown()(theta).values()))
        b = float(sum(slow.chi2_breakdown()(theta).values()))
        # rel tolerance: see test_fast_fs8_term_matches_parity_wzcdm
        assert a == pytest.approx(b, rel=3e-6, abs=1e-3), theta


def test_table_disk_cache_roundtrip(tmp_path, monkeypatch):
    # _table_cached is content-addressed (memo key + solver-source
    # bytes): a second build with the same key must come back from disk
    # bit-for-bit, a corrupt file must fall back to a rebuild, and
    # COSMAX_TABLE_CACHE=0 must bypass the disk entirely.
    import os

    from cosmax.models import growth_emulator as ge

    monkeypatch.setenv("COSMAX_TABLE_CACHE", str(tmp_path))
    calls = []

    def build():
        calls.append(1)
        return np.arange(6, dtype=np.float64).reshape(2, 3)

    key = ("k", 1)
    a = ge._table_cached("solve", key, build)
    b = ge._table_cached("solve", key, build)
    assert len(calls) == 1 and np.array_equal(a, b)
    # distinct kind => distinct entry
    ge._table_cached("edm", key, build)
    assert len(calls) == 2
    # corrupt the file: must rebuild, not crash
    (path,) = [
        os.path.join(tmp_path, f)
        for f in os.listdir(tmp_path)
        if ge._table_cache_path("solve", key).endswith(f)
    ]
    with open(path, "wb") as f:
        f.write(b"garbage")
    c = ge._table_cached("solve", key, build)
    assert len(calls) == 3 and np.array_equal(a, c)

    monkeypatch.setenv("COSMAX_TABLE_CACHE", "0")
    ge._table_cached("solve", ("other", 2), build)
    assert len(calls) == 4
    assert ge._table_cache_path("solve", ("other", 2)) is None


def test_fast_fs8_chi2_gradient_matches_parity(x64):
    # HMC differentiates the fast path; the emulator's gradient must
    # track the parity path's (through the shared-z-basis radiation
    # delta too — d/dOr flows through the coarse barycentric vectors
    # and the rank-space axpy). Measured rel agreement ~1e-5 (1e-4 for
    # d/dOr whose truth is itself a secant-scale quantity); pinned an
    # order looser. wzcdm only: the w0wacdm parity-grad build is
    # minutes of compile for no extra code coverage (same _chi2_from_
    # block path; its value agreement is pinned above).
    import jax
    import jax.numpy as jnp

    from cosmax.data import load_fs8
    from cosmax.likelihoods.fs8 import build_fs8_term
    from cosmax.likelihoods.fastmode import use_fast_mode

    ds = load_fs8()
    par = build_fs8_term(ds, "wzcdm")
    with use_fast_mode():
        fast = build_fs8_term(ds, "wzcdm")
    names = ("Om", "w0", "sigma8", "Or")

    def grad_of(term):
        def f(vec):
            p = dict(zip(names, vec))
            p["f_err"] = 1.0
            return term.chi2(p)

        return jax.grad(f)

    x = jnp.asarray([0.31, -1.0, 0.81, 1e-4])
    gp = np.asarray(grad_of(par)(x))
    gf = np.asarray(grad_of(fast)(x))
    np.testing.assert_allclose(gf, gp, rtol=2e-3)
