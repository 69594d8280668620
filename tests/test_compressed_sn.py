"""The compressed (Chebyshev-basis) SN chi^2 vs the dense parity path.

The compressed path replaces the reference's 1000-pt
cumulative-trapezoid + N^2 whitened matmul with GL node integrals and a
(K+1)-dim whitened quadratic form. Its Chebyshev truncation is
converged by K=32 (diffs ~1e-12); the residual ~0.01 difference vs the
dense path at reference grids is the *dense* path's own trapezoid
discretisation error (dense chi^2 converges towards the compressed
value as its grid is refined)."""

import numpy as np
import pytest

from cosmax.data import load_sn
from cosmax.likelihoods.sn import build_sn_term


CASES = [
    ("union3", "dM", 70.0, False),
    ("des5y", "dM", 70.0, True),
    ("pantheon_plus", "M", 70.0, True),
]

PARAMS = [
    {"Om": 0.35, "w0": -0.9},
    {"Om": 0.25, "w0": -1.4},
    {"Om": 0.31, "w0": -1.0},
]


@pytest.mark.parametrize("dsname,mag,h0,zhel", CASES)
def test_compressed_matches_dense_refined_grid(x64, dsname, mag, h0, zhel):
    ds = load_sn(dsname)
    comp = build_sn_term(ds, "wzcdm", mag, h0=h0, use_z_hel=zhel, method="compressed")
    dense_fine = build_sn_term(
        ds, "wzcdm", mag, h0=h0, use_z_hel=zhel, grid_num=20000
    )
    for base in PARAMS:
        p = dict(base)
        p[mag] = -19.3 if mag == "M" else -0.05
        a = float(comp.chi2(p))
        b = float(dense_fine.chi2(p))
        # both are near-converged; residual is the 20k grid's trapz error
        assert a == pytest.approx(b, abs=2e-3 * max(1.0, abs(b)) ** 0.5)


def test_cheb_truncation_converged(x64):
    ds = load_sn("des5y")
    p = {"Om": 0.35, "w0": -0.9, "dM": -0.05}
    c32 = build_sn_term(ds, "wzcdm", "dM", h0=70.0, method="compressed", cheb_order=32)
    c96 = build_sn_term(ds, "wzcdm", "dM", h0=70.0, method="compressed", cheb_order=96)
    assert float(c32.chi2(p)) == pytest.approx(float(c96.chi2(p)), abs=1e-6)


def test_compressed_close_to_reference_grid(x64):
    """Sampling-grade agreement with the reference discretisation:
    within ~0.05 in chi^2 (logL shift < 0.03)."""
    for dsname, mag, h0, zhel in CASES:
        ds = load_sn(dsname)
        comp = build_sn_term(
            ds, "wzcdm", mag, h0=h0, use_z_hel=zhel, method="compressed"
        )
        dense = build_sn_term(ds, "wzcdm", mag, h0=h0, use_z_hel=zhel)
        p = {"Om": 0.3, "w0": -1.1, mag: -19.35 if mag == "M" else 0.0}
        assert float(comp.chi2(p)) == pytest.approx(float(dense.chi2(p)), abs=0.05)


def test_h0_free_compressed(x64):
    ds = load_sn("des5y")
    comp = build_sn_term(ds, "wzcdm", "dM", h0=None, method="compressed")
    dense = build_sn_term(ds, "wzcdm", "dM", h0=None, grid_num=20000)
    p = {"Om": 0.31, "w0": -0.95, "dM": -9.23}
    assert float(comp.chi2(p)) == pytest.approx(float(dense.chi2(p)), abs=0.01)


def test_fast_preset_uses_emulated():
    from cosmax.configs import get_preset

    fast = get_preset("bao.desi_cmb_des5y", "wzcdm", fast=True)
    slow = get_preset("bao.desi_cmb_des5y", "wzcdm")
    sn_fast = [t for t in fast.terms if t.name == "sn"][0]
    sn_slow = [t for t in slow.terms if t.name == "sn"][0]
    assert sn_fast.meta.get("method") == "emulated"
    assert sn_slow.meta.get("method") not in ("compressed", "emulated")


def test_cepheid_anchored_compressed(x64):
    """SH0ES variant: calibrator rows are constants + M; compressed
    matches a fine-grid dense evaluation."""
    ds = load_sn("pantheon_plus_shoes")
    comp = build_sn_term(
        ds, "wzcdm", "M", h0="H0", cepheids=True, method="compressed"
    )
    dense = build_sn_term(
        ds, "wzcdm", "M", h0="H0", cepheids=True, grid_num=20000
    )
    p = {"Om": 0.33, "w0": -1.0, "M": -19.25, "H0": 73.0}
    assert float(comp.chi2(p)) == pytest.approx(float(dense.chi2(p)), abs=0.05)
    p2 = {"Om": 0.30, "w0": -0.8, "M": -19.3, "H0": 70.0}
    assert float(comp.chi2(p2)) == pytest.approx(float(dense.chi2(p2)), abs=0.05)
