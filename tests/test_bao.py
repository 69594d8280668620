"""BAO likelihood parity vs the reference algorithm (oracle) and the
published docstring chi^2 values (reference bao/desi.py:202-275)."""

import numpy as np
import pytest

from cosmax.data import load_bao
from cosmax.likelihoods.bao import build_bao_term, rd_fixed
from tests import oracles


@pytest.fixture(scope="module")
def desi():
    return load_bao("desi_dr2")


@pytest.fixture(scope="module")
def sdss():
    # The published SDSS result (chi2 11.81, dof 15 = 17 pts - 2 params)
    # is the 17-point compilation variant.
    return load_bao("sdss_dr16_comp")


@pytest.mark.parametrize(
    "model,params",
    [
        ("lcdm", {"H0": 69.0, "Om": 0.298}),
        ("wcdm", {"H0": 67.8, "Om": 0.297, "w0": -0.915}),
        ("wzcdm", {"H0": 67.0, "Om": 0.308, "w0": -0.832}),
        ("w0wacdm", {"H0": 66.0, "Om": 0.32, "w0": -0.7, "wa": -0.9}),
    ],
)
def test_chi2_matches_oracle_1e6(x64, desi, model, params):
    term = build_bao_term(desi, model, rd_fixed(147.09), grid=("dyn_trapz", 300))
    got = float(term.chi2(params))
    delta = desi.values - oracles.bao_theory(
        desi.z,
        desi.quantity,
        params["H0"],
        params["Om"],
        model,
        w0=params.get("w0", -1.0),
    )
    if model == "w0wacdm":
        dh = oracles.C / oracles.hubble(desi.z, params["H0"], params["Om"], model,
                                        params["w0"], params["wa"])
        dm = oracles.dm_trapz(desi.z, params["H0"], params["Om"], model,
                              params["w0"], params["wa"])
        dv = (desi.z * dh * dm**2) ** (1.0 / 3.0)
        table = np.stack([dv, dm, dh])
        delta = desi.values - table[desi.quantity, np.arange(desi.n)] / 147.09
    want = oracles.gaussian_chi2(delta, desi.cov)
    assert got == pytest.approx(want, abs=1e-6)


def test_published_chi2_desi_lcdm(x64, desi):
    """bao/desi.py docstring: chi2 = 10.27 at h=0.690, Om=0.298."""
    term = build_bao_term(desi, "lcdm", rd_fixed(147.09), grid=("dyn_trapz", 300))
    assert float(term.chi2({"H0": 69.0, "Om": 0.298})) == pytest.approx(10.27, abs=0.01)


def test_published_chi2_desi_wzcdm(x64, desi):
    """bao/desi.py docstring: chi2 = 8.44 at h=0.670, Om=0.308, w0=-0.832."""
    term = build_bao_term(desi, "wzcdm", rd_fixed(147.09), grid=("dyn_trapz", 300))
    got = float(term.chi2({"H0": 67.0, "Om": 0.308, "w0": -0.832}))
    assert got == pytest.approx(8.44, abs=0.01)


def test_published_chi2_sdss_lcdm(x64, sdss):
    """bao/desi.py docstring (SDSS block): chi2 = 11.81 at h=0.688, Om=0.294."""
    term = build_bao_term(sdss, "lcdm", rd_fixed(147.09), grid=("dyn_trapz", 300))
    assert float(term.chi2({"H0": 68.8, "Om": 0.294})) == pytest.approx(11.81, abs=0.02)


def test_gl_fast_path_agrees_with_parity_path(x64, desi):
    gl = build_bao_term(desi, "wzcdm", rd_fixed(147.09), grid=("gl", 64))
    tz = build_bao_term(desi, "wzcdm", rd_fixed(147.09), grid=("dyn_trapz", 300))
    p = {"H0": 67.0, "Om": 0.308, "w0": -0.832}
    # GL is the converged integral; the 300-pt trapezoid is accurate to ~1e-5
    assert float(gl.chi2(p)) == pytest.approx(float(tz.chi2(p)), abs=1e-4)
