import numpy as np
import jax.numpy as jnp
import pytest

from cosmax.compare import compare_models, laplace_log_evidence
from cosmax.configs.presets import FitSpec
from cosmax.likelihoods.base import ParamSpec, Term


def _gaussian_fit(cov):
    """Minimal FitSpec whose likelihood is N(0, cov) (unnormalised) on a
    box wide enough to hold all its mass."""
    d = cov.shape[0]
    prec = jnp.asarray(np.linalg.inv(cov))
    term = Term(name="gauss", chi2=lambda p: _chi2(p, prec, d))
    spec = ParamSpec(
        tuple(f"x{i}" for i in range(d)),
        np.array([[-50.0, 50.0]] * d),
    )
    return FitSpec("gauss", "lcdm", spec, (term,), lambda p: p, data_size=d)


def _chi2(p, prec, d):
    x = jnp.stack([p[f"x{i}"] for i in range(d)])
    return x @ prec @ x


def test_laplace_log_evidence_gaussian_exact(x64):
    """For a Gaussian likelihood with uniform prior over volume V the
    Laplace evidence is exact: ln Z = (D/2) ln 2pi + 0.5 ln|cov| - ln V."""
    cov = np.array([[2.0, 0.3], [0.3, 0.5]])
    fit = _gaussian_fit(cov)
    got = laplace_log_evidence(fit, np.zeros(2))
    expected = (
        np.log(2.0 * np.pi) + 0.5 * np.linalg.slogdet(cov)[1]
        - 2.0 * np.log(100.0)
    )
    np.testing.assert_allclose(got, expected, rtol=1e-8)


def test_compare_models_bao(x64):
    """LCDM vs wzCDM on DESI BAO reproduces the published chi2_min
    values (bao/desi.py docstring: 10.27 / 8.44 at the medians) and the
    docstring's Delta-chi2 ordering."""
    rows = compare_models("bao.desi", ["lcdm", "wzcdm"])
    by = {r["model"]: r for r in rows}
    assert by["lcdm"]["chi2_min"] == pytest.approx(10.27, abs=0.02)
    assert by["wzcdm"]["chi2_min"] == pytest.approx(8.43, abs=0.03)
    assert by["wzcdm"]["dchi2"] == pytest.approx(-1.84, abs=0.05)
    assert by["lcdm"]["k"] == 2 and by["wzcdm"]["k"] == 3
    assert by["wzcdm"]["aic"] == pytest.approx(8.43 + 6, abs=0.05)
    assert np.isfinite(by["wzcdm"]["dlog_evidence"])
