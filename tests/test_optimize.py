import numpy as np
import jax.numpy as jnp
import pytest

from cosmax.samplers.optimize import minimize_chi2, adam_minimize, best_fit
from cosmax.configs import get_preset


def test_minimize_quadratic():
    a = jnp.asarray(np.diag([1.0, 10.0, 100.0]))
    target = jnp.asarray([1.0, -2.0, 0.5])
    f = lambda x: (x - target) @ a @ (x - target)
    x, fval, info = minimize_chi2(f, np.zeros(3))
    np.testing.assert_allclose(np.asarray(x), np.asarray(target), atol=1e-6)
    assert fval < 1e-10


def test_minimize_rosenbrock():
    f = lambda x: (1 - x[0]) ** 2 + 100.0 * (x[1] - x[0] ** 2) ** 2
    x, fval, info = minimize_chi2(f, np.array([-1.0, 1.0]), iters=200)
    np.testing.assert_allclose(np.asarray(x), [1.0, 1.0], atol=1e-4)


def test_adam_minimize():
    f = lambda x: jnp.sum((x - 3.0) ** 2)
    x, losses = adam_minimize(f, np.zeros(2), iters=2000, lr=0.05)
    np.testing.assert_allclose(np.asarray(x), [3.0, 3.0], atol=1e-2)
    assert losses[-1] < losses[0]


def test_best_fit_bao_lcdm(x64):
    """Minimum chi^2 of the DESI BAO LCDM fit sits at the published
    posterior medians (bao/desi.py docstring)."""
    fit = get_preset("bao.desi", "lcdm")
    params, chi2, info = best_fit(fit)
    assert params["h"] == pytest.approx(0.690, abs=0.002)
    assert params["Om"] == pytest.approx(0.298, abs=0.003)
    assert chi2 == pytest.approx(10.27, abs=0.01)


def test_laplace_gaussian_exact():
    """Inverse Hessian of an exact Gaussian log-density recovers its
    covariance."""
    from cosmax.samplers.optimize import laplace

    cov_true = np.array([[2.0, 0.6], [0.6, 0.5]])
    prec = jnp.asarray(np.linalg.inv(cov_true))
    lp = lambda x: -0.5 * x @ prec @ x
    cov, sig, corr = laplace(lp, np.zeros(2))
    np.testing.assert_allclose(cov, cov_true, rtol=1e-6)
    np.testing.assert_allclose(
        corr[0, 1], cov_true[0, 1] / np.sqrt(cov_true[0, 0] * cov_true[1, 1]),
        rtol=1e-6,
    )


def test_laplace_fit_bao_lcdm(x64):
    """MAP + Laplace errors on DESI BAO LCDM: sigma agrees with the
    published MCMC 1-sigma widths (bao/desi.py:202-215, a nearly
    Gaussian 2-parameter posterior) and the (h, Om) anticorrelation of
    the published correlation matrix is recovered."""
    from cosmax.samplers.optimize import laplace_fit

    fit = get_preset("bao.desi", "lcdm")
    params, chi2, corr = laplace_fit(fit)
    h_map, h_sig = params["h"]
    om_map, om_sig = params["Om"]
    assert h_map == pytest.approx(0.690, abs=0.002)
    assert h_sig == pytest.approx(0.005, rel=0.25)
    assert om_sig == pytest.approx(0.0085, rel=0.25)
    assert corr[0, 1] < -0.2  # h and Om anticorrelate along the ridge


def test_laplace_fit_with_norm_terms(x64):
    """laplace_fit must optimise the full posterior: the CC f_cc
    rescaling has a -N ln f normalisation, so the raw chi^2 alone is
    minimised on the f_cc bound (indefinite Hessian there). At the true
    mode the Laplace sigmas track the published MCMC widths
    (cosmic_chronometers/cc.py:171-178: H0 3.8, Om 0.036, f 0.09)."""
    from cosmax.samplers.optimize import laplace_fit

    fit = get_preset("cc.cc", "lcdm")
    params, chi2_at_map, corr = laplace_fit(fit)
    h0_map, h0_sig = params["H0"]
    f_map, f_sig = params["f_cc"]
    assert h0_map == pytest.approx(67.1, abs=1.0)
    assert f_map == pytest.approx(0.67, abs=0.04)
    assert h0_sig == pytest.approx(3.8, rel=0.2)
    assert f_sig == pytest.approx(0.09, rel=0.2)
    assert np.isfinite(chi2_at_map)
