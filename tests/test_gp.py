"""GP reconstruction vs the reference's published hyperparameters
(cosmic_chronometers/cc_gp.py:63-64: lengthscale ~ 2.366,
noise_scale ~ 0.699^2 ~ 0.489)."""

import numpy as np
import pytest

from cosmax.data import load_cc
from cosmax.gp import fit_gp, reconstruct_hz, ExactGP, GPParams


@pytest.fixture(scope="module")
def cc():
    return load_cc()


@pytest.fixture(scope="module")
def fitted(cc):
    return reconstruct_hz(cc.z, cc.values, cc.cov, iters=3000)


def test_hyperparameters_match_reference(fitted):
    info = fitted["info"]
    assert info["lengthscale"] == pytest.approx(2.366, abs=0.05)
    assert info["noise_scale"] == pytest.approx(0.489, abs=0.03)


def test_h0_reconstruction(fitted):
    h0, sigma = fitted["h_mean"][0], fitted["h_std"][0]
    assert h0 == pytest.approx(67.5, abs=2.0)
    assert 2.0 < sigma < 8.0


def test_qz_negative_today_positive_early(fitted):
    """Deceleration parameter: accelerating today (q<0), decelerating
    at high z (q>0)."""
    q = fitted["q"]
    z = fitted["z_grid"]
    assert q[0] < 0
    assert q[z > 1.5][-1] > 0


def test_mll_matches_direct_gaussian(x64, cc):
    """The exact MLL equals the straightforward multivariate-normal
    log density."""
    gp, params, info = fit_gp(cc.z, cc.values, cc.cov, iters=1)
    got = float(gp.mll(params))
    c = np.asarray(gp.train_cov(params))
    delta = np.asarray(gp.y) - float(params.mean_const)
    n = len(delta)
    want = -0.5 * (
        delta @ np.linalg.solve(c, delta)
        + np.linalg.slogdet(c)[1]
        + n * np.log(2 * np.pi)
    )
    assert got == pytest.approx(want, rel=1e-8)


def test_predict_interpolates_data(cc):
    """With tiny noise the posterior mean at training points tracks the
    (standardised) data within the observational errors."""
    gp, params, info = fit_gp(cc.z, cc.values, cc.cov, iters=2000)
    mean, cov = gp.predict(params, np.asarray(cc.z))
    resid = (np.asarray(mean) * info["y_std"] + info["y_mean"]) - cc.values
    assert np.abs(resid).max() < 3 * np.sqrt(np.diag(cc.cov)).max()


def test_predictive_covariance_returned(fitted):
    """h_cov feeds the cc_gp covariance heatmap (reference
    cc_gp.py:130-134): PSD, diag consistent with h_std."""
    cov = fitted["h_cov"]
    n = fitted["z_grid"].size
    assert cov.shape == (n, n)
    np.testing.assert_allclose(
        np.sqrt(np.clip(np.diag(cov), 0, None)), fitted["h_std"],
        rtol=1e-6, atol=1e-9,
    )
    evals = np.linalg.eigvalsh(0.5 * (cov + cov.T))
    assert evals.min() > -1e-8 * evals.max()

def test_condition_on_equals_rebuilt_gp(x64, cc):
    """Fantasy conditioning (gp_lib.py:155-179 analogue): a GP
    conditioned on extra observations gives exactly the predictive of
    an ExactGP built on the concatenated dataset, for both 1-D variance
    and full-matrix noise inputs."""
    gp, params, info = fit_gp(cc.z, cc.values, cc.cov, iters=200)
    x_new = np.array([0.35, 1.1])
    y_new = np.array([0.2, -0.4])  # standardised units
    var_new = np.array([0.05, 0.08])

    fantasy = gp.condition_on(x_new, y_new, var_new)
    direct = ExactGP(
        np.concatenate([np.asarray(gp.x), x_new]),
        np.concatenate([np.asarray(gp.y), y_new]),
        np.block(
            [
                [np.asarray(gp.noise_cov), np.zeros((gp.n, 2))],
                [np.zeros((2, gp.n)), np.diag(var_new)],
            ]
        ),
        (gp.ls_lo, gp.ls_hi),
    )
    grid = np.linspace(0.0, 2.0, 17)
    m1, c1 = fantasy.predict(params, grid)
    m2, c2 = direct.predict(params, grid)
    np.testing.assert_allclose(np.asarray(m1), np.asarray(m2), rtol=1e-10)
    np.testing.assert_allclose(np.asarray(c1), np.asarray(c2), rtol=1e-8)

    # full-matrix noise path
    fantasy2 = gp.condition_on(x_new, y_new, np.diag(var_new))
    m3, _ = fantasy2.predict(params, grid)
    np.testing.assert_allclose(np.asarray(m3), np.asarray(m2), rtol=1e-10)


def test_condition_on_pins_posterior_at_new_point(x64, cc):
    """A near-noiseless fantasy observation pins the posterior mean and
    collapses the variance at that point."""
    gp, params, info = fit_gp(cc.z, cc.values, cc.cov, iters=200)
    x0, y0 = 0.9, 1.3  # standardised units
    fantasy = gp.condition_on([x0], [y0], [1e-8])
    mean, cov = fantasy.predict(params, np.array([x0]), test_noise=0.0)
    base_mean, base_cov = gp.predict(params, np.array([x0]), test_noise=0.0)
    assert float(mean[0]) == pytest.approx(y0, abs=1e-3)
    assert float(cov[0, 0]) < 1e-4 * float(base_cov[0, 0])


def test_condition_on_validates_shapes(cc):
    gp, params, info = fit_gp(cc.z, cc.values, cc.cov, iters=1)
    with pytest.raises(ValueError):
        gp.condition_on([0.1, 0.2], [1.0], [0.1, 0.1])
    with pytest.raises(ValueError):
        gp.condition_on([0.1], [1.0], np.eye(3))
