"""Gradient-based HMC sampler (cosmax.samplers.hmc).

Calibration mirrors tests/test_exact_posterior.py: the bao.desi
posterior's marginals are known exactly by grid integration, so the
HMC chain is checked against mathematics, not against another sampler.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from cosmax.samplers.hmc import BoxTransform, HMCSampler
from cosmax.samplers.ensemble import uniform_init


def test_box_transform_roundtrip_and_jacobian():
    bounds = np.array([[0.5, 0.8], [-2.0, 0.0]])
    tr = BoxTransform.from_bounds(bounds, jnp.float32)
    x = jnp.array([0.63, -1.2])
    y = tr.to_y(x)
    assert np.allclose(np.asarray(tr.to_x(y)), np.asarray(x), atol=1e-6)
    # analytic log-Jacobian vs autodiff determinant
    jac = jax.jacobian(tr.to_x)(y)
    _, logdet = np.linalg.slogdet(np.asarray(jac))
    assert float(tr.log_jac(y)) == pytest.approx(logdet, abs=1e-5)


def test_hmc_gaussian_recovery():
    mean = jnp.array([0.3, -0.2, 1.0])
    cov = np.array(
        [[1.0, 0.6, 0.2], [0.6, 2.0, -0.3], [0.2, -0.3, 0.5]]
    )
    prec = jnp.asarray(np.linalg.inv(cov), dtype=jnp.float32)

    def lp(x):
        d = x - mean
        return -0.5 * d @ prec @ d

    bounds = np.array([[-8.0, 8.0]] * 3)
    s = HMCSampler(lp, bounds, n_chains=64, max_leapfrog=24)
    _, ch = s.run(jax.random.PRNGKey(0), 1000, n_warmup=600)
    flat = np.asarray(ch.flat())
    assert 0.6 < float(ch.acceptance_fraction) < 0.95
    assert int(np.asarray(ch.n_divergent)) == 0  # no divergences
    assert np.asarray(ch.divergent).shape == (1000, 64)
    assert np.asarray(ch.divergences_per_chain).tolist() == [0] * 64
    assert np.allclose(flat.mean(0), np.asarray(mean), atol=0.05)
    assert np.allclose(flat.var(0), np.diag(cov), rtol=0.08)
    r = np.corrcoef(flat[:, 0], flat[:, 1])[0, 1]
    assert r == pytest.approx(0.6 / np.sqrt(2.0), abs=0.05)
    # the adapted dense mass tracks the full posterior covariance
    assert s.inv_mass.shape == (3, 3)
    assert np.allclose(
        s.inv_mass / s.inv_mass[2, 2], cov / cov[2, 2], atol=0.25
    )


def test_hmc_matches_exact_grid_posterior(x64):
    from tests.test_exact_posterior import _grid_marginals, _setup

    spec, log_prob = _setup()
    (h_lo, h_med, h_hi), (o_lo, o_med, o_hi) = _grid_marginals(log_prob, spec)
    s = HMCSampler(log_prob, spec.bounds, n_chains=128, max_leapfrog=24)
    _, chain = s.run(jax.random.PRNGKey(5), 800, n_warmup=500)
    flat = np.asarray(chain.flat())

    h_sig = 0.5 * (h_hi - h_lo)
    o_sig = 0.5 * (o_hi - o_lo)
    assert np.median(flat[:, 0]) == pytest.approx(h_med, abs=0.05 * h_sig)
    assert np.median(flat[:, 1]) == pytest.approx(o_med, abs=0.05 * o_sig)
    q = np.percentile(flat, [15.9, 84.1], axis=0)
    assert 0.5 * (q[1, 0] - q[0, 0]) == pytest.approx(h_sig, rel=0.06)
    assert 0.5 * (q[1, 1] - q[0, 1]) == pytest.approx(o_sig, rel=0.06)


def test_hmc_bit_reproducible():
    def lp(x):
        return -0.5 * jnp.sum(x**2)

    bounds = np.array([[-5.0, 5.0]] * 2)
    init = uniform_init(jax.random.PRNGKey(1), bounds, 16)
    s = HMCSampler(lp, bounds, n_chains=16, max_leapfrog=8)
    _, c1 = s.run(jax.random.PRNGKey(7), 50, n_warmup=50, initial=init)
    _, c2 = s.run(jax.random.PRNGKey(7), 50, n_warmup=50, initial=init)
    assert np.array_equal(np.asarray(c1.samples), np.asarray(c2.samples))
    _, c3 = s.run(jax.random.PRNGKey(8), 50, n_warmup=50, initial=init)
    assert not np.array_equal(np.asarray(c1.samples), np.asarray(c3.samples))


def test_hmc_efficiency_vs_ensemble(x64):
    """HMC draws are near-independent (tau ~ 1) on the bao.desi
    posterior — the reference's move mixture sits at tau ~ 4."""
    from tests.test_exact_posterior import _setup

    from cosmax.samplers.diagnostics import autocorr_time

    spec, log_prob = _setup()
    s = HMCSampler(log_prob, spec.bounds, n_chains=64, max_leapfrog=24)
    _, chain = s.run(jax.random.PRNGKey(2), 400, n_warmup=400)
    taus = autocorr_time(np.asarray(chain.samples))
    assert np.all(np.asarray(taus) < 2.0)


def test_hmc_rejects_ignored_fixed_params():
    """step_size/inv_mass with n_warmup > 0 would be silently
    overwritten by adaptation — must raise instead."""

    def lp(x):
        return -0.5 * jnp.sum(x**2)

    s = HMCSampler(lp, np.array([[-5.0, 5.0]] * 2), n_chains=4)
    with pytest.raises(ValueError, match="n_warmup=0"):
        s.run(jax.random.PRNGKey(0), 10, n_warmup=10, step_size=0.1)
    with pytest.raises(ValueError, match="n_warmup=0"):
        s.run(jax.random.PRNGKey(0), 10, n_warmup=10, inv_mass=np.eye(2))


def test_hmc_rejects_bad_init():
    def lp(x):
        return jnp.where(jnp.all(jnp.abs(x) < 1), 0.0, -jnp.inf)

    bounds = np.array([[-5.0, 5.0]] * 2)
    s = HMCSampler(lp, bounds, n_chains=4)
    bad = np.full((4, 2), 4.0)  # in bounds, zero likelihood
    with pytest.raises(ValueError, match="non-finite"):
        s.run(jax.random.PRNGKey(0), 10, n_warmup=10, initial=bad)


def test_hmc_rejuvenates_stuck_chains():
    """Chains far below the bulk's log-prob at the end of warmup are
    resampled from healthy chains (unit test of the rejuvenation step:
    real stuck chains need a pathological basin the toy targets
    self-heal out of)."""
    from cosmax.samplers.hmc import HMCState

    def lp(x):
        return -0.5 * jnp.sum(x**2)

    s = HMCSampler(lp, np.array([[-5.0, 5.0]] * 2), 32)
    y = jnp.asarray(
        np.concatenate([np.zeros((29, 2)), np.full((3, 2), 3.0)])
    )
    state = s.init_state(jax.random.PRNGKey(0), y)
    # push the 3 outliers far below the bulk
    logp = state.logp.at[-3:].add(-500.0)
    state = HMCState(state.y, logp, state.grad, state.key, state.step)
    new, n, _ = s._rejuvenate(state)
    assert int(n) == 3
    # outliers replaced by healthy positions (all healthy are at 0)
    assert np.allclose(np.asarray(new.y[-3:]), 0.0)
    assert np.allclose(np.asarray(new.logp[-3:]), np.asarray(logp[:29]).max())
    # healthy chains untouched
    assert np.array_equal(np.asarray(new.y[:29]), np.asarray(state.y[:29]))


def test_map_jitter_init_lands_on_correlated_shell():
    """Init positions must use the full Laplace covariance: on a thin
    correlated posterior, axis-aligned marginal-sigma jitter lands the
    cloud far off the shell (measured -300 logp on the real joints)."""
    from cosmax.likelihoods import ParamSpec
    from cosmax.samplers.optimize import map_jitter_init

    class FitStub:
        pass

    cov = np.array([[1.0, 0.999], [0.999, 1.0]])  # thin ellipse
    prec = jnp.asarray(np.linalg.inv(cov), dtype=jnp.float32)

    def lp(x):
        return -0.5 * x @ prec @ x

    fit = FitStub()
    fit.spec = ParamSpec(("a", "b"), np.array([[-5.0, 5.0], [-5.0, 5.0]]))
    fit.log_prob = lambda: lp
    init = map_jitter_init(fit, jax.random.PRNGKey(0), 256)
    l = np.asarray(jax.vmap(lp)(init))
    # mean logp cost of a covariance-matched jitter is ~ -D/2 * scale^2
    assert np.median(l) > -4.0
    assert np.asarray(init).shape == (256, 2)
    # within bounds
    assert (np.abs(np.asarray(init)) < 5.0).all()
