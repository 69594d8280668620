"""The emcee-compatible facade (cosmax.compat) mirrors the reference's
five-call emcee surface (bao/desi.py:119-141)."""

import numpy as np
import jax.numpy as jnp
import pytest

from cosmax.compat import AutocorrError, EnsembleSampler

MU = np.array([1.0, -2.0])


def lp(x):
    d = x - jnp.asarray(MU)
    return -0.5 * jnp.sum(d * d)


def test_reference_style_workflow():
    nwalkers, ndim, nsteps, burn_in = 64, 2, 800, 200
    rng = np.random.default_rng(0)
    initial = MU + 0.5 * rng.standard_normal((nwalkers, ndim))

    sampler = EnsembleSampler(
        nwalkers, ndim, lp,
        moves=[("kde", 0.30), ("de", 0.56), ("snooker", 0.14)],
        seed=1,
    )
    sampler.run_mcmc(initial, nsteps, progress=True)

    chain = sampler.get_chain(discard=burn_in)
    assert chain.shape == (nsteps - burn_in, nwalkers, ndim)
    flat = sampler.get_chain(discard=burn_in, flat=True)
    assert flat.shape == ((nsteps - burn_in) * nwalkers, ndim)
    np.testing.assert_allclose(flat.mean(axis=0), MU, atol=0.1)

    tau = sampler.get_autocorr_time(discard=burn_in)
    assert tau.shape == (ndim,) and (tau > 0).all()

    acc = sampler.acceptance_fraction
    assert acc.shape == (nwalkers,)
    assert 0.05 < acc.mean() < 0.95

    lps = sampler.get_log_prob(discard=burn_in)
    assert lps.shape == (nsteps - burn_in, nwalkers)
    assert np.isfinite(lps).all()


def test_second_run_mcmc_continues():
    sampler = EnsembleSampler(32, 2, lp, seed=5)
    init = np.zeros((32, 2))
    sampler.run_mcmc(init, 30)
    sampler.run_mcmc(None, 20)
    assert sampler.get_chain().shape == (50, 32, 2)

    fresh = EnsembleSampler(32, 2, lp, seed=5)
    fresh.run_mcmc(init, 50)
    np.testing.assert_array_equal(sampler.get_chain(), fresh.get_chain())


def test_autocorr_error_on_short_chain():
    sampler = EnsembleSampler(32, 2, lp, seed=2)
    sampler.run_mcmc(np.zeros((32, 2)) + MU, 40)
    with pytest.raises(AutocorrError) as exc:
        sampler.get_autocorr_time()
    assert hasattr(exc.value, "tau")


def test_reset():
    sampler = EnsembleSampler(32, 2, lp, seed=3)
    sampler.run_mcmc(np.zeros((32, 2)), 10)
    sampler.reset()
    with pytest.raises(RuntimeError):
        sampler.get_chain()


def test_emcee_burn_in_idiom():
    """emcee's canonical pattern: state = run_mcmc(p0, n); reset();
    run_mcmc(state, n) continues from the returned state."""
    sampler = EnsembleSampler(32, 2, lp, seed=7)
    init = np.zeros((32, 2)) + MU
    state = sampler.run_mcmc(init, 25)
    sampler.reset()
    sampler.run_mcmc(state, 15)
    assert sampler.get_chain().shape == (15, 32, 2)
    # identical to running 40 straight and keeping the last 15
    fresh = EnsembleSampler(32, 2, lp, seed=7)
    fresh.run_mcmc(init, 40)
    np.testing.assert_array_equal(
        sampler.get_chain(), fresh.get_chain(discard=25)
    )


def test_coords_restart_does_not_continue():
    """emcee restarts from explicitly passed coords; the old endpoint
    must not be silently reused, and the new run must not replay the
    first run's random stream."""
    s = EnsembleSampler(32, 2, lp, seed=11)
    s.run_mcmc(np.zeros((32, 2)), 10)
    first = s.get_chain().copy()
    p1 = np.zeros((32, 2)) + MU
    s.run_mcmc(p1, 10)
    second = s.get_chain()
    assert second.shape == (10, 32, 2)
    # restarted, not continued: chain was replaced and differs from a
    # continuation of the old state
    assert not np.array_equal(first, second)
    # different PRNG stream than the first start (keys are folded)
    s2 = EnsembleSampler(32, 2, lp, seed=11)
    s2.run_mcmc(p1, 10)
    assert not np.array_equal(second, s2.get_chain())


def test_none_before_any_run_raises():
    s = EnsembleSampler(32, 2, lp, seed=13)
    with pytest.raises(ValueError, match="initial_state=None"):
        s.run_mcmc(None, 5)
