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


def test_blobs_reference_shaped_script(tmp_path):
    """VERDICT r2 item 10: a reference-shaped script using emcee blobs
    + a persistent backend runs unmodified after np. -> jnp. The blob
    is the per-probe chi2, the reference's usual diagnostic."""
    from cosmax.compat import NpzBackend

    nwalkers, ndim = 32, 2
    icov = jnp.asarray(np.linalg.inv(np.array([[1.0, 0.3], [0.3, 0.5]])))

    def log_prob(theta):  # emcee-style: (logp, blob)
        d = theta - jnp.asarray(MU)
        chi2 = d @ icov @ d
        return -0.5 * chi2, chi2

    backend = NpzBackend(tmp_path / "chain.npz")
    sampler = EnsembleSampler(
        nwalkers, ndim, log_prob, seed=3, backend=backend
    )
    rng = np.random.default_rng(1)
    p0 = MU + 0.2 * rng.standard_normal((nwalkers, ndim))
    sampler.run_mcmc(p0, 50)

    blobs = sampler.get_blobs()
    assert blobs.shape == (50, nwalkers)
    # blob == -2 logp at the same positions (definition of the blob)
    lps = sampler.get_log_prob()
    np.testing.assert_allclose(blobs, -2.0 * lps, rtol=1e-5)
    flat = sampler.get_blobs(discard=10, flat=True)
    assert flat.shape == (40 * nwalkers,)
    # backend persisted the run
    assert backend.iteration == 50
    assert backend.get_chain().shape == (50, nwalkers, ndim)


def test_backend_resume_after_crash(tmp_path):
    from cosmax.compat import NpzBackend

    nwalkers, ndim = 32, 2
    path = tmp_path / "c.npz"
    rng = np.random.default_rng(2)
    p0 = MU + 0.2 * rng.standard_normal((nwalkers, ndim))

    # uninterrupted run for comparison
    ref = EnsembleSampler(nwalkers, ndim, lp, seed=5)
    ref.run_mcmc(p0, 30)
    ref.run_mcmc(None, 20)
    full = ref.get_chain()

    s1 = EnsembleSampler(nwalkers, ndim, lp, seed=5, backend=NpzBackend(path))
    s1.run_mcmc(p0, 30)
    del s1  # "crash"

    s2 = EnsembleSampler(nwalkers, ndim, lp, seed=5, backend=NpzBackend(path))
    s2.run_mcmc(None, 20)  # resumes: 30 already recorded
    got = s2.get_chain()
    assert got.shape == (50, nwalkers, ndim)
    np.testing.assert_array_equal(got, full)
    assert NpzBackend(path).iteration == 50
    np.testing.assert_array_equal(
        NpzBackend(path).get_last_sample(), got[-1]
    )


def test_backend_refuses_silent_overwrite(tmp_path):
    from cosmax.compat import NpzBackend

    path = tmp_path / "c.npz"
    p0 = MU + 0.1 * np.random.default_rng(3).standard_normal((16, 2))
    s1 = EnsembleSampler(16, 2, lp, seed=7, backend=NpzBackend(path))
    s1.run_mcmc(p0, 10)
    s2 = EnsembleSampler(16, 2, lp, seed=7, backend=NpzBackend(path))
    with pytest.raises(ValueError, match="reset"):
        s2.run_mcmc(p0, 10)
    # shape mismatch is refused at construction
    with pytest.raises(ValueError, match="backend holds"):
        EnsembleSampler(8, 2, lp, backend=NpzBackend(path))
    # after reset a fresh run is allowed
    b = NpzBackend(path)
    b.reset(16, 2)
    assert not b.initialized
    s3 = EnsembleSampler(16, 2, lp, seed=7, backend=b)
    s3.run_mcmc(p0, 10)
    assert b.iteration == 10


def test_get_blobs_none_without_blobs():
    s = EnsembleSampler(16, 2, lp, seed=0)
    p0 = MU + 0.1 * np.random.default_rng(4).standard_normal((16, 2))
    s.run_mcmc(p0, 5)
    assert s.get_blobs() is None


def test_get_blobs_heterogeneous_shapes():
    # emcee supports blobs of differing shapes (object cells); a
    # (logp, scalar, vector) signature must not crash get_blobs.
    icov = jnp.asarray(np.linalg.inv(np.array([[1.0, 0.3], [0.3, 0.5]])))

    def log_prob(theta):
        d = theta - jnp.asarray(MU)
        chi2 = d @ icov @ d
        return -0.5 * chi2, chi2, d  # scalar + length-2 vector

    sampler = EnsembleSampler(8, 2, log_prob, seed=0)
    p0 = MU + 0.1 * np.random.default_rng(0).standard_normal((8, 2))
    sampler.run_mcmc(p0, 5)
    blobs = sampler.get_blobs()
    assert blobs.shape == (5, 8) and blobs.dtype == object
    chi2_cell, d_cell = blobs[0, 0]
    assert np.shape(chi2_cell) == () and np.shape(d_cell) == (2,)
    flat = sampler.get_blobs(flat=True)
    assert flat.shape == (40,)


def test_get_blobs_homogeneous_multi():
    # two same-shaped blobs keep emcee's stacked [steps, walkers, 2]
    icov = jnp.asarray(np.linalg.inv(np.array([[1.0, 0.3], [0.3, 0.5]])))

    def log_prob(theta):
        d = theta - jnp.asarray(MU)
        chi2 = d @ icov @ d
        return -0.5 * chi2, chi2, 2.0 * chi2

    sampler = EnsembleSampler(8, 2, log_prob, seed=0)
    p0 = MU + 0.1 * np.random.default_rng(0).standard_normal((8, 2))
    sampler.run_mcmc(p0, 5)
    blobs = sampler.get_blobs()
    assert blobs.shape == (5, 8, 2)
    np.testing.assert_allclose(blobs[..., 1], 2.0 * blobs[..., 0], rtol=1e-6)
