import numpy as np
import jax
import jax.numpy as jnp
import pytest

from cosmax.samplers import EnsembleSampler, stretch_only, default_moves
from cosmax.samplers.ensemble import uniform_init, MoveSpec
from cosmax.samplers.diagnostics import (
    autocorr_time,
    gelman_rubin,
    percentile_summary,
    effective_samples,
)


COV = np.array([[1.0, 0.6], [0.6, 2.0]])
ICOV = np.linalg.inv(COV)
MU = np.array([1.5, -0.5])


def gauss_lp(x):
    d = x - jnp.asarray(MU)
    return -0.5 * d @ jnp.asarray(ICOV) @ d


def _run(moves, n_steps=2500, n_walkers=64, seed=0):
    s = EnsembleSampler(gauss_lp, n_walkers, 2, moves=moves)
    init = jnp.asarray(MU) + 0.5 * jax.random.normal(
        jax.random.PRNGKey(seed + 1), (n_walkers, 2)
    )
    _, chain = s.run(jax.random.PRNGKey(seed), init, n_steps)
    return chain


@pytest.mark.parametrize(
    "moves",
    [stretch_only(), default_moves(), (MoveSpec("de", 1.0),), (MoveSpec("snooker", 1.0),)],
    ids=["stretch", "reference-mixture", "de", "snooker"],
)
def test_gaussian_recovery(moves):
    chain = _run(moves)
    flat = np.asarray(chain.flat(discard=500))
    np.testing.assert_allclose(flat.mean(axis=0), MU, atol=0.12)
    np.testing.assert_allclose(np.cov(flat.T), COV, atol=0.25)
    acc = float(chain.acceptance_fraction)
    assert 0.1 < acc < 0.9


def test_deterministic_given_key():
    c1 = _run(stretch_only(), n_steps=50)
    c2 = _run(stretch_only(), n_steps=50)
    np.testing.assert_array_equal(np.asarray(c1.samples), np.asarray(c2.samples))


def test_resume_from_state_continues():
    s = EnsembleSampler(gauss_lp, 32, 2, moves=stretch_only())
    init = jnp.zeros((32, 2))
    key = jax.random.PRNGKey(3)
    state_full, chain_full = s.run(key, init, 40)
    state_a, _ = s.run(key, init, 25)
    state_b, chain_b = s.run_from_state(state_a, 15)
    np.testing.assert_allclose(
        np.asarray(state_full.walkers), np.asarray(state_b.walkers), rtol=1e-6
    )


def test_uniform_init_in_bounds():
    bounds = np.array([(0.5, 0.8), (0.1, 0.7)])
    pos = np.asarray(uniform_init(jax.random.PRNGKey(0), bounds, 100))
    assert pos.shape == (100, 2)
    assert (pos >= bounds[:, 0]).all() and (pos <= bounds[:, 1]).all()


def test_odd_walkers_rejected():
    with pytest.raises(ValueError):
        EnsembleSampler(gauss_lp, 33, 2)


def test_diagnostics_on_iid():
    rng = np.random.default_rng(0)
    x = rng.normal(size=(500, 8, 3))
    taus = autocorr_time(x)
    assert np.all(taus < 2.0)
    r = gelman_rubin(x)
    np.testing.assert_allclose(r, 1.0, atol=0.05)
    ess = effective_samples(x, taus)
    assert ess > 1000


def test_percentile_summary_named():
    x = np.random.default_rng(1).normal(loc=[2.0, -1.0], scale=[1.0, 0.5], size=(20000, 2))
    s = percentile_summary(x, ["a", "b"])
    assert s["a"][0] == pytest.approx(2.0, abs=0.05)
    assert s["b"][1] == pytest.approx(0.5, abs=0.03)  # +1 sigma


def test_bao_end_to_end_posterior():
    """Short DESI BAO LCDM fit reproduces the published posterior
    (bao/desi.py docstring: h = 0.690 +- 0.005, Om = 0.298 +0.009-0.008)."""
    from cosmax.data import load_bao
    from cosmax.likelihoods import ParamSpec, make_log_prob
    from cosmax.likelihoods.bao import build_bao_term, rd_fixed

    ds = load_bao("desi_dr2")
    spec = ParamSpec(("h", "Om"), np.array([(0.5, 0.8), (0.1, 0.7)]))
    term = build_bao_term(ds, "lcdm", rd_fixed(147.09), grid=("gl", 32))
    log_prob = make_log_prob(spec, [term], lambda p: {**p, "H0": 100 * p["h"]})
    s = EnsembleSampler(log_prob, 64, 2, moves=stretch_only())
    init = uniform_init(jax.random.PRNGKey(7), spec.bounds, 64)
    _, chain = s.run(jax.random.PRNGKey(42), init, 900)
    summ = percentile_summary(np.asarray(chain.flat(discard=300)), spec.names)
    h_med, h_plus, h_minus = summ["h"]
    om_med, om_plus, om_minus = summ["Om"]
    assert h_med == pytest.approx(0.690, abs=0.004)
    assert om_med == pytest.approx(0.298, abs=0.006)
    assert h_plus == pytest.approx(0.005, abs=0.002)
    assert om_plus == pytest.approx(0.009, abs=0.004)


def test_kde_only_gaussian_recovery():
    """The KDE move alone must satisfy detailed balance (its q(old)/q(new)
    MH correction is the delicate part) — recover the target Gaussian."""
    chain = _run((MoveSpec("kde", 1.0),), n_steps=1500)
    flat = np.asarray(chain.flat(discard=400))
    np.testing.assert_allclose(flat.mean(axis=0), MU, atol=0.12)
    np.testing.assert_allclose(np.cov(flat.T), COV, atol=0.3)
    acc = float(chain.acceptance_fraction)
    assert 0.1 < acc < 0.95


def test_kde_fallback_above_65536_walkers():
    """Above 65536 walkers the KDE move is swapped onto a stretch move
    (its O(W^2) density evaluation dominates whole-chain runtime)."""
    with pytest.warns(UserWarning, match="KDE move disabled"):
        s = EnsembleSampler(gauss_lp, 65538, 2, moves=default_moves())
    kinds = [m.kind for m in s.moves]
    assert "kde" not in kinds and "stretch" in kinds
    # mixture weights are preserved
    assert sum(m.weight for m in s.moves) == pytest.approx(1.0)
    # at or below the threshold the KDE move is kept
    s2 = EnsembleSampler(gauss_lp, 32768, 2, moves=default_moves())
    assert "kde" in [m.kind for m in s2.moves]
    # and the swapped sampler still runs
    init = jnp.zeros((65538, 2)) + jnp.asarray(MU)
    _, chain = s.run(jax.random.PRNGKey(0), init, 2)
    assert np.isfinite(np.asarray(chain.log_probs)).all()


def test_thinned_run_matches_unthinned_slice():
    """thin=k inside the scan must reproduce samples[::k] of the
    unthinned run and the identical final state (same step sequence)."""
    s = EnsembleSampler(gauss_lp, 32, 2, moves=default_moves())
    init = jnp.zeros((32, 2))
    key = jax.random.PRNGKey(21)
    state_full, full = s.run(key, init, 23)
    for thin in (4, 5, 25):
        state_t, thinned = s.run(key, init, 23, thin=thin)
        np.testing.assert_array_equal(
            np.asarray(thinned.samples), np.asarray(full.samples)[::thin]
        )
        np.testing.assert_array_equal(
            np.asarray(thinned.log_probs), np.asarray(full.log_probs)[::thin]
        )
        np.testing.assert_array_equal(
            np.asarray(state_t.walkers), np.asarray(state_full.walkers)
        )


def test_x64_mode_is_float64_end_to_end(x64):
    """Under x64 parity mode the walkers, proposals and chain are f64
    throughout — uniform_init must not quantize to f32 (VERDICT r1)."""
    bounds = np.array([(0.5, 0.8), (0.1, 0.7)])
    init = uniform_init(jax.random.PRNGKey(0), bounds, 32)
    assert init.dtype == jnp.float64
    s = EnsembleSampler(gauss_lp, 32, 2, moves=default_moves())
    state, chain = s.run(jax.random.PRNGKey(1), init, 5)
    assert chain.samples.dtype == jnp.float64
    assert state.walkers.dtype == jnp.float64
    assert chain.log_probs.dtype == jnp.float64


def test_zero_steps_any_thin():
    """n_steps=0 returns an empty chain for every thin (the thinned
    path used to crash on Chain(*None))."""
    s = EnsembleSampler(gauss_lp, 32, 2, moves=stretch_only())
    for thin in (1, 2, 5):
        state, chain = s.run(jax.random.PRNGKey(0), jnp.zeros((32, 2)), 0,
                             thin=thin)
        assert chain.samples.shape == (0, 32, 2)
        assert int(state.step) == 0
