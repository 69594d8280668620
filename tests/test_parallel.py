"""Multi-device sharding tests on the 8-device virtual CPU mesh
(conftest sets --xla_force_host_platform_device_count=8)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from cosmax.parallel import (
    make_mesh,
    shard_walkers,
    sharded_batched_log_prob,
    data_sharded_chi2,
)
from cosmax.samplers import EnsembleSampler, stretch_only


pytestmark = pytest.mark.skipif(
    jax.device_count() < 8, reason="needs 8 virtual devices"
)

ICOV = np.linalg.inv(np.array([[1.0, 0.6], [0.6, 2.0]]))


def lp(x):
    w = x @ jnp.asarray(ICOV)
    return -0.5 * jnp.sum(w * x)


def test_mesh_shapes():
    m = make_mesh()
    assert m.shape == {"w": 8, "d": 1}
    m2 = make_mesh(walkers=4, data=2)
    assert m2.shape == {"w": 4, "d": 2}
    with pytest.raises(ValueError):
        make_mesh(walkers=3, data=2)


def test_sharded_log_prob_matches_vmap():
    mesh = make_mesh(walkers=4, data=2)
    walkers = jax.random.normal(jax.random.PRNGKey(0), (64, 2))
    got = np.asarray(sharded_batched_log_prob(lp, mesh)(walkers))
    want = np.asarray(jax.vmap(lp)(walkers))
    np.testing.assert_allclose(got, want, rtol=2e-6)


def test_data_sharded_chi2_matches_dense():
    from cosmax.ops.linalg import whitening_operator, chi2_from_whitener

    rng = np.random.default_rng(0)
    n = 37  # deliberately not divisible by the d-axis size
    a = rng.normal(size=(n, n))
    cov = a @ a.T + n * np.eye(n)
    linv = whitening_operator(cov)
    delta = rng.normal(size=(16, n)).astype(np.float32)
    mesh = make_mesh(walkers=2, data=4)
    got = np.asarray(data_sharded_chi2(linv, mesh)(jnp.asarray(delta)))
    want = np.asarray(chi2_from_whitener(jnp.asarray(linv, dtype=jnp.float32), delta))
    np.testing.assert_allclose(got, want, rtol=5e-5)


def test_sharded_sampler_runs_and_mixes():
    """Full ensemble run with the walker axis sharded over 8 devices."""
    mesh = make_mesh()
    s = EnsembleSampler(
        lp, 64, 2, moves=stretch_only(),
        vmapped_log_prob=sharded_batched_log_prob(lp, mesh),
    )
    init = shard_walkers(
        mesh, jax.random.normal(jax.random.PRNGKey(1), (64, 2))
    )
    state, chain = s.run(jax.random.PRNGKey(0), init, 600)
    flat = np.asarray(chain.flat(discard=200))
    np.testing.assert_allclose(flat.mean(axis=0), [0, 0], atol=0.2)
    assert 0.1 < float(chain.acceptance_fraction) < 0.9


def test_sharded_run_equals_unsharded_same_key():
    """Sharding the walker axis must not change the chain: same key =>
    identical samples (per-walker op order is unchanged; the shard_map
    only partitions the vmap)."""
    mesh = make_mesh()
    n_walkers, n_steps = 32, 40
    init = jax.random.normal(jax.random.PRNGKey(1), (n_walkers, 2))
    key = jax.random.PRNGKey(7)
    s_plain = EnsembleSampler(lp, n_walkers, 2, moves=stretch_only())
    _, chain_plain = s_plain.run(key, init, n_steps)
    s_shard = EnsembleSampler(
        lp, n_walkers, 2, moves=stretch_only(),
        vmapped_log_prob=sharded_batched_log_prob(lp, mesh),
    )
    _, chain_shard = s_shard.run(key, shard_walkers(mesh, init), n_steps)
    np.testing.assert_allclose(
        np.asarray(chain_shard.samples), np.asarray(chain_plain.samples),
        rtol=1e-6, atol=1e-7,
    )
    np.testing.assert_array_equal(
        np.asarray(chain_shard.accepted), np.asarray(chain_plain.accepted)
    )


def test_sharded_checkpoint_resume_equals_straight():
    """save_state/load_state round-trips a sharded ChainState (host
    gather on save; resharding on resume is handled by shard_map)."""
    from cosmax.samplers.checkpoints import run_with_checkpoints

    import tempfile, os

    mesh = make_mesh(walkers=4, data=2)
    s = EnsembleSampler(
        lp, 32, 2, moves=stretch_only(),
        vmapped_log_prob=sharded_batched_log_prob(lp, mesh),
    )
    init = shard_walkers(mesh, jax.random.normal(jax.random.PRNGKey(2), (32, 2)))
    key = jax.random.PRNGKey(9)
    _, straight = s.run(key, init, 32)
    with tempfile.TemporaryDirectory() as tmp:
        path = os.path.join(tmp, "c.npz")
        run_with_checkpoints(s, key, init, 16, path, every=16)
        _, part2, start = run_with_checkpoints(s, key, init, 32, path, every=16)
    assert start == 16
    np.testing.assert_allclose(
        np.asarray(part2.samples), np.asarray(straight.samples)[16:],
        rtol=1e-6, atol=1e-7,
    )


def test_multislice_mesh_runs_and_matches():
    """2 slices x 2 walker-chips x 2 data-chips ('s','w','d'): the
    walker axis shards over (slice, walker) — cross-slice traffic is
    only the tiny [W, D] gather — and the chi^2 psum stays on 'd'."""
    from cosmax.parallel import make_multislice_mesh
    from cosmax.ops.linalg import whitening_operator, chi2_from_whitener

    mesh = make_multislice_mesh(2, walkers=2, data=2)
    assert mesh.shape == {"s": 2, "w": 2, "d": 2}

    walkers = jax.random.normal(jax.random.PRNGKey(3), (32, 2))
    got = np.asarray(sharded_batched_log_prob(lp, mesh)(walkers))
    np.testing.assert_allclose(got, np.asarray(jax.vmap(lp)(walkers)), rtol=2e-6)

    rng = np.random.default_rng(1)
    n = 23
    a = rng.normal(size=(n, n))
    linv = whitening_operator(a @ a.T + n * np.eye(n))
    delta = rng.normal(size=(8, n)).astype(np.float32)
    got = np.asarray(data_sharded_chi2(linv, mesh)(jnp.asarray(delta)))
    want = np.asarray(chi2_from_whitener(jnp.asarray(linv, dtype=jnp.float32), delta))
    np.testing.assert_allclose(got, want, rtol=5e-5)

    # full sharded ensemble run on the 3-axis mesh
    s = EnsembleSampler(
        lp, 32, 2, moves=stretch_only(),
        vmapped_log_prob=sharded_batched_log_prob(lp, mesh),
    )
    init = shard_walkers(mesh, jax.random.normal(jax.random.PRNGKey(5), (32, 2)))
    _, chain = s.run(jax.random.PRNGKey(4), init, 50)
    assert np.isfinite(np.asarray(chain.log_probs)).all()


def test_sharded_hmc_fixed_params_equals_unsharded():
    """HMC sampling phase has no cross-chain reductions: sharding the
    chain axis must reproduce the unsharded chains bitwise."""
    from jax.sharding import NamedSharding, PartitionSpec as P

    from cosmax.samplers import HMCSampler

    bounds = np.array([[-6.0, 6.0]] * 2)
    init = np.asarray(
        jax.random.normal(jax.random.PRNGKey(1), (32, 2), dtype=jnp.float32)
    )
    key = jax.random.PRNGKey(9)
    s_plain = HMCSampler(lp, bounds, 32, max_leapfrog=8)
    _, c_plain = s_plain.run(
        key, 40, n_warmup=0, initial=init, step_size=0.3
    )
    mesh = make_mesh()
    sharding = NamedSharding(mesh, P("w", None))
    s_shard = HMCSampler(lp, bounds, 32, max_leapfrog=8)
    _, c_shard = s_shard.run(
        key, 40, n_warmup=0,
        initial=jax.device_put(jnp.asarray(init), sharding),
        step_size=0.3,
    )
    np.testing.assert_array_equal(
        np.asarray(c_shard.samples), np.asarray(c_plain.samples)
    )
    np.testing.assert_array_equal(
        np.asarray(c_shard.accepted), np.asarray(c_plain.accepted)
    )


def test_sharded_hmc_full_run_recovers_gaussian():
    """Adaptive warmup pools accept/variance statistics across chains
    (reduction order changes under sharding -> not bitwise), but a
    sharded full run must still recover the target."""
    from jax.sharding import NamedSharding, PartitionSpec as P

    from cosmax.samplers import HMCSampler

    bounds = np.array([[-6.0, 6.0]] * 2)
    mesh = make_mesh()
    sharding = NamedSharding(mesh, P("w", None))
    init = jax.device_put(
        jax.random.normal(jax.random.PRNGKey(1), (64, 2), dtype=jnp.float32),
        sharding,
    )
    s = HMCSampler(lp, bounds, 64, max_leapfrog=16)
    _, chain = s.run(jax.random.PRNGKey(2), 500, n_warmup=400, initial=init)
    flat = np.asarray(chain.flat())
    cov = np.linalg.inv(ICOV)
    np.testing.assert_allclose(flat.mean(0), [0.0, 0.0], atol=0.15)
    np.testing.assert_allclose(flat.var(0), np.diag(cov), rtol=0.15)
