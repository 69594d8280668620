"""File round-trip and resume-equivalence tests for sampler
checkpointing (cosmax/samplers/checkpoints.py)."""

import numpy as np
import jax
import jax.numpy as jnp

from cosmax.samplers import EnsembleSampler, stretch_only
from cosmax.samplers.checkpoints import load_state, run_with_checkpoints, save_state

MU = np.array([1.5, -0.5])
ICOV = np.linalg.inv(np.array([[1.0, 0.6], [0.6, 2.0]]))


def gauss_lp(x):
    d = x - jnp.asarray(MU)
    return -0.5 * d @ jnp.asarray(ICOV) @ d


def _sampler(n_walkers=32):
    return EnsembleSampler(gauss_lp, n_walkers, 2, moves=stretch_only())


def test_save_load_state_roundtrip(tmp_path):
    s = _sampler()
    key = jax.random.PRNGKey(5)
    state, _ = s.run(key, jnp.zeros((32, 2)), 10)
    path = str(tmp_path / "ckpt.npz")
    save_state(path, state, metadata={"n_steps": 10})
    loaded = load_state(path)
    np.testing.assert_array_equal(np.asarray(loaded.walkers), np.asarray(state.walkers))
    np.testing.assert_array_equal(
        np.asarray(loaded.log_probs), np.asarray(state.log_probs)
    )
    np.testing.assert_array_equal(
        np.asarray(jax.random.key_data(loaded.key)),
        np.asarray(jax.random.key_data(state.key)),
    )
    assert int(loaded.step) == 10
    # continuing from the loaded state is bit-identical to continuing
    # from the in-memory state (the sampler is pure in its state)
    st1, c1 = s.run_from_state(state, 7)
    st2, c2 = s.run_from_state(loaded, 7)
    np.testing.assert_array_equal(np.asarray(c1.samples), np.asarray(c2.samples))


def test_fresh_checkpointed_run_equals_straight_run(tmp_path):
    s = _sampler()
    key = jax.random.PRNGKey(11)
    init = jnp.zeros((32, 2))
    _, straight = s.run(key, init, 40)
    state, merged, start = run_with_checkpoints(
        s, key, init, 40, str(tmp_path / "c.npz"), every=16
    )
    assert start == 0
    # segments 16+16+8: the final segment runs the exact remainder, so
    # the saved state is at step 40 and the merged chain matches the
    # uninterrupted run sample-for-sample with nothing overshot
    assert int(state.step) == 40
    np.testing.assert_array_equal(
        np.asarray(merged.samples), np.asarray(straight.samples)
    )


def test_no_steps_lost_across_resume_with_remainder(tmp_path):
    """Segments must never overshoot n_steps: steps executed past the
    trim point would be saved into the checkpoint yet appear in no
    returned chain, silently vanishing across a resume boundary."""
    s = _sampler()
    key = jax.random.PRNGKey(23)
    init = jnp.zeros((32, 2))
    path = str(tmp_path / "c.npz")
    _, part1, _ = run_with_checkpoints(s, key, init, 40, path, every=16)
    state, part2, start = run_with_checkpoints(s, key, init, 60, path, every=16)
    assert start == 40 and int(state.step) == 60
    _, straight = s.run(key, init, 60)
    both = np.concatenate([np.asarray(part1.samples), np.asarray(part2.samples)])
    np.testing.assert_array_equal(both, np.asarray(straight.samples))


def test_resume_continues_where_crash_left_off(tmp_path):
    s = _sampler()
    key = jax.random.PRNGKey(13)
    init = jnp.zeros((32, 2))
    path = str(tmp_path / "c.npz")
    # "crash" after the first 32 of 64 steps
    _, part1, start1 = run_with_checkpoints(s, key, init, 32, path, every=16)
    assert start1 == 0
    # resume: a fresh process would pass the same key/init; they are
    # ignored because the checkpoint exists
    state, part2, start2 = run_with_checkpoints(s, key, init, 64, path, every=16)
    assert start2 == 32
    _, straight = s.run(key, init, 64)
    np.testing.assert_array_equal(
        np.asarray(part2.samples), np.asarray(straight.samples)[32:]
    )
    assert int(state.step) == 64


def test_checkpointed_thinning_keeps_global_stride(tmp_path):
    s = _sampler()
    key = jax.random.PRNGKey(17)
    init = jnp.zeros((32, 2))
    _, straight = s.run(key, init, 24, thin=4)
    # every=10 is rounded up to 12 (a multiple of thin) so the recorded
    # stride does not restart at segment boundaries
    _, merged, _ = run_with_checkpoints(
        s, key, init, 24, str(tmp_path / "c.npz"), every=10, thin=4
    )
    np.testing.assert_array_equal(
        np.asarray(merged.samples), np.asarray(straight.samples)
    )


def test_already_complete_checkpoint_returns_none(tmp_path):
    s = _sampler()
    key = jax.random.PRNGKey(19)
    init = jnp.zeros((32, 2))
    path = str(tmp_path / "c.npz")
    run_with_checkpoints(s, key, init, 32, path, every=16)
    state, chain, start = run_with_checkpoints(s, key, init, 32, path, every=16)
    assert chain is None and start == 32


def test_rerun_completed_job_with_odd_thin(tmp_path):
    """Re-running a finished job whose final step is not a multiple of
    thin must report completion, not raise (restart workflow)."""
    s = _sampler()
    key = jax.random.PRNGKey(29)
    init = jnp.zeros((32, 2))
    path = str(tmp_path / "c.npz")
    run_with_checkpoints(s, key, init, 10, path, every=6, thin=3)
    state, chain, start = run_with_checkpoints(s, key, init, 10, path, every=6, thin=3)
    assert chain is None and start == 10
    # extending past a misaligned endpoint is refused with a clear error
    import pytest

    with pytest.raises(ValueError, match="cannot extend"):
        run_with_checkpoints(s, key, init, 20, path, every=6, thin=3)


def test_invalid_every_rejected(tmp_path):
    import pytest

    s = _sampler()
    with pytest.raises(ValueError, match=">= 1"):
        run_with_checkpoints(
            s, jax.random.PRNGKey(0), jnp.zeros((32, 2)), 10,
            str(tmp_path / "c.npz"), every=0,
        )
