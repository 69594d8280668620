"""Sampler-state checkpointing for preemptible TPUs.

The reference keeps chains only in memory (emcee's HDF backend is never
used — SURVEY.md SS5). Here the full sampler state (walkers, log-probs,
PRNG key, step counter) round-trips through a single npz file;
``EnsembleSampler.run_from_state`` resumes bit-exactly (the sampler is
a pure function of its state). Orbax is intentionally not required —
the state is a few KB and a flat npz keeps the artifact portable.
"""

import os

import numpy as np
import jax
import jax.numpy as jnp

from cosmax.samplers.ensemble import ChainState


def save_state(path: str, state: ChainState, metadata: dict = None):
    os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
    key_data = np.asarray(jax.random.key_data(state.key))
    np.savez(
        path,
        walkers=np.asarray(state.walkers),
        log_probs=np.asarray(state.log_probs),
        key_data=key_data,
        step=np.asarray(state.step),
        **{f"meta_{k}": np.asarray(v) for k, v in (metadata or {}).items()},
    )


def load_state(path: str) -> ChainState:
    with np.load(path) as z:
        key = jax.random.wrap_key_data(jnp.asarray(z["key_data"]))
        return ChainState(
            walkers=jnp.asarray(z["walkers"]),
            log_probs=jnp.asarray(z["log_probs"]),
            key=key,
            step=jnp.asarray(z["step"]),
        )


def run_with_checkpoints(
    sampler, key, initial, n_steps: int, path: str, every: int = 500, thin: int = 1
):
    """Run in ``every``-step segments, checkpointing after each; resumes
    automatically if ``path`` already holds a state.

    Returns ``(state, chain, start_step)``. On a fresh run
    ``start_step`` is 0 and ``chain`` covers the whole run; on resume
    the pre-crash samples live only in the earlier process's return
    value, so ``chain`` holds the post-resume segments and
    ``start_step`` is the absolute step count already completed —
    callers must offset burn-in discards by ``start_step // thin``
    (cosmax.fit does).

    ``every`` is rounded up to a multiple of ``thin`` so the recorded
    stride is identical to a single uninterrupted thinned run (the
    per-segment thinning would otherwise restart its phase at each
    segment boundary).
    """
    if every < 1:
        raise ValueError(f"checkpoint interval must be >= 1 (got {every})")
    every = -(-every // thin) * thin
    if os.path.exists(path):
        state = load_state(path)
        start = int(state.step)
        if start >= n_steps:
            # already complete — also covers re-running a finished job
            # whose final step is not a multiple of thin
            return state, None, start
        if start % thin:
            raise ValueError(
                f"cannot extend from a checkpoint at step {start} with "
                f"thin={thin} ({start} % {thin} != 0): the recorded stride "
                "would misalign. Finish runs on multiples of thin (pick "
                "n_steps divisible by thin) if you plan to extend them."
            )
    else:
        state = sampler.init_state(key, initial)
        start = 0
    done = start
    chains = []
    while done < n_steps:
        # Full segments share one compiled scan program (every distinct
        # length is a separate XLA compile); the final segment runs the
        # exact remainder — overshooting and trimming instead would save
        # steps into the checkpoint that appear in NO returned chain,
        # silently losing them across a resume boundary.
        seg = min(every, n_steps - done)
        state, chain = sampler.run_from_state(state, seg, thin=thin)
        save_state(path, state)
        chains.append(chain)
        done += seg
    if not chains:
        return state, None, start
    import jax.tree_util as jtu

    merged = jtu.tree_map(lambda *xs: jnp.concatenate(xs, axis=0), *chains)
    return state, merged, start
