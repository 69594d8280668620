"""On-device affine-invariant ensemble MCMC.

TPU-native replacement for the reference's emcee + multiprocessing.Pool
stack (sn/pantheon.py:77-89, bao/desi.py:119-129): all walkers advance
in lockstep inside one ``lax.scan``-compiled program — the
log-probability is ``vmap``-ed over the walker axis, so every probe
chi^2 becomes a batched MXU matmul, and there is no host round-trip in
the hot loop.

Moves (mirroring the reference's mixture, bao/desi.py:122-127):

* **stretch** — Goodman & Weare affine-invariant stretch, a=2
  (emcee's default StretchMove; quasars/qsr_desi.py uses it alone)
* **de** — differential evolution, gamma0 = 2.38/sqrt(2 D) with
  multiplicative jitter (emcee DEMove semantics)
* **snooker** — DE snooker with gamma_s = 1.7 and the
  (D-1) log(|x'-z|/|x-z|) metropolis factor (emcee DESnookerMove)
* **kde** — Gaussian-KDE resample of the complementary half with
  Scott bandwidth and the full q(old)/q(new) Metropolis-Hastings
  correction (emcee KDEMove); O(W^2 D) per step — one matmul-shaped
  kernel evaluation, cheap on the MXU for reference-scale ensembles.

Detailed balance follows emcee's red-black scheme: the ensemble is
split into two fixed halves; each step updates half 0 against half 1,
then half 1 against the *updated* half 0. One move kind is drawn per
step from the mixture weights (as emcee draws per iteration).

The sampler is a pure function of its PRNG key: fixed keys give
bit-reproducible chains (the reference gets only partial determinism
from np.random.seed in 5 of 40 scripts, SURVEY.md SS2.5).
"""

from dataclasses import dataclass
from functools import partial
from typing import Callable, NamedTuple, Optional, Sequence, Tuple

import numpy as np
import jax
import jax.numpy as jnp


@dataclass(frozen=True)
class MoveSpec:
    kind: str  # 'stretch' | 'de' | 'snooker' | 'kde'
    weight: float
    a: float = 2.0  # stretch scale
    sigma: float = 1.0e-5  # DE jitter
    gamma0: Optional[float] = None  # DE scale; default 2.38/sqrt(2 D)
    gammas: float = 1.7  # snooker scale


def default_moves() -> Tuple[MoveSpec, ...]:
    """The reference's mixture: KDE 0.30 / DE 0.56 / snooker 0.14
    (bao/desi.py:122-127)."""
    return (
        MoveSpec("kde", 0.30),
        MoveSpec("de", 0.56),
        MoveSpec("snooker", 0.14),
    )


def stretch_only() -> Tuple[MoveSpec, ...]:
    return (MoveSpec("stretch", 1.0),)


class ChainState(NamedTuple):
    walkers: jnp.ndarray  # [W, D]
    log_probs: jnp.ndarray  # [W]
    key: jnp.ndarray
    step: jnp.ndarray  # scalar int


class Chain(NamedTuple):
    """samples[T, W, D] in emcee's get_chain() layout."""

    samples: jnp.ndarray
    log_probs: jnp.ndarray  # [T, W]
    accepted: jnp.ndarray  # [T, W] bool
    move_index: jnp.ndarray  # [T] which move was used

    @property
    def acceptance_fraction(self):
        return jnp.mean(self.accepted.astype(jnp.float32))

    def flat(self, discard: int = 0, thin: int = 1):
        s = self.samples[discard::thin]
        return s.reshape(-1, s.shape[-1])


def _rand_distinct(key, n, shape, k):
    """k distinct integers in [0, n) per element of ``shape``.

    Sequential shift trick: draw from shrinking ranges and shift past
    previously drawn values — exact uniform over distinct tuples for
    k <= 3 (all we need)."""
    keys = jax.random.split(key, k)
    idx = [jax.random.randint(keys[0], shape, 0, n)]
    if k >= 2:
        j = jax.random.randint(keys[1], shape, 0, n - 1)
        j = j + (j >= idx[0])
        idx.append(j)
    if k >= 3:
        m = jax.random.randint(keys[2], shape, 0, n - 2)
        lo = jnp.minimum(idx[0], idx[1])
        hi = jnp.maximum(idx[0], idx[1])
        m = m + (m >= lo)
        m = m + (m >= hi)
        idx.append(m)
    return idx


def _stretch_proposal(key, active, comp, spec: MoveSpec):
    nh, ndim = active.shape
    k1, k2 = jax.random.split(key)
    a = spec.a
    u = jax.random.uniform(k1, (nh,), dtype=active.dtype)
    z = ((a - 1.0) * u + 1.0) ** 2 / a
    (j,) = _rand_distinct(k2, comp.shape[0], (nh,), 1)
    cj = comp[j]
    prop = cj + z[:, None] * (active - cj)
    logfac = (ndim - 1.0) * jnp.log(z)
    return prop, logfac


def _de_proposal(key, active, comp, spec: MoveSpec):
    nh, ndim = active.shape
    k1, k2 = jax.random.split(key)
    g0 = spec.gamma0 if spec.gamma0 is not None else 2.38 / np.sqrt(2.0 * ndim)
    j, k = _rand_distinct(k1, comp.shape[0], (nh,), 2)
    eps = jax.random.normal(k2, (nh,), dtype=active.dtype)
    gamma = g0 * (1.0 + spec.sigma * eps)
    prop = active + gamma[:, None] * (comp[j] - comp[k])
    return prop, jnp.zeros((nh,), dtype=active.dtype)


def _snooker_proposal(key, active, comp, spec: MoveSpec):
    nh, ndim = active.shape
    j, k, l = _rand_distinct(key, comp.shape[0], (nh,), 3)
    z, z1, z2 = comp[j], comp[k], comp[l]
    delta = active - z
    norm = jnp.linalg.norm(delta, axis=-1, keepdims=True)
    u = delta / jnp.where(norm > 0, norm, 1.0)
    proj = jnp.sum(u * (z1 - z2), axis=-1, keepdims=True)
    prop = active + spec.gammas * proj * u
    norm_new = jnp.linalg.norm(prop - z, axis=-1)
    logfac = (ndim - 1.0) * (
        jnp.log(jnp.where(norm_new > 0, norm_new, 1.0))
        - jnp.log(jnp.where(norm[:, 0] > 0, norm[:, 0], 1.0))
    )
    return prop, logfac


def _kde_proposal(key, active, comp, spec: MoveSpec):
    """Gaussian-KDE resample of the complement (emcee KDEMove):
    proposal = comp[j] + bw * L eps with Scott's bandwidth; Metropolis
    factor log q(active) - log q(proposal) under the complement KDE.
    """
    from cosmax.ops.linalg import pdot

    nh, ndim = active.shape
    nc = comp.shape[0]
    k1, k2 = jax.random.split(key)
    bw = nc ** (-1.0 / (ndim + 4))  # Scott factor
    mean = jnp.mean(comp, axis=0)
    centered = comp - mean
    cov = pdot(centered.T, centered) / (nc - 1)
    cov = cov + 1e-12 * jnp.eye(ndim, dtype=cov.dtype)
    chol = jnp.linalg.cholesky(cov)
    (j,) = _rand_distinct(k1, nc, (nh,), 1)
    eps = jax.random.normal(k2, (nh, ndim), dtype=active.dtype)
    prop = comp[j] + bw * pdot(eps, chol.T)

    # Whiten once and use the Gram expansion
    # ||u_i - v_j||^2 = |u_i|^2 + |v_j|^2 - 2 u_i.v_j, so the Mahalanobis
    # matrix is one [B, D] x [D, nc] matmul per row block — computed in
    # chunks under lax.map so the [nh, nc] matrix is never materialised
    # (the 1e5-walker lockstep config would otherwise need 16 GB for it).
    def whiten(x):
        return (
            jax.scipy.linalg.solve_triangular(chol, x.T, lower=True) / bw
        ).T

    v = whiten(comp)  # [nc, D]
    v_sq = jnp.sum(v * v, axis=1)

    def log_kde(x):
        u = whiten(x)  # [nh, D]
        u_sq = jnp.sum(u * u, axis=1)
        # ~32M-element chunks (128 MB f32 scratch)
        block = max(8, min(nh, (1 << 25) // max(nc, 1)))
        pad = (-nh) % block
        u_p = jnp.pad(u, ((0, pad), (0, 0)))
        usq_p = jnp.pad(u_sq, (0, pad))

        def chunk(args):
            uc, usqc = args
            maha = usqc[:, None] + v_sq[None, :] - 2.0 * pdot(uc, v.T)
            return jax.scipy.special.logsumexp(-0.5 * maha, axis=1)

        out = jax.lax.map(
            chunk,
            (
                u_p.reshape(-1, block, ndim),
                usq_p.reshape(-1, block),
            ),
        )
        return out.reshape(-1)[:nh]

    logfac = log_kde(active) - log_kde(prop)
    return prop, logfac


_PROPOSALS = {
    "stretch": _stretch_proposal,
    "de": _de_proposal,
    "snooker": _snooker_proposal,
    "kde": _kde_proposal,
}


class EnsembleSampler:
    """``EnsembleSampler(log_prob_fn, n_walkers, ndim)`` where
    ``log_prob_fn(theta[D]) -> scalar`` is pure and jittable.

    ``run(key, initial, n_steps)`` compiles the whole chain into one
    XLA program. Optionally pass ``vmapped_log_prob`` for a custom
    batched evaluator (e.g. a shard_map-sharded one from
    cosmax.parallel).
    """

    def __init__(
        self,
        log_prob_fn: Callable,
        n_walkers: int,
        ndim: int,
        moves: Sequence[MoveSpec] = None,
        vmapped_log_prob: Callable = None,
    ):
        if n_walkers % 2 != 0:
            raise ValueError("n_walkers must be even (red-black halves)")
        self.n_walkers = n_walkers
        self.ndim = ndim
        self.moves = tuple(moves) if moves is not None else default_moves()
        if n_walkers > 65536 and any(m.kind == "kde" for m in self.moves):
            # The KDE move's blocked density evaluation is O(W^2) per
            # step: measured on a v5e, 25 ms/KDE-step at 32768 walkers
            # and 72 ms at 65536 (compiles in ~70 s) — fine; beyond that
            # the quadratic runtime dominates whole chains, and the
            # posterior is move-independent, so swap the KDE weight onto
            # the stretch move.
            import warnings

            warnings.warn(
                f"KDE move disabled for n_walkers={n_walkers} (> 65536): "
                "its weight is reassigned to a stretch move",
                stacklevel=2,
            )
            self.moves = tuple(
                MoveSpec("stretch", m.weight, a=m.a) if m.kind == "kde" else m
                for m in self.moves
            )
        for m in self.moves:
            if m.kind not in _PROPOSALS:
                raise ValueError(f"unknown move kind {m.kind!r}")
        self.log_prob_fn = log_prob_fn
        self.batched_log_prob = (
            vmapped_log_prob if vmapped_log_prob is not None else jax.vmap(log_prob_fn)
        )
        w = np.asarray([m.weight for m in self.moves], dtype=np.float64)
        self._move_probs = w / w.sum()

    # -- single step ----------------------------------------------------
    def _half_update(self, key, active, active_lp, comp, move_idx):
        keys = jax.random.split(key, 2)

        def make_branch(spec):
            def branch(k):
                return _PROPOSALS[spec.kind](k, active, comp, spec)

            return branch

        prop, logfac = jax.lax.switch(
            move_idx, [make_branch(m) for m in self.moves], keys[0]
        )
        prop_lp = self.batched_log_prob(prop)
        log_ratio = logfac + prop_lp - active_lp
        u = jax.random.uniform(keys[1], active_lp.shape, dtype=active.dtype)
        accept = jnp.log(u) < log_ratio
        new_active = jnp.where(accept[:, None], prop, active)
        new_lp = jnp.where(accept, prop_lp, active_lp)
        return new_active, new_lp, accept

    def step(self, state: ChainState):
        key, k_move, k0, k1 = jax.random.split(state.key, 4)
        move_idx = jax.random.choice(
            k_move, len(self.moves), p=jnp.asarray(self._move_probs)
        )
        half = self.n_walkers // 2
        w0, w1 = state.walkers[:half], state.walkers[half:]
        lp0, lp1 = state.log_probs[:half], state.log_probs[half:]
        w0, lp0, acc0 = self._half_update(k0, w0, lp0, w1, move_idx)
        w1, lp1, acc1 = self._half_update(k1, w1, lp1, w0, move_idx)
        new_state = ChainState(
            walkers=jnp.concatenate([w0, w1]),
            log_probs=jnp.concatenate([lp0, lp1]),
            key=key,
            step=state.step + 1,
        )
        return new_state, jnp.concatenate([acc0, acc1]), move_idx

    # -- full run -------------------------------------------------------
    def init_state(self, key, initial) -> ChainState:
        initial = jnp.asarray(initial)
        lp = self.batched_log_prob(initial)
        return ChainState(initial, lp, key, jnp.asarray(0))

    @partial(jax.jit, static_argnames=("self", "n_steps", "thin"))
    def _run(self, state: ChainState, n_steps: int, thin: int = 1):
        def body(st, _):
            st, acc, mv = self.step(st)
            return st, (st.walkers, st.log_probs, acc, mv)

        if thin == 1 or n_steps == 0:
            state, recs = jax.lax.scan(body, state, None, length=n_steps)
            return state, Chain(*recs)

        # Thin inside the scan so peak memory is ceil(n_steps/thin)
        # samples, not n_steps: each outer block records its first step
        # then advances thin-1 unrecorded steps. The step sequence (and
        # hence the PRNG stream and final state) is identical to an
        # unthinned run followed by samples[::thin].
        def skip(st, n):
            def unrecorded(s, _):
                s, _, _ = self.step(s)
                return s, None

            st, _ = jax.lax.scan(unrecorded, st, None, length=n)
            return st

        def block(st, _):
            st, acc, mv = self.step(st)
            rec = (st.walkers, st.log_probs, acc, mv)
            return skip(st, thin - 1), rec

        n_full, rem = divmod(n_steps, thin)
        recs = None
        if n_full:
            state, recs = jax.lax.scan(block, state, None, length=n_full)
        if rem:
            state, acc, mv = self.step(state)
            tail = (state.walkers, state.log_probs, acc, mv)
            state = skip(state, rem - 1)
            if recs is None:
                recs = tuple(jnp.expand_dims(t, 0) for t in tail)
            else:
                recs = tuple(
                    jnp.concatenate([r, jnp.expand_dims(t, 0)])
                    for r, t in zip(recs, tail)
                )
        return state, Chain(*recs)

    def run(self, key, initial, n_steps: int, thin: int = 1):
        """Run ``n_steps`` ensemble steps from ``initial`` [W, D].

        Returns (final_state, Chain). jit-compiled end to end.
        """
        state = self.init_state(key, initial)
        return self._run(state, n_steps, thin)

    def run_from_state(self, state: ChainState, n_steps: int, thin: int = 1):
        """Continue from a checkpointed state (cosmax.samplers.checkpoints)."""
        return self._run(state, n_steps, thin)


def uniform_init(key, bounds, n_walkers, dtype=None):
    """Uniform-in-bounds initial walker positions (reference
    bao/desi.py:114-117). Defaults to the active precision policy
    (f64 when x64 parity mode is enabled, else f32)."""
    from cosmax.utils.dtypes import canonical_dtype

    bounds = np.asarray(bounds, dtype=np.float64)
    u = jax.random.uniform(key, (n_walkers, bounds.shape[0]), dtype=canonical_dtype(dtype))
    lo = jnp.asarray(bounds[:, 0], dtype=u.dtype)
    hi = jnp.asarray(bounds[:, 1], dtype=u.dtype)
    return lo + u * (hi - lo)
