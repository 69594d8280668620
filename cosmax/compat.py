"""emcee-compatible sampler facade.

The reference drives everything through ``emcee.EnsembleSampler``
(bao/desi.py:119-141, sn/pantheon.py:78-95). This module gives users
migrating from the reference the same five-call surface —
``EnsembleSampler(nwalkers, ndim, log_prob, moves=...)``,
``run_mcmc``, ``get_chain``, ``get_autocorr_time``,
``acceptance_fraction`` — backed by the on-device cosmax ensemble
(cosmax.samplers.ensemble): the whole chain runs as one jitted XLA
program instead of pickling walkers to a process pool.

Differences from emcee (by design):

* ``log_prob_fn`` must be jax-traceable (pure jnp ops). Reference
  numba log-probs are already pure array math, so the port is usually
  just ``np.`` -> ``jnp.``.
* determinism: pass ``seed=`` (emcee's global np.random state has no
  analogue in JAX); the same seed gives a bit-identical chain.
* ``moves`` accepts cosmax ``MoveSpec`` tuples or the emcee-style
  ``[(move_name, weight), ...]`` with names
  'kde' | 'de' | 'snooker' | 'stretch'. Defaults to the reference's
  mixture (KDE 0.30 / DE 0.56 / snooker 0.14).
* ``run_mcmc(..., progress=True)`` is accepted and ignored — the chain
  is one device program; there is nothing to print per step.
* ``run_mcmc(coords, n)`` after a previous run restarts from those
  coords (as emcee does) but REPLACES the stored chain rather than
  appending a discontinuous segment to it; pass ``None`` or the
  returned state to continue a chain.
* **blobs**: a ``log_prob_fn`` returning ``(logp, blob)`` (or a longer
  tuple) is detected exactly as emcee does; ``get_blobs()`` returns
  the per-(step, walker) blob array. Blobs are deterministic functions
  of position, so they are recomputed in one vmapped pass over the
  recorded chain instead of being threaded through the sampler's hot
  loop — bit-identical to emcee's convention of storing the value at
  the accepted position, with zero cost per MCMC step.
* **backend**: :class:`NpzBackend` persists the chain + sampler state
  (including the PRNG stream) to a single npz file —
  ``emcee.backends.HDFBackend`` semantics: ``run_mcmc(None, n)``
  resumes a crashed run where it left off and ``get_chain()`` returns
  the full pre+post-crash history. An npz keeps the artifact portable
  and dependency-free (same rationale as cosmax.samplers.checkpoints).
"""

import os

import numpy as np

from cosmax.samplers.diagnostics import autocorr_time
from cosmax.samplers.ensemble import (
    EnsembleSampler as _CosmaxSampler,
    MoveSpec,
    default_moves,
)


def _split_blobs(log_prob_fn, ndim):
    """emcee-style blob detection: a log-prob returning a tuple is
    (logp, *blobs). Returns (scalar_log_prob, blob_fn | None)."""
    import jax
    import jax.numpy as jnp

    try:
        out = jax.eval_shape(log_prob_fn, jnp.zeros((ndim,), jnp.float32))
    except Exception:
        return log_prob_fn, None
    if not isinstance(out, tuple) or len(out) < 2:
        return log_prob_fn, None

    def lp(x):
        return log_prob_fn(x)[0]

    def blob_fn(x):
        # always a tuple of the raw blob values; get_blobs decides the
        # layout (emcee stacks homogeneous blobs, keeps heterogeneous
        # ones as object cells)
        return tuple(log_prob_fn(x)[1:])

    return lp, blob_fn


def _coerce_moves(moves):
    if moves is None:
        return default_moves()
    out = []
    for m in moves:
        if isinstance(m, MoveSpec):
            out.append(m)
        else:
            kind, weight = m
            out.append(MoveSpec(str(kind).lower(), float(weight)))
    return tuple(out)


class EnsembleSampler:
    """Drop-in facade for ``emcee.EnsembleSampler`` (see module doc)."""

    def __init__(self, nwalkers, ndim, log_prob_fn, moves=None, seed=0,
                 vmapped_log_prob=None, backend=None):
        lp, self._blob_fn = _split_blobs(log_prob_fn, ndim)
        self._s = _CosmaxSampler(
            lp, nwalkers, ndim, moves=_coerce_moves(moves),
            vmapped_log_prob=vmapped_log_prob,
        )
        self.nwalkers = nwalkers
        self.ndim = ndim
        self._seed = seed
        self._chain = None
        self._state = None
        self._n_starts = 0
        self.backend = backend
        if backend is not None and backend.initialized:
            if (backend.nwalkers, backend.ndim) != (nwalkers, ndim):
                raise ValueError(
                    f"backend holds a ({backend.nwalkers}, {backend.ndim}) "
                    f"run, sampler is ({nwalkers}, {ndim}); backend.reset() "
                    "to start over"
                )
            self._state, self._chain = backend.load()

    def run_mcmc(self, initial_state, nsteps, progress=False, thin=1, **_):
        import jax

        from cosmax.samplers.ensemble import ChainState

        if isinstance(initial_state, ChainState):
            # emcee's standard burn-in idiom: state = run_mcmc(p0, n);
            # reset(); run_mcmc(state, n) — continue from the returned
            # sampler state (walkers, log-probs AND the PRNG stream)
            self._state = initial_state
            self._chain = None
        elif initial_state is not None:
            if self.backend is not None and self.backend.initialized:
                raise ValueError(
                    "the backend already holds a run; pass "
                    "initial_state=None to resume it or backend.reset() "
                    "to start over (emcee HDFBackend semantics)"
                )
            # explicit coords restart the chain from those positions,
            # exactly as emcee does (a prior run's endpoint is NOT
            # silently reused). Each fresh start folds a counter into
            # the key so successive restarts never replay the random
            # stream of an earlier (e.g. burn-in) phase.
            key = jax.random.fold_in(
                jax.random.PRNGKey(self._seed), self._n_starts
            )
            self._n_starts += 1
            self._state, self._chain = self._s.run(
                key, np.asarray(initial_state), nsteps, thin=thin
            )
            self._persist()
            return self._state
        if self._state is None:
            raise ValueError(
                "Cannot have initial_state=None if run_mcmc has never "
                "been called (pass walker coords of shape [nwalkers, ndim])"
            )
        # continuation semantics, like emcee's second run_mcmc call
        self._state, chain = self._s.run_from_state(self._state, nsteps, thin=thin)
        if self._chain is None:
            self._chain = chain
        else:
            import jax.tree_util as jtu
            import jax.numpy as jnp

            self._chain = jtu.tree_map(
                lambda a, b: jnp.concatenate([a, b]), self._chain, chain
            )
        self._persist()
        return self._state

    def _persist(self):
        if self.backend is not None and self._chain is not None:
            self.backend.save(self._state, self._chain)

    def get_blobs(self, discard=0, thin=1, flat=False):
        """Per-(step, walker) blobs, emcee layout. Recomputed from the
        recorded positions in one vmapped pass (see module doc)."""
        if self._blob_fn is None:
            return None  # emcee returns None when log_prob has no blobs
        if self._chain is None:
            raise RuntimeError("run_mcmc has not been called")
        import jax

        samples = np.asarray(self._chain.samples)[discard::thin]
        t, w = samples.shape[:2]
        flat_pos = samples.reshape(t * w, self.ndim)
        outs = [
            np.asarray(o)
            for o in jax.jit(jax.vmap(self._blob_fn))(flat_pos)
        ]
        if len(outs) == 1:
            blobs = outs[0]
        elif len({o.shape[1:] for o in outs}) == 1:
            blobs = np.stack(outs, axis=1)  # [t*w, k, ...]
        else:
            # heterogeneous blob shapes: emcee falls back to object
            # cells holding each walker's blob tuple
            blobs = np.empty(t * w, dtype=object)
            for i in range(t * w):
                blobs[i] = tuple(o[i] for o in outs)
        blobs = blobs.reshape((t, w) + blobs.shape[1:])
        return blobs.reshape((t * w,) + blobs.shape[2:]) if flat else blobs

    def get_chain(self, discard=0, thin=1, flat=False):
        """[steps, walkers, dim] like emcee.get_chain."""
        if self._chain is None:
            raise RuntimeError("run_mcmc has not been called")
        samples = np.asarray(self._chain.samples)[discard::thin]
        if flat:
            return samples.reshape(-1, self.ndim)
        return samples

    def get_log_prob(self, discard=0, thin=1, flat=False):
        if self._chain is None:
            raise RuntimeError("run_mcmc has not been called")
        lps = np.asarray(self._chain.log_probs)[discard::thin]
        return lps.reshape(-1) if flat else lps

    def get_autocorr_time(self, discard=0, **_):
        """Integrated autocorrelation time per dimension (emcee
        semantics; raises like emcee when the chain is too short)."""
        chain = self.get_chain(discard=discard)
        tau = np.asarray(autocorr_time(chain))
        if chain.shape[0] < 50 * np.max(tau):
            raise AutocorrError(
                tau, "The chain is shorter than 50 times the integrated "
                "autocorrelation time"
            )
        return tau

    @property
    def acceptance_fraction(self):
        if self._chain is None:
            raise RuntimeError("run_mcmc has not been called")
        return np.asarray(self._chain.accepted).mean(axis=0)

    def reset(self):
        self._chain = None
        self._state = None


class AutocorrError(Exception):
    """Mirror of emcee.autocorr.AutocorrError: carries the tau estimate."""

    def __init__(self, tau, message):
        super().__init__(message)
        self.tau = tau


class NpzBackend:
    """Persistent chain store with ``emcee.backends.HDFBackend``
    semantics, as a single portable npz file: the recorded chain AND
    the live sampler state (walkers, log-probs, PRNG stream, step
    counter), so ``EnsembleSampler(..., backend=b)`` +
    ``run_mcmc(None, n)`` resumes a crashed run bit-exactly where it
    stopped and ``get_chain()`` spans the full history."""

    def __init__(self, filename: str):
        self.filename = str(filename)

    @property
    def initialized(self) -> bool:
        return os.path.exists(self.filename)

    def _load_raw(self):
        with np.load(self.filename) as z:
            return {k: z[k] for k in z.files}

    @property
    def iteration(self) -> int:
        """Recorded steps so far (0 for an empty backend)."""
        if not self.initialized:
            return 0
        return int(self._load_raw()["samples"].shape[0])

    @property
    def nwalkers(self):
        return int(self._load_raw()["samples"].shape[1])

    @property
    def ndim(self):
        return int(self._load_raw()["samples"].shape[2])

    def reset(self, nwalkers=None, ndim=None):
        """Drop the stored run (emcee's reset(nwalkers, ndim); the
        shape args are accepted for signature parity — the next save
        defines the shapes)."""
        if self.initialized:
            os.remove(self.filename)

    def save(self, state, chain):
        import jax

        from cosmax.samplers.checkpoints import atomic_savez

        # atomic: a crash mid-save must not destroy the prior history
        atomic_savez(
            self.filename,
            compressed=True,
            samples=np.asarray(chain.samples),
            log_probs=np.asarray(chain.log_probs),
            accepted=np.asarray(chain.accepted),
            move_index=np.asarray(chain.move_index),
            walkers=np.asarray(state.walkers),
            state_log_probs=np.asarray(state.log_probs),
            key_data=np.asarray(jax.random.key_data(state.key)),
            step=np.asarray(state.step),
        )

    def load(self):
        """-> (ChainState, Chain) for resuming."""
        import jax
        import jax.numpy as jnp

        from cosmax.samplers.ensemble import Chain, ChainState

        z = self._load_raw()
        state = ChainState(
            walkers=jnp.asarray(z["walkers"]),
            log_probs=jnp.asarray(z["state_log_probs"]),
            key=jax.random.wrap_key_data(jnp.asarray(z["key_data"])),
            step=jnp.asarray(z["step"]),
        )
        chain = Chain(
            samples=jnp.asarray(z["samples"]),
            log_probs=jnp.asarray(z["log_probs"]),
            accepted=jnp.asarray(z["accepted"]),
            move_index=jnp.asarray(z["move_index"]),
        )
        return state, chain

    def get_chain(self, discard=0, thin=1, flat=False):
        z = self._load_raw()
        s = z["samples"][discard::thin]
        return s.reshape(-1, s.shape[-1]) if flat else s

    def get_log_prob(self, discard=0, thin=1, flat=False):
        z = self._load_raw()
        lp = z["log_probs"][discard::thin]
        return lp.reshape(-1) if flat else lp

    def get_last_sample(self):
        """Final walker coords [nwalkers, ndim] (emcee's State.coords)."""
        return self._load_raw()["walkers"]
