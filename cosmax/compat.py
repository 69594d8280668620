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
"""

import numpy as np

from cosmax.samplers.diagnostics import autocorr_time
from cosmax.samplers.ensemble import (
    EnsembleSampler as _CosmaxSampler,
    MoveSpec,
    default_moves,
)


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
                 vmapped_log_prob=None):
        self._s = _CosmaxSampler(
            log_prob_fn, nwalkers, ndim, moves=_coerce_moves(moves),
            vmapped_log_prob=vmapped_log_prob,
        )
        self.nwalkers = nwalkers
        self.ndim = ndim
        self._seed = seed
        self._chain = None
        self._state = None
        self._n_starts = 0

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
        return self._state

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
