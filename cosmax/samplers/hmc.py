"""Gradient-based Hamiltonian Monte Carlo on-device.

A capability the reference stack cannot offer: every cosmax likelihood
is a pure JAX function, so exact gradients of the full joint posterior
(through Gauss-Legendre distances, recombination formulae, the growth
emulator and the whitened SN matmuls) come for free from ``jax.grad``
— the reference's numba/scipy/emcee pipeline (bao/desi.py:119-129) is
gradient-free by construction and cannot run HMC at all.

Design, TPU-first:

* **Lockstep chains** — positions are one ``[C, D]`` array; the
  potential's value-and-grad is ``vmap``-ed over the chain axis and the
  whole run (warmup + sampling) is a single ``lax.scan`` program, the
  same compilation model as :class:`cosmax.samplers.ensemble.EnsembleSampler`.
* **Unconstrained reparameterisation** — the reference's uniform box
  priors (bao/desi.py:59-66 bounds arrays) become a per-dimension logit
  transform with its exact log-Jacobian, so trajectories never hit the
  -inf boundary wall.
* **Cross-chain pooled warmup** — dual-averaging step-size adaptation
  (Hoffman & Gelman 2014, Nesterov dual averaging; target accept 0.8)
  driven by the *mean* accept statistic over all chains, and a pooled
  Welford estimate of the posterior variance for the diagonal mass
  matrix: with hundreds of lockstep chains the adaptation sees
  hundreds of accept statistics per step, converging far faster than
  any single-chain warmup.
* **Jittered trajectories** — each step draws one shared trajectory
  length uniformly in ``[1, max_leapfrog]`` (independent of state, so
  detailed balance is untouched) which both decorrelates the chain
  like NUTS-style path randomisation and keeps every chain on the same
  fixed-shape leapfrog loop.

Samples are returned in the same :class:`~cosmax.samplers.ensemble.Chain`
layout (``[T, C, D]``), so the summary / diagnostics / plotting layers
are shared with the ensemble sampler.
"""

from functools import partial
from typing import Callable, NamedTuple, Optional

import numpy as np
import jax
import jax.numpy as jnp

from cosmax.samplers.ensemble import Chain


# -- box <-> unconstrained transform ------------------------------------


class BoxTransform(NamedTuple):
    """Logit reparameterisation of a [D, 2] bounds box."""

    lo: jnp.ndarray
    width: jnp.ndarray

    @classmethod
    def from_bounds(cls, bounds, dtype):
        b = np.asarray(bounds, dtype=np.float64)
        return cls(
            jnp.asarray(b[:, 0], dtype=dtype),
            jnp.asarray(b[:, 1] - b[:, 0], dtype=dtype),
        )

    def to_x(self, y):
        return self.lo + self.width * jax.nn.sigmoid(y)

    def to_y(self, x):
        s = jnp.clip((x - self.lo) / self.width, 1e-7, 1.0 - 1e-7)
        return jnp.log(s) - jnp.log1p(-s)

    def log_jac(self, y):
        # d x / d y = width * sigmoid(y) * sigmoid(-y)
        return jnp.sum(
            jnp.log(self.width) + jax.nn.log_sigmoid(y) + jax.nn.log_sigmoid(-y),
            axis=-1,
        )


# -- states --------------------------------------------------------------


class HMCState(NamedTuple):
    y: jnp.ndarray  # [C, D] unconstrained positions
    logp: jnp.ndarray  # [C] log posterior + log-Jacobian at y
    grad: jnp.ndarray  # [C, D] its gradient
    key: jnp.ndarray
    step: jnp.ndarray


class AdaptState(NamedTuple):
    log_eps: jnp.ndarray
    log_eps_bar: jnp.ndarray
    h_bar: jnp.ndarray
    mu: jnp.ndarray
    t: jnp.ndarray
    # pooled Welford moments over (chains x steps), per dimension
    w_mean: jnp.ndarray
    w_m2: jnp.ndarray
    w_n: jnp.ndarray
    inv_mass: jnp.ndarray  # [D] ~ posterior variance in y-space


_DA_GAMMA, _DA_T0, _DA_KAPPA = 0.05, 10.0, 0.75


def _da_update(a: AdaptState, accept_mean, target):
    t = a.t + 1.0
    eta_h = 1.0 / (t + _DA_T0)
    h_bar = (1.0 - eta_h) * a.h_bar + eta_h * (target - accept_mean)
    log_eps = a.mu - jnp.sqrt(t) / _DA_GAMMA * h_bar
    eta = t ** (-_DA_KAPPA)
    log_eps_bar = eta * log_eps + (1.0 - eta) * a.log_eps_bar
    return a._replace(log_eps=log_eps, log_eps_bar=log_eps_bar, h_bar=h_bar, t=t)


def _welford_update(a: AdaptState, y):
    # batch update with all chains at once
    c = y.shape[0]
    n = a.w_n + c
    batch_mean = jnp.mean(y, axis=0)
    delta = batch_mean - a.w_mean
    mean = a.w_mean + delta * (c / n)
    batch_m2 = jnp.sum((y - batch_mean) ** 2, axis=0)
    m2 = a.w_m2 + batch_m2 + delta**2 * (a.w_n * c / n)
    return a._replace(w_mean=mean, w_m2=m2, w_n=n)


class HMCSampler:
    """``HMCSampler(log_prob_fn, bounds, n_chains)`` — adaptive HMC.

    ``log_prob_fn(theta[D]) -> scalar`` is the same pure jittable
    function the ensemble sampler consumes (:func:`make_log_prob`);
    ``bounds`` is the ``ParamSpec.bounds`` [D, 2] box it was built for.

    ``run(key, n_samples, n_warmup=500, initial=None)`` returns
    ``(state, Chain)`` with samples in the *constrained* space.
    """

    def __init__(
        self,
        log_prob_fn: Callable,
        bounds,
        n_chains: int,
        max_leapfrog: int = 32,
        target_accept: float = 0.8,
        dtype=None,
    ):
        from cosmax.utils.dtypes import canonical_dtype

        self.dtype = canonical_dtype(dtype)
        self.n_chains = int(n_chains)
        self.ndim = int(np.asarray(bounds).shape[0])
        self.max_leapfrog = int(max_leapfrog)
        self.target_accept = float(target_accept)
        self.transform = BoxTransform.from_bounds(bounds, self.dtype)
        tr = self.transform

        def logp_y(y):
            return log_prob_fn(tr.to_x(y)) + tr.log_jac(y)

        self._value_and_grad = jax.vmap(jax.value_and_grad(logp_y))

    # -- one MH-corrected trajectory ------------------------------------
    def _step(self, state: HMCState, eps, inv_mass, n_leap):
        key, k_mom, k_len, k_acc = jax.random.split(state.key, 4)
        c, d = state.y.shape
        # momentum ~ N(0, M) with M^{-1} = inv_mass (posterior variance)
        z = jax.random.normal(k_mom, (c, d), dtype=self.dtype)
        p0 = z / jnp.sqrt(inv_mass)

        def leapfrog_body(_, carry):
            y, p, g = carry
            p = p + 0.5 * eps * g
            y = y + eps * inv_mass * p
            _, g = self._value_and_grad(y)
            g = jnp.where(jnp.isfinite(g), g, 0.0)
            p = p + 0.5 * eps * g
            return y, p, g

        y1, p1, g1 = jax.lax.fori_loop(
            0, n_leap, leapfrog_body, (state.y, p0, state.grad)
        )
        logp1, _ = self._value_and_grad(y1)

        kin0 = 0.5 * jnp.sum(inv_mass * p0**2, axis=-1)
        kin1 = 0.5 * jnp.sum(inv_mass * p1**2, axis=-1)
        h0 = -state.logp + kin0
        h1 = -logp1 + kin1
        log_ratio = h0 - h1
        log_ratio = jnp.where(jnp.isfinite(log_ratio), log_ratio, -jnp.inf)
        accept_prob = jnp.minimum(1.0, jnp.exp(log_ratio))
        u = jax.random.uniform(k_acc, (c,), dtype=self.dtype)
        accept = jnp.log(u) < log_ratio
        divergent = (h1 - h0) > 1000.0

        y = jnp.where(accept[:, None], y1, state.y)
        logp = jnp.where(accept, logp1, state.logp)
        _, grad = self._value_and_grad(y)  # cheap vs trajectory; keeps state exact
        new_state = HMCState(y, logp, grad, key, state.step + 1)
        return new_state, accept, accept_prob, divergent

    def _draw_length(self, key):
        return jax.random.randint(key, (), 1, self.max_leapfrog + 1)

    # -- warmup ----------------------------------------------------------
    def _warmup(self, state: HMCState, n_warmup: int):
        d = self.ndim
        # windows: [0, w1) eps only; [w1, w2) eps + Welford;
        # at w2 set mass + restart dual averaging; [w2, end) eps only
        w1 = max(1, int(0.15 * n_warmup))
        w2 = max(w1 + 1, int(0.75 * n_warmup))
        eps0 = jnp.asarray(0.1, dtype=self.dtype)
        adapt = AdaptState(
            log_eps=jnp.log(eps0),
            log_eps_bar=jnp.log(eps0),
            h_bar=jnp.zeros((), self.dtype),
            mu=jnp.log(10.0 * eps0),
            t=jnp.zeros((), self.dtype),
            w_mean=jnp.zeros((d,), self.dtype),
            w_m2=jnp.zeros((d,), self.dtype),
            w_n=jnp.zeros((), self.dtype),
            inv_mass=jnp.ones((d,), self.dtype),
        )

        def body(carry, i):
            st, ad = carry
            k_len, _ = jax.random.split(jax.random.fold_in(st.key, 7))
            n_leap = self._draw_length(k_len)
            st, _, accept_prob, _ = self._step(
                st, jnp.exp(ad.log_eps), ad.inv_mass, n_leap
            )
            ad = _da_update(ad, jnp.mean(accept_prob), self.target_accept)
            ad = jax.lax.cond(
                (i >= w1) & (i < w2),
                lambda a: _welford_update(a, st.y),
                lambda a: a,
                ad,
            )

            def set_mass(a: AdaptState):
                var = a.w_m2 / jnp.maximum(a.w_n - 1.0, 1.0)
                var = jnp.where(var > 1e-10, var, 1.0)
                # restart dual averaging around the current step size
                return a._replace(
                    inv_mass=var,
                    mu=jnp.log(10.0) + a.log_eps,
                    h_bar=jnp.zeros((), self.dtype),
                    t=jnp.zeros((), self.dtype),
                    log_eps_bar=a.log_eps,
                    w_mean=jnp.zeros((d,), self.dtype),
                    w_m2=jnp.zeros((d,), self.dtype),
                    w_n=jnp.zeros((), self.dtype),
                )

            ad = jax.lax.cond(i == w2, set_mass, lambda a: a, ad)
            return (st, ad), None

        (state, adapt), _ = jax.lax.scan(
            body, (state, adapt), jnp.arange(n_warmup)
        )
        return state, jnp.exp(adapt.log_eps_bar), adapt.inv_mass

    # -- full run --------------------------------------------------------
    def init_state(self, key, initial_x) -> HMCState:
        y = self.transform.to_y(jnp.asarray(initial_x, dtype=self.dtype))
        logp, grad = self._value_and_grad(y)
        return HMCState(y, logp, grad, key, jnp.asarray(0))

    def _sample_scan(self, state: HMCState, n_samples: int, eps, inv_mass):
        """Post-warmup recording phase. No cross-chain reductions here
        (the divergence `any` is order-independent), so a chain-axis
        sharding of the state partitions the program without changing
        any chain's trajectory — sharded == unsharded bitwise
        (tests/test_parallel.py)."""

        def body(st, _):
            k_len, _ = jax.random.split(jax.random.fold_in(st.key, 7))
            n_leap = self._draw_length(k_len)
            st, accept, _, divergent = self._step(st, eps, inv_mass, n_leap)
            x = self.transform.to_x(st.y)
            return st, (x, st.logp, accept, jnp.any(divergent))

        state, (xs, lps, accs, divs) = jax.lax.scan(
            body, state, None, length=n_samples
        )
        chain = Chain(
            samples=xs, log_probs=lps, accepted=accs,
            move_index=divs.astype(jnp.int32),  # 1 where any chain diverged
        )
        return state, chain

    @partial(jax.jit, static_argnames=("self", "n_samples", "n_warmup"))
    def _run(self, state: HMCState, n_samples: int, n_warmup: int):
        state, eps, inv_mass = self._warmup(state, n_warmup)
        state, chain = self._sample_scan(state, n_samples, eps, inv_mass)
        return state, chain, eps, inv_mass

    @partial(jax.jit, static_argnames=("self", "n_samples"))
    def _run_fixed(self, state: HMCState, n_samples: int, eps, inv_mass):
        return self._sample_scan(state, n_samples, eps, inv_mass)

    def run(
        self,
        key,
        n_samples: int,
        n_warmup: int = 500,
        initial=None,
        step_size: float = None,
        inv_mass=None,
    ):
        """Warm up (adaptation, discarded) then record ``n_samples``
        post-warmup draws. ``initial`` is [C, D] in constrained space;
        defaults to mid-box with 10%-of-width Gaussian jitter.

        With ``n_warmup=0`` the adaptation phase is skipped and
        ``step_size`` / ``inv_mass`` (e.g. from a previous run's
        adapted values) are used as-is. This fixed-parameter path has
        no cross-chain reductions, so it is bitwise invariant under
        chain-axis sharding — the multi-chip mode."""
        k_init, k_run = jax.random.split(key)
        if initial is None:
            mid = self.transform.lo + 0.5 * self.transform.width
            jitter = 0.1 * self.transform.width * jax.random.normal(
                k_init, (self.n_chains, self.ndim), dtype=self.dtype
            )
            initial = mid + jitter
        state = self.init_state(k_run, initial)
        if not bool(np.all(np.isfinite(np.asarray(state.logp)))):
            raise ValueError("initial positions have non-finite log-prob")
        if n_warmup == 0:
            if step_size is None:
                raise ValueError("n_warmup=0 requires step_size")
            eps = jnp.asarray(step_size, dtype=self.dtype)
            im = (
                jnp.ones((self.ndim,), self.dtype)
                if inv_mass is None
                else jnp.asarray(inv_mass, dtype=self.dtype)
            )
            state, chain = self._run_fixed(state, n_samples, eps, im)
        else:
            state, chain, eps, im = self._run(state, n_samples, n_warmup)
        self.step_size = float(eps)
        self.inv_mass = np.asarray(im)
        return state, chain
