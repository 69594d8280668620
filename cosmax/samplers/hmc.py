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
* **Per-chain step size, pooled mass** — dual-averaging step-size
  adaptation (Hoffman & Gelman 2014, Nesterov dual averaging; target
  accept 0.8) runs *per chain* on each chain's own accept statistic
  (one chain thrown out by a mass reset crushes only its own eps and
  recovers — the pooled-mean variant was a measured warmup seed
  lottery on the w0waCDM banana), and a pooled
  Welford estimate of the posterior covariance for the mass matrix
  (dense by default — the joint posteriors' rd-H0-style degeneracies
  cost a diagonal metric ~15x in autocorrelation time; diagonal via
  ``dense_mass=False``): with hundreds of lockstep chains the
  adaptation sees hundreds of accept statistics per step, converging
  far faster than any single-chain warmup. Robustness guards, each
  motivated by a measured warmup failure mode (see inline comments):
  mass updates repeat over Stan-style expanding windows; the Welford
  pool trims the lowest quartile AND anything far below the best
  chain; trajectories with |dH| beyond a cap are rejected outright
  (symmetric factor, so detailed balance holds); escapee chains are
  rejuvenated from the healthy bulk at every mass boundary; and a
  large end-of-warmup rejuvenation fraction triggers an automatic
  warmup retry with a fresh key. With per-chain dual averaging the
  retry is a rare fallback, not a load-bearing mechanism: the
  pooled-mean variant failed the health check on ~1/5 of seeds on
  the w0waCDM banana, while the per-chain sweep
  (tools/warmup_sweep.py: 20 seeds x 128 chains, bao.desi_union3
  w0waCDM, warmup 800) measures 0 retries with at most 2.3% of
  chains rejuvenated.
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
from typing import Callable, NamedTuple

import numpy as np
import jax
import jax.numpy as jnp

from cosmax.samplers.ensemble import Chain  # noqa: F401  (layout docs)


class HMCChain(NamedTuple):
    """Recorded HMC chain: ``Chain``'s [T, C, D] layout plus a
    first-class per-chain divergence record (no ``move_index`` pun —
    HMC has no move mixture; what its users need instead is *which*
    chains diverged and *how often*, the standard HMC health signal).
    """

    samples: jnp.ndarray  # [T, C, D] constrained-space draws
    log_probs: jnp.ndarray  # [T, C]
    accepted: jnp.ndarray  # [T, C] bool
    divergent: jnp.ndarray  # [T, C] bool — |dH| > cap on that trajectory

    @property
    def acceptance_fraction(self):
        return jnp.mean(self.accepted.astype(jnp.float32))

    def flat(self, discard: int = 0, thin: int = 1):
        s = self.samples[discard::thin]
        return s.reshape(-1, s.shape[-1])

    @property
    def divergences_per_chain(self):
        """[C] total divergent trajectories per chain."""
        return jnp.sum(self.divergent.astype(jnp.int32), axis=0)

    @property
    def n_divergent(self):
        """Total divergent (chain, step) trajectories."""
        return jnp.sum(self.divergent.astype(jnp.int32))


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


def _da_update(a: AdaptState, accept_stat, target):
    """Nesterov dual averaging toward the target accept statistic.

    ``accept_stat`` is the per-chain accept probability [C] and the
    eps fields are per-chain [C] vectors (elementwise update): each
    chain adapts its own step size, so one chain thrown out by a mass
    reset crushes only ITS eps (and recovers), instead of either
    dragging the pooled mean down for everyone or — the measured
    w0waCDM warmup lottery — diverging unchecked because 200 healthy
    chains held the pooled eps too large for it."""
    t = a.t + 1.0
    eta_h = 1.0 / (t + _DA_T0)
    h_bar = (1.0 - eta_h) * a.h_bar + eta_h * (target - accept_stat)
    log_eps = a.mu - jnp.sqrt(t) / _DA_GAMMA * h_bar
    eta = t ** (-_DA_KAPPA)
    log_eps_bar = eta * log_eps + (1.0 - eta) * a.log_eps_bar
    return a._replace(log_eps=log_eps, log_eps_bar=log_eps_bar, h_bar=h_bar, t=t)


def _welford_update(a: AdaptState, y, dense: bool, logp=None):
    # batch update with all chains at once; m2 is [D] (variances) or
    # [D, D] (scatter matrix) depending on the mass-matrix mode.
    # When logp is given, the lowest-quartile chains are excluded:
    # straggler chains still far from the mode otherwise inflate the
    # pooled covariance by up to ~10x in one direction, and a mass
    # matrix that wrong makes the whitened dynamics explode (measured
    # bistable flagship warmups: tau 1 vs 19 depending on the seed).
    if logp is None:
        w = jnp.ones(y.shape[:1], dtype=y.dtype)
    else:
        # quartile trim AND an absolute gap to the best chain: chains
        # on a mid-window escape excursion (logp hundreds below the
        # bulk) must not contaminate the estimate even when they are
        # briefly more than a quarter of the ensemble
        cut = jnp.quantile(logp, 0.25)
        gap = 10.0 + 5.0 * y.shape[1]
        w = ((logp >= cut) & (logp >= jnp.max(logp) - gap)).astype(y.dtype)
    c = jnp.maximum(jnp.sum(w), 1.0)
    n = a.w_n + c
    batch_mean = jnp.sum(w[:, None] * y, axis=0) / c
    delta = batch_mean - a.w_mean
    mean = a.w_mean + delta * (c / n)
    r = (y - batch_mean) * w[:, None]
    if dense:
        batch_m2 = r.T @ r
        cross = jnp.outer(delta, delta)
    else:
        batch_m2 = jnp.sum(r**2, axis=0)
        cross = delta**2
    m2 = a.w_m2 + batch_m2 + cross * (a.w_n * c / n)
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
        dense_mass: bool = True,
        dtype=None,
    ):
        from cosmax.utils.dtypes import canonical_dtype

        self.dtype = canonical_dtype(dtype)
        # dense_mass (default): adapt the full [D, D] momentum
        # covariance — removes the rd-H0-style degeneracies of the
        # joint posteriors (flagship tau 16 -> ~1.2); cheap at D <= 11.
        self.dense_mass = bool(dense_mass)
        self.n_chains = int(n_chains)
        self.ndim = int(np.asarray(bounds).shape[0])
        self.max_leapfrog = int(max_leapfrog)
        self.target_accept = float(target_accept)
        # reject (don't just count) trajectories with |dH| beyond this
        self.max_energy_error = 50.0
        self.transform = BoxTransform.from_bounds(bounds, self.dtype)
        tr = self.transform

        def logp_y(y):
            return log_prob_fn(tr.to_x(y)) + tr.log_jac(y)

        self._value_and_grad = jax.vmap(jax.value_and_grad(logp_y))

    # -- mass-matrix mode helpers ---------------------------------------
    # inv_mass is the estimated posterior covariance in y-space: [D]
    # marginal variances (diag mode) or the full [D, D] matrix (dense).
    def _mass_eye(self):
        d = self.ndim
        return (
            jnp.eye(d, dtype=self.dtype)
            if self.dense_mass
            else jnp.ones((d,), self.dtype)
        )

    def _momentum(self, z, inv_mass):
        """p ~ N(0, M) with M = inv_mass^{-1}."""
        if not self.dense_mass:
            return z / jnp.sqrt(inv_mass)
        chol = jnp.linalg.cholesky(inv_mass)
        # Sigma = L L^T  =>  p = L^{-T} z
        return jax.scipy.linalg.solve_triangular(
            chol.T, z.T, lower=False
        ).T

    def _velocity(self, p, inv_mass):
        """dy/dt = M^{-1} p = Sigma p."""
        if not self.dense_mass:
            return inv_mass * p
        return p @ inv_mass  # symmetric

    def _kinetic(self, p, inv_mass):
        if not self.dense_mass:
            return 0.5 * jnp.sum(inv_mass * p**2, axis=-1)
        return 0.5 * jnp.sum(p * (p @ inv_mass), axis=-1)

    # -- one MH-corrected trajectory ------------------------------------
    def _step(self, state: HMCState, eps, inv_mass, n_leap):
        key, k_mom, k_len, k_acc = jax.random.split(state.key, 4)
        c, d = state.y.shape
        # eps is a scalar (fixed-parameter runs) or per-chain [C]
        # (adapted by per-chain dual averaging); broadcast over D
        eps = jnp.asarray(eps, dtype=self.dtype)
        if eps.ndim == 1:
            eps = eps[:, None]
        # momentum ~ N(0, M) with M^{-1} = inv_mass (posterior covariance)
        z = jax.random.normal(k_mom, (c, d), dtype=self.dtype)
        p0 = self._momentum(z, inv_mass)

        # The log-prob value rides along in the leapfrog carry: the
        # final iteration's value-and-grad call IS the evaluation at
        # y1, so neither logp1 nor the post-acceptance gradient needs
        # a fresh _value_and_grad — n_leap calls per trajectory where
        # the naive form burns n_leap + 2 (~19% of the gradient budget
        # at max_leapfrog=16, mean trajectory 8.5).
        def leapfrog_body(_, carry):
            y, p, v, g = carry
            p = p + 0.5 * eps * g
            y = y + eps * self._velocity(p, inv_mass)
            v, g = self._value_and_grad(y)
            g = jnp.where(jnp.isfinite(g), g, 0.0)
            p = p + 0.5 * eps * g
            return y, p, v, g

        y1, p1, logp1, g1 = jax.lax.fori_loop(
            0, n_leap, leapfrog_body, (state.y, p0, state.logp, state.grad)
        )

        kin0 = self._kinetic(p0, inv_mass)
        kin1 = self._kinetic(p1, inv_mass)
        h0 = -state.logp + kin0
        h1 = -logp1 + kin1
        log_ratio = h0 - h1
        # Reject trajectories whose energy error exceeds the cap IN
        # EITHER direction. An unstable leapfrog trajectory can end
        # with a spuriously *favorable* energy (large negative error)
        # and teleport an accepted chain into a far tail — measured on
        # the w0waCDM banana: post-mass-reset divergence storms
        # scattered chains to logp ~ -4000 and collapsed the step
        # size, a metastable warmup failure on ~1/3 of seeds. |dH| is
        # invariant under trajectory reversal, so the cap is a
        # symmetric acceptance factor and detailed balance holds.
        divergent = jnp.abs(log_ratio) > self.max_energy_error
        log_ratio = jnp.where(
            jnp.isfinite(log_ratio) & ~divergent, log_ratio, -jnp.inf
        )
        accept_prob = jnp.minimum(1.0, jnp.exp(log_ratio))
        u = jax.random.uniform(k_acc, (c,), dtype=self.dtype)
        accept = jnp.log(u) < log_ratio

        y = jnp.where(accept[:, None], y1, state.y)
        logp = jnp.where(accept, logp1, state.logp)
        grad = jnp.where(accept[:, None], g1, state.grad)
        new_state = HMCState(y, logp, grad, key, state.step + 1)
        return new_state, accept, accept_prob, divergent

    def _draw_length(self, key):
        return jax.random.randint(key, (), 1, self.max_leapfrog + 1)

    # -- warmup ----------------------------------------------------------
    def init_adapt_state(self) -> AdaptState:
        """Fresh adaptation state (the start-of-warmup carry); public
        because segmented/checkpointed warmup round-trips it through
        cosmax.samplers.checkpoints."""
        c, d = self.n_chains, self.ndim
        # per-chain eps state: see _da_update for why per-chain (not
        # pooled-mean) dual averaging is the de-lottery mechanism
        log_eps0 = jnp.full((c,), np.log(0.1), dtype=self.dtype)
        return AdaptState(
            log_eps=log_eps0,
            log_eps_bar=log_eps0,
            h_bar=jnp.zeros((c,), self.dtype),
            mu=jnp.log(10.0) + log_eps0,
            t=jnp.zeros((), self.dtype),
            w_mean=jnp.zeros((d,), self.dtype),
            w_m2=jnp.zeros_like(self._mass_eye()),
            w_n=jnp.zeros((), self.dtype),
            inv_mass=self._mass_eye(),
        )

    def _warmup_schedule(self, n_warmup: int):
        # Stan-style expanding windows: an eps-only initial buffer,
        # then REPEATED mass updates (30% / 50% / 75%) with Welford
        # collection between them, then an eps-only terminal buffer.
        # A single late mass estimate is bistable on the joint
        # posteriors: chains that have not yet converged when the one
        # window closes hand the sampler a covariance inflated by the
        # init spread, the whitened dynamics explode, and dual
        # averaging crushes eps ~30x below optimal (measured flagship
        # tau 19 vs 1). Each rough whitening accelerates convergence
        # before the next, more accurate estimate.
        w1 = max(1, int(0.15 * n_warmup))
        mass_bnds = sorted(
            {
                max(w1 + 1, int(f * n_warmup))
                for f in (0.30, 0.50, 0.75)
            }
        )
        return w1, mass_bnds

    def _warmup_body(self, n_warmup: int):
        """The per-step warmup transition (carry = (HMCState,
        AdaptState), scanned over the absolute step index i). All state
        lives in the carry, so scanning [0, n) in one go is bitwise
        identical to scanning [0, k) then [k, n) — the property
        segmented (checkpointable) warmup relies on."""
        c, d = self.n_chains, self.ndim
        w1, mass_bnds = self._warmup_schedule(n_warmup)

        def body(carry, i):
            st, ad = carry
            k_len, _ = jax.random.split(jax.random.fold_in(st.key, 7))
            n_leap = self._draw_length(k_len)
            st, _, accept_prob, _ = self._step(
                st, jnp.exp(ad.log_eps), ad.inv_mass, n_leap
            )
            ad = _da_update(ad, accept_prob, self.target_accept)
            ad = jax.lax.cond(
                (i >= w1) & (i < mass_bnds[-1]),
                lambda a: _welford_update(a, st.y, self.dense_mass, st.logp),
                lambda a: a,
                ad,
            )

            def set_mass(a: AdaptState):
                var = a.w_m2 / jnp.maximum(a.w_n - 1.0, 1.0)
                if self.dense_mass:
                    # shrink toward the diagonal for conditioning
                    dvar = jnp.clip(jnp.diag(var), 1e-10, None)
                    var = var + 1e-4 * jnp.diag(dvar)
                else:
                    var = jnp.where(var > 1e-10, var, 1.0)
                # restart dual averaging at a scale-free step size: the
                # new mass whitens the dynamics, so the stable eps is
                # O(1) regardless of what the unwhitened phase needed —
                # carrying the old (often 10-100x smaller) eps over
                # leaves too little warmup to climb back (measured:
                # bistable tau 1 vs 19 on the flagship joint)
                log_eps_r = jnp.full((c,), np.log(0.5), self.dtype)
                return a._replace(
                    inv_mass=var,
                    log_eps=log_eps_r,
                    mu=jnp.log(10.0) + log_eps_r,
                    h_bar=jnp.zeros((c,), self.dtype),
                    t=jnp.zeros((), self.dtype),
                    log_eps_bar=log_eps_r,
                    w_mean=jnp.zeros((d,), self.dtype),
                    w_m2=jnp.zeros_like(a.w_m2),
                    w_n=jnp.zeros((), self.dtype),
                )

            hit = jnp.any(jnp.stack([i == b for b in mass_bnds]))
            ad = jax.lax.cond(hit, set_mass, lambda a: a, ad)
            # pull escapees back before the next window's estimate
            st = jax.lax.cond(
                hit, lambda s: self._rejuvenate(s)[0], lambda s: s, st
            )
            return (st, ad), None

        return body

    def _warmup(self, state: HMCState, n_warmup: int):
        body = self._warmup_body(n_warmup)
        (state, adapt), _ = jax.lax.scan(
            body, (state, self.init_adapt_state()), jnp.arange(n_warmup)
        )
        return self._finish_warmup(state, adapt)

    def _finish_warmup(self, state: HMCState, adapt: AdaptState):
        # final rejuvenation: a resampled chain inherits its donor's
        # adapted step size along with its position — its own eps was
        # adapted for the pathological region it is leaving
        eps_bar = jnp.exp(adapt.log_eps_bar)
        state, n_rejuvenated, (eps_bar,) = self._rejuvenate(
            state, extras=(eps_bar,)
        )
        return state, eps_bar, adapt.inv_mass, n_rejuvenated

    def _warmup_segment(
        self, state: HMCState, adapt: AdaptState, start: int, stop: int,
        n_warmup: int,
    ):
        """Advance warmup from absolute step ``start`` to ``stop`` of a
        ``n_warmup``-step schedule. Because the transition's only state
        is the (HMCState, AdaptState) carry, chaining segments is
        bitwise identical to the one-shot scan (tests/test_checkpoints
        .py::test_segmented_warmup_bitwise) — the property
        checkpointable warmup rests on. ``start`` is traced (only the
        segment LENGTH is static), so every full-length segment of a
        checkpointed warmup shares one compiled program."""
        return self._warmup_segment_impl(
            state, adapt, jnp.asarray(start), int(stop) - int(start),
            n_warmup,
        )

    @partial(jax.jit, static_argnames=("self", "length", "n_warmup"))
    def _warmup_segment_impl(
        self, state: HMCState, adapt: AdaptState, start, length: int,
        n_warmup: int,
    ):
        body = self._warmup_body(n_warmup)
        (state, adapt), _ = jax.lax.scan(
            body, (state, adapt), start + jnp.arange(length)
        )
        return state, adapt

    def _rejuvenate(self, state: HMCState, extras=()):
        """Replace chains stuck far below the bulk with copies of
        healthy chains. A handful of inits land where the step size
        tuned for the typical set can never accept (zero-accept chains
        ~100 nats below the median); they would sit at their initial
        position for the whole run and bias every marginal. Warmup
        draws are discarded, so resampling their positions from the
        healthy bulk only changes the (forgotten) starting
        distribution. ``extras`` are per-chain [C] arrays permuted the
        same way (the per-chain step size rides along with the donor's
        position). Returns ``(state, n_bad, new_extras)``."""
        key, k_donor = jax.random.split(state.key)
        lp = state.logp
        q25 = jnp.quantile(lp, 0.25)
        q75 = jnp.quantile(lp, 0.75)
        # two criteria: IQR outliers (a few stragglers below a healthy
        # bulk) AND an absolute gap to the best chain (robust when the
        # MAJORITY has drifted out during non-stationary adaptation —
        # measured on the w0waCDM banana, where >50% of chains
        # diffused to logp ~ -3000 between mass windows and
        # quantile-based cuts just chased the escaping cloud)
        gap = 10.0 + 5.0 * state.y.shape[1]
        bad = (lp < q25 - 3.0 * (q75 - q25)) | (lp < jnp.max(lp) - gap)
        healthy = (~bad).astype(lp.dtype)
        donors = jax.random.categorical(
            k_donor,
            jnp.log(healthy / jnp.maximum(healthy.sum(), 1.0)),
            shape=lp.shape,
        )
        sel = bad[:, None]
        state = HMCState(
            y=jnp.where(sel, state.y[donors], state.y),
            logp=jnp.where(bad, lp[donors], lp),
            grad=jnp.where(sel, state.grad[donors], state.grad),
            key=key,
            step=state.step,
        )
        new_extras = tuple(jnp.where(bad, e[donors], e) for e in extras)
        return state, jnp.sum(bad), new_extras

    # -- full run --------------------------------------------------------
    def init_state(self, key, initial_x) -> HMCState:
        y = self.transform.to_y(jnp.asarray(initial_x, dtype=self.dtype))
        logp, grad = self._value_and_grad(y)
        return HMCState(y, logp, grad, key, jnp.asarray(0))

    def _sample_scan(self, state: HMCState, n_samples: int, eps, inv_mass):
        """Post-warmup recording phase. No cross-chain reductions here
        (the per-chain divergence record is elementwise), so a
        chain-axis sharding of the state partitions the program without
        changing any chain's trajectory — sharded == unsharded bitwise
        (tests/test_parallel.py)."""

        def body(st, _):
            k_len, _ = jax.random.split(jax.random.fold_in(st.key, 7))
            n_leap = self._draw_length(k_len)
            st, accept, _, divergent = self._step(st, eps, inv_mass, n_leap)
            x = self.transform.to_x(st.y)
            return st, (x, st.logp, accept, divergent)

        state, (xs, lps, accs, divs) = jax.lax.scan(
            body, state, None, length=n_samples
        )
        chain = HMCChain(
            samples=xs, log_probs=lps, accepted=accs, divergent=divs
        )
        return state, chain

    @partial(jax.jit, static_argnames=("self", "n_samples", "n_warmup"))
    def _run(self, state: HMCState, n_samples: int, n_warmup: int):
        state, eps, inv_mass, n_rejuv = self._warmup(state, n_warmup)
        state, chain = self._sample_scan(state, n_samples, eps, inv_mass)
        return state, chain, eps, inv_mass, n_rejuv

    @partial(jax.jit, static_argnames=("self", "n_samples"))
    def _run_fixed(self, state: HMCState, n_samples: int, eps, inv_mass):
        return self._sample_scan(state, n_samples, eps, inv_mass)

    @partial(jax.jit, static_argnames=("self", "n_warmup"))
    def _run_warmup(self, state: HMCState, n_warmup: int):
        return self._warmup(state, n_warmup)

    def prepare_state(self, key, initial=None) -> HMCState:
        """Initial sampler state from ``initial`` [C, D] in constrained
        space (default: mid-box with 10%-of-width Gaussian jitter) —
        the same construction ``run`` performs internally."""
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
        return state

    def warmup(self, key, n_warmup: int, initial=None):
        """Adaptation only: returns ``(state, step_size, inv_mass)``
        ready for :meth:`run_from_state` — the checkpointable split of
        :meth:`run`. (Warmup itself is also resumable mid-flight via
        :meth:`_warmup_segment` — cosmax.samplers.checkpoints snapshots
        the (HMCState, AdaptState) carry.) Applies
        the same warmup-health retry policy as ``run`` and sets
        ``self.warmup_retries`` / ``self.n_rejuvenated``."""
        if n_warmup < 1:
            raise ValueError("warmup requires n_warmup >= 1")
        init_state = self.prepare_state(key, initial)
        self.warmup_retries = 0
        while True:
            state, eps, im, n_rejuv = self._run_warmup(init_state, n_warmup)
            self.n_rejuvenated = int(n_rejuv)
            healthy = self.n_rejuvenated <= 0.2 * self.n_chains
            if healthy or self.warmup_retries >= 2:
                break
            self.warmup_retries += 1
            init_state = init_state._replace(
                key=jax.random.fold_in(init_state.key, self.warmup_retries)
            )
        self.step_size = np.asarray(eps)  # [C] per-chain
        self.inv_mass = np.asarray(im)
        return state, eps, im

    def run_from_state(self, state: HMCState, n_samples: int, step_size, inv_mass):
        """Record ``n_samples`` draws from a prepared/checkpointed
        state at fixed sampler parameters. Pure in ``state`` — running
        two segments back-to-back is bit-identical to one combined
        segment (cosmax.samplers.checkpoints relies on this)."""
        eps = jnp.asarray(step_size, dtype=self.dtype)
        im = jnp.asarray(inv_mass, dtype=self.dtype)
        return self._run_fixed(state, n_samples, eps, im)

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
        if n_warmup > 0 and (step_size is not None or inv_mass is not None):
            raise ValueError(
                "step_size/inv_mass are only honoured with n_warmup=0 "
                "(adaptation would overwrite them); pass n_warmup=0 to "
                "reuse a previous run's adapted values"
            )
        state = self.prepare_state(key, initial)
        if n_warmup == 0:
            if step_size is None:
                raise ValueError("n_warmup=0 requires step_size")
            eps = jnp.asarray(step_size, dtype=self.dtype)
            im = (
                self._mass_eye()
                if inv_mass is None
                else jnp.asarray(inv_mass, dtype=self.dtype)
            )
            state, chain = self._run_fixed(state, n_samples, eps, im)
            self.n_rejuvenated = 0
            self.warmup_retries = 0
        else:
            # The end-of-warmup rejuvenation count is a warmup health
            # check: a large fraction means the ensemble escaped during
            # the final window (measured on the w0waCDM banana: ~44% on
            # ~1/5 of seeds, leaving the recorded chain mis-shaped).
            # Warmup is a seed lottery on such posteriors — retry with
            # a fresh key rather than sample from a bad state.
            init_state = state
            self.warmup_retries = 0
            while True:
                state, chain, eps, im, n_rejuv = self._run(
                    init_state, n_samples, n_warmup
                )
                self.n_rejuvenated = int(n_rejuv)
                healthy = self.n_rejuvenated <= 0.2 * self.n_chains
                if healthy or self.warmup_retries >= 2:
                    break
                self.warmup_retries += 1
                init_state = init_state._replace(
                    key=jax.random.fold_in(init_state.key, self.warmup_retries)
                )
        # scalar on the fixed-parameter path, [C] per-chain after warmup
        self.step_size = np.asarray(eps)
        self.inv_mass = np.asarray(im)
        return state, chain
