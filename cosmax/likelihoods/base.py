"""Composable likelihood terms.

The reference writes one monolithic ``chi_squared`` per probe
combination (~40 scripts, e.g. bao/desi_cmb_des5y.py:97-109). Here each
probe is a ``Term`` — a pure function of a named-parameter dict — and a
joint fit is just a list of terms plus a ``ParamSpec`` describing the
sampled vector. The resulting ``log_prob`` is one jit-able scalar
function; the sampler ``vmap``s it over walkers.

Parameter flow::

    theta [D]  --ParamSpec.unpack-->  {name: scalar}  --derive-->  dict
               --> sum_i (-0.5 * chi2_i(p) + log_norm_i(p))

``derive`` is the preset hook where reference quirks live (h -> H0,
Or = Omega_r h^2 / h^2, rd = rd_h / h, BBN-derived r_d, exp-sampled
w0, ...), so likelihood builders only ever see canonical names.
"""

from dataclasses import dataclass, field
from typing import Callable, Optional, Sequence

import numpy as np
import jax.numpy as jnp


@dataclass(frozen=True)
class ParamSpec:
    """Ordered, bounded sampled parameters (reference keeps these as a
    bounds array with positional indexing, e.g. bao/desi.py:59-66)."""

    names: tuple
    bounds: np.ndarray  # [D, 2] float64
    labels: tuple = None  # pretty labels for plots/reports

    def __post_init__(self):
        b = np.asarray(self.bounds, dtype=np.float64).reshape(len(self.names), 2)
        object.__setattr__(self, "bounds", b)
        if self.labels is None:
            object.__setattr__(self, "labels", tuple(self.names))

    @property
    def dim(self) -> int:
        return len(self.names)

    def unpack(self, theta) -> dict:
        return {name: theta[..., i] for i, name in enumerate(self.names)}

    def in_bounds(self, theta):
        """Strict interior check, matching the reference's
        ``(lo < p) & (p < hi)`` prior (bao/desi.py:86-90)."""
        # no explicit dtype= (would warn when theta is f64 numpy with
        # x64 disabled); asarray canonicalises, astype matches theta
        lo = jnp.asarray(self.bounds[:, 0]).astype(theta.dtype)
        hi = jnp.asarray(self.bounds[:, 1]).astype(theta.dtype)
        return jnp.all((lo < theta) & (theta < hi), axis=-1)


@dataclass(frozen=True)
class Term:
    """One probe's contribution: log L = -0.5 * chi2 + log_norm."""

    name: str
    chi2: Callable[[dict], jnp.ndarray]
    log_norm: Optional[Callable[[dict], jnp.ndarray]] = None
    meta: dict = field(default_factory=dict, repr=False)

    def log_like(self, p: dict):
        ll = -0.5 * self.chi2(p)
        if self.log_norm is not None:
            ll = ll + self.log_norm(p)
        return ll


def _identity_derive(p: dict) -> dict:
    return p


def make_log_prob(
    spec: ParamSpec,
    terms: Sequence[Term],
    derive: Callable[[dict], dict] = _identity_derive,
):
    """Jittable ``log_prob(theta[D]) -> scalar``.

    Out-of-bounds walkers return -inf without the reference's Python
    early-exit (bao/desi.py:98-102): the likelihood is evaluated
    unconditionally (SIMD lockstep over walkers) and masked, with a NaN
    guard so poisoned evaluations also map to -inf.
    """

    def log_prob(theta):
        # canonicalise once (host f64 inputs silently downcast to the
        # active precision instead of warning downstream)
        theta = jnp.asarray(theta)
        p = derive(spec.unpack(theta))
        ll = sum((t.log_like(p) for t in terms), start=jnp.zeros(()))
        ok = spec.in_bounds(theta) & jnp.isfinite(ll)
        neg_inf = jnp.asarray(-jnp.inf, dtype=ll.dtype)
        return jnp.where(ok, ll, neg_inf)

    return log_prob


def make_chi2_breakdown(
    spec: ParamSpec,
    terms: Sequence[Term],
    derive: Callable[[dict], dict] = _identity_derive,
):
    """Per-term chi^2 at a point — the reporting path (the reference
    prints per-probe chi^2 at the posterior median, e.g.
    quasars/qsr_desi.py log output)."""

    def breakdown(theta):
        theta = jnp.asarray(theta)
        p = derive(spec.unpack(theta))
        return {t.name: t.chi2(p) for t in terms}

    return breakdown
