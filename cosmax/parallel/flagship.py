"""Mesh-sharded joint log-probability for large-covariance fits.

Splits a FitSpec's terms into cheap scalar terms (BAO, CMB, priors —
vmapped over the walker axis) and large-N Gaussian terms (SN
compilations with ~1800^2 whiteners), whose chi^2 runs through the
explicit shard_map data-parallel matmul (cosmax.parallel.mesh
.data_sharded_chi2). Walker axis = 'w' (data parallel over walkers),
covariance rows = 'd' ("sequence"-parallel over data points); the chi^2
reduction is a psum over 'd' riding ICI.

This is the multi-chip training-step configuration validated by
``__graft_entry__.dryrun_multichip`` and used for pod-slice scaling of
the 1e5-walker north-star config (BASELINE.md).
"""

import numpy as np
import jax
import jax.numpy as jnp

from cosmax.parallel.mesh import data_sharded_chi2


def build_sharded_log_prob(fit, mesh, big_n_threshold: int = 100):
    """Batched log_prob(walkers[W, D]) -> [W] with walkers sharded over
    'w' and each large SN whitening matmul sharded over 'd'."""
    big = [
        t for t in fit.terms
        if "theory_mag" in t.meta and t.meta["n"] > big_n_threshold
    ]
    small = [t for t in fit.terms if t not in big]

    sharded_chi2 = [data_sharded_chi2(t.meta["linv"], mesh) for t in big]
    big_values = [jnp.asarray(np.asarray(t.meta["values"])) for t in big]

    def per_walker(theta):
        p = fit.derive(fit.spec.unpack(theta))
        ll = sum((t.log_like(p) for t in small), start=jnp.zeros(()))
        mags = tuple(t.meta["theory_mag"](p) for t in big)
        return ll, mags

    vmapped = jax.vmap(per_walker)

    def batched_log_prob(walkers):
        ll, mags = vmapped(walkers)
        for term, chi2_fn, values, mag in zip(big, sharded_chi2, big_values, mags):
            ll = ll - 0.5 * chi2_fn(values - mag)
        ok = fit.spec.in_bounds(walkers) & jnp.isfinite(ll)
        return jnp.where(ok, ll, jnp.asarray(-jnp.inf, dtype=ll.dtype))

    return batched_log_prob
