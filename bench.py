"""Benchmark: full joint-likelihood evaluations/sec on one chip.

Measures the flagship three-probe joint (DESI DR2 BAO + CMB compression
+ DES-SN5YR, wzCDM — reference bao/desi_cmb_des5y.py) as batched
log-probability evaluations per second on the default JAX device,
against the BASELINE.json target of 1e6 evals/sec/chip
(vs_baseline = evals_per_sec / 1e6).

The measured function is the production fast path: GL-64 BAO distances,
GL-128 sound horizon, and the compressed Chebyshev-basis SN chi^2
(a 65-dim whitened quadratic form replacing the [W,1829] x [1829^2]
matmul — see cosmax/likelihoods/sn.py).

Prints exactly one JSON line.
"""

import json
import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    from cosmax.configs import get_preset

    fit = get_preset("bao.desi_cmb_des5y", model="wzcdm", fast=True)
    log_prob = jax.jit(jax.vmap(fit.log_prob()))

    n_walkers = 131072
    rng = np.random.default_rng(0)
    lo, hi = fit.spec.bounds[:, 0], fit.spec.bounds[:, 1]
    mid, span = 0.5 * (lo + hi), 0.05 * (hi - lo)
    walkers = jnp.asarray(
        (mid + span * rng.standard_normal((n_walkers, fit.spec.dim))).astype(
            np.float32
        )
    )

    # warm-up / compile (host fetch: the tunnel's block_until_ready
    # does not actually block, so np.asarray forces completion)
    np.asarray(log_prob(walkers))

    n_iters = 30
    t0 = time.perf_counter()
    out = None
    for i in range(n_iters):
        out = log_prob(walkers)
    np.asarray(out)
    dt = time.perf_counter() - t0

    evals_per_sec = n_walkers * n_iters / dt
    print(
        json.dumps(
            {
                "metric": "flagship_joint_logprob_evals_per_sec_chip",
                "value": round(evals_per_sec, 1),
                "unit": "evals/s",
                "vs_baseline": round(evals_per_sec / 1.0e6, 3),
            }
        )
    )


if __name__ == "__main__":
    main()
