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

import argparse
import json
import time

import numpy as np

CONFIGS = {
    # metric-name suffix: (preset, walkers) — 262144 walkers amortise
    # per-dispatch overhead best on the v5e (batch sweep: 65k/131k/262k/
    # 524k gave 55/66/83/61 M evals/s best-of-3)
    "flagship": ("bao.desi_cmb_des5y", 262144),
    "multiprobe": ("joint.multiprobe", 131072),
}


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--config", default="flagship", choices=sorted(CONFIGS))
    ap.add_argument("--iters", type=int, default=50)
    args = ap.parse_args(argv)
    preset_name, n_walkers = CONFIGS[args.config]

    import os

    import jax
    import jax.numpy as jnp

    from cosmax.utils.cache import enable_compile_cache

    enable_compile_cache()

    from cosmax.configs import get_preset

    fit = get_preset(preset_name, model="wzcdm", fast=True)
    log_prob = jax.jit(jax.vmap(fit.log_prob()))

    rng = np.random.default_rng(0)
    lo, hi = fit.spec.bounds[:, 0], fit.spec.bounds[:, 1]
    mid, span = 0.5 * (lo + hi), 0.05 * (hi - lo)
    # explicit device_put: without it the tunnel re-uploads the 10 MB
    # batch on every dispatch (measured ~40% throughput loss)
    walkers = jax.device_put(
        jnp.asarray(
            (mid + span * rng.standard_normal((n_walkers, fit.spec.dim))).astype(
                np.float32
            )
        )
    )

    # warm-up / compile (host fetch: the tunnel's block_until_ready
    # does not actually block, so np.asarray forces completion)
    np.asarray(log_prob(walkers))

    # best-of-3: the tunnel's per-dispatch latency jitters run-to-run
    # by up to ~2x; the minimum is the honest device throughput
    n_iters = args.iters
    dt = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        out = None
        for i in range(n_iters):
            out = log_prob(walkers)
        np.asarray(out)
        dt = min(dt, time.perf_counter() - t0)

    evals_per_sec = n_walkers * n_iters / dt
    metric = f"{args.config}_joint_logprob_evals_per_sec_chip"
    print(
        json.dumps(
            {
                "metric": metric,
                "value": round(evals_per_sec, 1),
                "unit": "evals/s",
                "vs_baseline": round(evals_per_sec / 1.0e6, 3),
            }
        )
    )


if __name__ == "__main__":
    main()
