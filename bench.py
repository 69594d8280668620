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
    # gradient-based sampler: near-independent draws/sec on the
    # flagship posterior (tau ~ 1, so effective samples ~ raw draws)
    "hmc": ("bao.desi_cmb_des5y", 8192),
}


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--config", default="flagship", choices=sorted(CONFIGS))
    ap.add_argument("--iters", type=int, default=50)
    args = ap.parse_args(argv)
    preset_name, n_walkers = CONFIGS[args.config]

    import jax
    import jax.numpy as jnp

    from cosmax.utils.cache import enable_compile_cache

    enable_compile_cache()

    from cosmax.configs import get_preset

    fit = get_preset(preset_name, model="wzcdm", fast=True)
    if args.config == "hmc":
        return _bench_hmc(fit, n_walkers)
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


def _bench_hmc(fit, n_chains):
    """Effective (near-independent) posterior draws/sec with the
    gradient-based sampler on the flagship joint. Adaptation runs
    once; the timed segment is the steady-state fixed-parameter path."""
    import jax

    from cosmax.samplers import HMCSampler
    from cosmax.samplers.diagnostics import autocorr_time

    n_samples = 128
    s = HMCSampler(fit.log_prob(), fit.spec.bounds, n_chains, max_leapfrog=16)
    # adapt + compile both programs, then time the fixed path FROM the
    # warmed-up ensemble (a fresh init with n_warmup=0 would have to
    # burn in at the converged-posterior step size — it can't)
    state, chain = s.run(jax.random.PRNGKey(0), 8, n_warmup=300)
    eps, im = s.step_size, s.inv_mass
    start = s.transform.to_x(state.y)
    _, chain = s.run(
        jax.random.PRNGKey(1), n_samples, n_warmup=0,
        initial=start, step_size=eps, inv_mass=im,
    )
    np.asarray(chain.samples[-1, :1])
    dt = float("inf")
    for k in range(3):
        t0 = time.perf_counter()
        _, chain = s.run(
            jax.random.PRNGKey(2 + k), n_samples, n_warmup=0,
            initial=start, step_size=eps, inv_mass=im,
        )
        np.asarray(chain.samples[-1, :1])
        dt = min(dt, time.perf_counter() - t0)
    tau = float(np.max(np.asarray(autocorr_time(np.asarray(chain.samples)))))
    ess_per_sec = n_chains * n_samples / max(tau, 1.0) / dt
    print(
        json.dumps(
            {
                "metric": "hmc_effective_samples_per_sec_chip",
                "value": round(ess_per_sec, 1),
                "unit": "eff samples/s",
                "vs_baseline": round(ess_per_sec / 1.0e6, 3),
                "tau": round(tau, 2),
                "accept": round(float(chain.acceptance_fraction), 3),
            }
        )
    )


if __name__ == "__main__":
    main()
