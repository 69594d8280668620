"""Per-term throughput ablation of a preset's joint likelihood.

Measures the batched log-prob with each term removed in turn — the
difference attributes wall time per probe (the per-likelihood-eval
timing subsystem, SURVEY.md §5 "tracing/profiling: absent in the
reference").

Usage: python tools/profile_terms.py [--preset bao.desi_cmb_des5y]
       [--model wzcdm] [--walkers 131072] [--fast]
"""

import argparse
import sys
import time

sys.path.insert(0, ".")


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--preset", default="bao.desi_cmb_des5y")
    ap.add_argument("--model", default="wzcdm")
    ap.add_argument("--walkers", type=int, default=131072)
    ap.add_argument("--iters", type=int, default=50)
    ap.add_argument("--fast", action="store_true", default=True)
    ap.add_argument("--parity", dest="fast", action="store_false")
    ap.add_argument(
        "--cost",
        action="store_true",
        help="attribute XLA cost-analysis flops/bytes per term instead of "
        "wall time (platform-independent; this is how the fs8 Tucker cut "
        "was found — see ARCHITECTURE.md roofline section)",
    )
    args = ap.parse_args(argv)

    from dataclasses import replace

    import numpy as np
    import jax
    import jax.numpy as jnp

    from cosmax.configs import get_preset

    fit_full = get_preset(args.preset, args.model, fast=args.fast)
    rng = np.random.default_rng(0)
    lo, hi = fit_full.spec.bounds[:, 0], fit_full.spec.bounds[:, 1]
    mid, span = 0.5 * (lo + hi), 0.05 * (hi - lo)
    w = args.walkers
    walkers = jax.device_put(
        jnp.asarray(
            (mid + span * rng.standard_normal((w, fit_full.spec.dim))).astype(
                np.float32
            )
        )
    )

    def bench(fit):
        lp = jax.jit(jax.vmap(fit.log_prob()))
        np.asarray(lp(walkers))
        # best-of-3 like bench.py: the tunnel's per-dispatch latency
        # jitters run-to-run by up to ~2x, which would otherwise swamp
        # the leave-one-out differences this tool reports
        dt = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            out = None
            for _ in range(args.iters):
                out = lp(walkers)
            np.asarray(out)
            dt = min(dt, time.perf_counter() - t0)
        return dt / args.iters

    if args.cost:
        # reuse bench.py's hardened cost helper (handles list-returning
        # and cost-less backends)
        from bench import _cost_analysis

        def cost(fit):
            lp = jax.jit(jax.vmap(fit.log_prob()))
            flops, nbytes = _cost_analysis(lp, walkers)
            return (flops or 0.0) / w, (nbytes or 0.0) / w

        f_full, b_full = cost(fit_full)
        if not f_full:
            # _cost_analysis returns (None, None) when the backend's
            # cost_analysis() is unavailable — degrade, don't divide
            print("cost analysis unavailable on this backend; "
                  "use wall-time mode (drop --cost)")
            return
        print(
            f"full ({len(fit_full.terms)} terms): "
            f"{f_full:.0f} flops/eval, {b_full:.0f} logical bytes/eval"
        )
        for term in fit_full.terms:
            rest = tuple(t for t in fit_full.terms if t is not term)
            f_wo, b_wo = cost(replace(fit_full, terms=rest))
            bshare = (
                f" ({100 * (b_full - b_wo) / b_full:5.1f}%)" if b_full else ""
            )
            print(
                f"  {term.name:12s}: {f_full - f_wo:9.0f} flops "
                f"({100 * (f_full - f_wo) / f_full:5.1f}%)  "
                f"{b_full - b_wo:8.0f} bytes" + bshare
            )
        return

    t_full = bench(fit_full)
    print(
        f"full ({len(fit_full.terms)} terms): {t_full * 1e3:.2f} ms/iter, "
        f"{w / t_full:.3e} evals/s"
    )
    for term in fit_full.terms:
        rest = tuple(t for t in fit_full.terms if t is not term)
        t_wo = bench(replace(fit_full, terms=rest))
        share = (t_full - t_wo) / t_full
        print(
            f"  {term.name:12s}: {1e3 * (t_full - t_wo):+7.2f} ms "
            f"({100 * share:5.1f}% of total)"
        )


if __name__ == "__main__":
    main()
