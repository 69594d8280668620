"""HMC warmup seed-robustness sweep.

Measures the warmup seed-failure rate on the hardest posterior in the
suite — the w0waCDM banana of the BAO+SN joints (reference
bao/desi_union3.py:282-355 records the w0waCDM rows) — where round-2's
pooled-mean dual averaging failed the warmup health check (>20% of
chains needing end-of-warmup rejuvenation) on ~1/5 of seeds and leaned
on full warmup retries. Per-chain dual averaging
(cosmax/samplers/hmc.py _da_update) is the principled fix; this sweep
is the measurement.

Usage::

    python tools/warmup_sweep.py [--preset bao.desi_union3]
        [--model w0wacdm] [--seeds 20] [--chains 128] [--warmup 800]

Prints one line per seed (rejuvenated count, retries) and a final
summary: seeds whose first warmup failed the health check (identical
to "seeds with retries" by construction — a retry fires iff the first
warmup failed) and seeds still unhealthy after the retry budget.
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--preset", default="bao.desi_union3")
    ap.add_argument("--model", default="w0wacdm")
    ap.add_argument("--seeds", type=int, default=20)
    ap.add_argument("--chains", type=int, default=128)
    ap.add_argument("--warmup", type=int, default=800)
    ap.add_argument("--samples", type=int, default=8,
                    help="post-warmup draws (tiny: health is a warmup "
                         "property)")
    args = ap.parse_args(argv)

    import jax
    import numpy as np

    from cosmax.utils.cache import enable_compile_cache

    enable_compile_cache()

    from cosmax.configs import get_preset
    from cosmax.samplers import HMCSampler
    from cosmax.samplers.optimize import map_jitter_init

    fit = get_preset(args.preset, args.model, fast=True)
    sampler = HMCSampler(fit.log_prob(), fit.spec.bounds, args.chains)
    print(f"# {args.preset} [{args.model}], {args.chains} chains, "
          f"warmup {args.warmup}, devices {jax.devices()}")

    first_fail = 0
    exhausted = 0
    for seed in range(args.seeds):
        k_init, k_run = jax.random.split(jax.random.PRNGKey(seed))
        initial = map_jitter_init(fit, k_init, args.chains)
        t0 = time.time()
        state, chain = sampler.run(
            k_run, args.samples, n_warmup=args.warmup, initial=initial
        )
        np.asarray(chain.samples[-1, :1])
        dt = time.time() - t0
        n_rej = sampler.n_rejuvenated
        n_ret = sampler.warmup_retries
        frac = n_rej / args.chains
        # a retry happened iff the FIRST warmup failed the health check
        first_fail += n_ret > 0
        exhausted += n_ret >= 2 and frac > 0.2
        print(f"seed {seed:2d}: rejuvenated {n_rej:4d}/{args.chains} "
              f"({frac:5.1%}), retries {n_ret}, "
              f"divergent {int(np.asarray(chain.n_divergent))}, {dt:.1f}s")
    print(json.dumps({
        "preset": args.preset, "model": args.model,
        "seeds": args.seeds, "chains": args.chains,
        "warmup": args.warmup,
        "first_warmup_failures": first_fail,  # == seeds with retries
        "seeds_still_unhealthy_after_retries": exhausted,
    }))
    return 0


if __name__ == "__main__":
    import sys

    sys.exit(main())
