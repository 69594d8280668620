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
    python tools/warmup_sweep.py --suite [--seeds 20]

Prints one line per seed (rejuvenated count, retries) and a final
summary: seeds whose first warmup failed the health check (identical
to "seeds with retries" by construction — a retry fires iff the first
warmup failed) and seeds still unhealthy after the retry budget.

``--suite`` sweeps the three qualitatively distinct hard posteriors
(VERDICT r3 item 4 — one historically-worst case does not generalize):
the w0waCDM banana, the flagship CMB-sharpened joint, and a
nuisance-heavy CC+SN joint with the f_cc/H0/rd degeneracy; one summary
JSON line per posterior (the VALIDATION.md warmup-robustness table).
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


# the three qualitatively distinct warmup stressors (see module doc)
SUITE = [
    ("bao.desi_union3", "w0wacdm"),   # the banana (historically worst)
    ("bao.desi_cmb_des5y", "lcdm"),   # flagship: CMB-sharpened joint
    ("cc.cc_union3", "lcdm"),         # nuisance-heavy: f_cc/H0/rd ridge
]


def sweep(preset, model, seeds, chains, warmup, samples):
    import jax
    import numpy as np

    from cosmax.configs import get_preset
    from cosmax.samplers import HMCSampler
    from cosmax.samplers.optimize import map_jitter_init

    fit = get_preset(preset, model, fast=True)
    sampler = HMCSampler(fit.log_prob(), fit.spec.bounds, chains)
    print(f"# {preset} [{model}], {chains} chains, "
          f"warmup {warmup}, devices {jax.devices()}")

    first_fail = 0
    exhausted = 0
    for seed in range(seeds):
        k_init, k_run = jax.random.split(jax.random.PRNGKey(seed))
        initial = map_jitter_init(fit, k_init, chains)
        t0 = time.time()
        state, chain = sampler.run(
            k_run, samples, n_warmup=warmup, initial=initial
        )
        np.asarray(chain.samples[-1, :1])
        dt = time.time() - t0
        n_rej = sampler.n_rejuvenated
        n_ret = sampler.warmup_retries
        frac = n_rej / chains
        # a retry happened iff the FIRST warmup failed the health check
        first_fail += n_ret > 0
        exhausted += n_ret >= 2 and frac > 0.2
        print(f"seed {seed:2d}: rejuvenated {n_rej:4d}/{chains} "
              f"({frac:5.1%}), retries {n_ret}, "
              f"divergent {int(np.asarray(chain.n_divergent))}, {dt:.1f}s")
    summary = {
        "preset": preset, "model": model,
        "seeds": seeds, "chains": chains,
        "warmup": warmup,
        "first_warmup_failures": first_fail,  # == seeds with retries
        "seeds_still_unhealthy_after_retries": exhausted,
    }
    print(json.dumps(summary))
    return summary


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--preset", default="bao.desi_union3")
    ap.add_argument("--model", default="w0wacdm")
    ap.add_argument("--suite", action="store_true",
                    help="sweep all three stressor posteriors")
    ap.add_argument("--seeds", type=int, default=20)
    ap.add_argument("--chains", type=int, default=128)
    ap.add_argument("--warmup", type=int, default=800)
    ap.add_argument("--samples", type=int, default=8,
                    help="post-warmup draws (tiny: health is a warmup "
                         "property)")
    args = ap.parse_args(argv)

    from cosmax.utils.cache import enable_compile_cache

    enable_compile_cache()

    jobs = SUITE if args.suite else [(args.preset, args.model)]
    for preset, model in jobs:
        sweep(preset, model, args.seeds, args.chains, args.warmup,
              args.samples)
    return 0


if __name__ == "__main__":
    import sys

    sys.exit(main())
