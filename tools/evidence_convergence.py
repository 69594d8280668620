"""Flagship-scale stepping-stone convergence measurement.

Quantifies the absolute-lnZ systematic of the evidence ladder at
default budgets on the flagship joint (bao.desi_cmb_des5y — the
|ln L| ~ 1e3 sharp-posterior regime where the documented ~0.3-0.5 nat
systematic lives, cosmax/samplers/evidence.py accuracy paragraph) by
comparing three runs:

1. ``default`` — the static default budget (n_warmup=n_samples=300),
   R independent replicate ladders.
2. ``until_stable`` — the budget-doubling mode starting FROM the
   default budget: doubles (warmup, samples) until the replicate-mean
   ln Z moves < --threshold nats between consecutive budgets.
3. ``golden`` — one long-budget run (--golden-mult x the default,
   independent PRNG key) whose estimate stands in for the truth.

The numbers printed here back the accuracy-regime docstring in
evidence.py and the ARCHITECTURE.md evidence section; the pass/fail
criterion (VERDICT r3 item 3) is |until_stable - golden| within the
combined reported replicate errors.

Environment mirrors ``cosmax.compare --sampled-evidence``: x64
enabled, fast-mode likelihood, BoxTransform prior over the preset
bounds.

Usage::

    python tools/evidence_convergence.py [--preset bao.desi_cmb_des5y]
        [--model lcdm] [--replicates 4] [--threshold 0.1]
        [--golden-mult 16] [--seed 0]
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--preset", default="bao.desi_cmb_des5y")
    ap.add_argument("--model", default="lcdm")
    ap.add_argument("--replicates", type=int, default=4)
    ap.add_argument("--threshold", type=float, default=0.1)
    ap.add_argument("--golden-mult", type=int, default=16)
    ap.add_argument("--base-warmup", type=int, default=300)
    ap.add_argument("--base-samples", type=int, default=300)
    ap.add_argument("--max-doublings", type=int, default=4)
    ap.add_argument("--seed", type=int, default=0)
    args = ap.parse_args(argv)

    import jax
    import numpy as np

    jax.config.update("jax_enable_x64", True)

    from cosmax.configs import get_preset
    from cosmax.samplers.evidence import SteppingStone
    from cosmax.utils.cache import enable_compile_cache

    enable_compile_cache()

    fit = get_preset(args.preset, args.model, fast=True)
    bounds = np.asarray(fit.spec.bounds, dtype=np.float64)
    ss = SteppingStone(fit.log_prob(), bounds)
    print(
        f"# {args.preset} [{args.model}] rungs={ss.n_rungs} "
        f"chains={ss.n_chains} dim={ss.ndim} R={args.replicates} "
        f"devices={jax.devices()}"
    )

    def report(label, res, t0):
        rec = {
            "stage": label,
            "log_evidence": round(res.log_evidence, 4),
            "error": round(res.error, 4),
            "per_replicate": [round(float(t), 4) for t in res.per_replicate],
            "max_rung_rhat": round(float(np.max(res.rung_rhat)), 4),
            "acceptance": round(res.acceptance, 3),
            "wall_s": round(time.time() - t0, 1),
        }
        if res.converged is not None:
            rec["converged"] = bool(res.converged)
            rec["history"] = [
                [int(w), int(s), round(z, 4), round(e, 4)]
                for (w, s, z, e) in res.history
            ]
        print(json.dumps(rec), flush=True)
        return rec

    key = jax.random.PRNGKey(args.seed)
    k_def, k_stable, k_gold = jax.random.split(key, 3)

    t0 = time.time()
    default = ss.run(
        k_def, n_warmup=args.base_warmup, n_samples=args.base_samples,
        n_replicates=args.replicates,
    )
    r_def = report("default", default, t0)

    t0 = time.time()
    stable = ss.run(
        k_stable, n_warmup=args.base_warmup, n_samples=args.base_samples,
        n_replicates=args.replicates, until_stable=args.threshold,
        max_doublings=args.max_doublings,
    )
    r_stable = report("until_stable", stable, t0)

    t0 = time.time()
    golden = ss.run(
        k_gold,
        n_warmup=args.base_warmup * args.golden_mult,
        n_samples=args.base_samples * args.golden_mult,
        n_replicates=args.replicates,
    )
    r_gold = report("golden", golden, t0)

    d_def = default.log_evidence - golden.log_evidence
    d_stable = stable.log_evidence - golden.log_evidence
    tol = 2.0 * (stable.error + golden.error)
    summary = {
        "stage": "summary",
        "default_minus_golden": round(d_def, 4),
        "until_stable_minus_golden": round(d_stable, 4),
        "tolerance_2err": round(tol, 4),
        "pass": bool(abs(d_stable) <= max(tol, args.threshold)),
    }
    print(json.dumps(summary), flush=True)
    return 0 if summary["pass"] else 1


if __name__ == "__main__":
    sys.exit(main())
