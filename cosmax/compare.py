"""Dark-energy model comparison: ``python -m cosmax.compare``.

The reference compares models informally — every analysis docstring
reports a "(Δ chi2 ...)" against its flat-ΛCDM block (e.g.
bao/desi_cmb_union3.py:292,321,352) and cosmic_chronometers/cc.py runs
one explicit log-likelihood-ratio test (cc.py:190-196). This driver
makes that a first-class, deterministic operation: for each model
family it runs the LM-Newton point fit and the Laplace approximation
(cosmax.samplers.optimize) and prints

    chi2_min, Δchi2 vs ΛCDM, k (sampled parameters), AIC, BIC,
    and the Laplace log-evidence (uniform prior over the preset's
    bounds box)

in seconds, with no MCMC. Runs in f64 on CPU (it is a host-side
analysis; the parameter spaces are <= 11-dim and the exactness of the
quadratic model matters more than device throughput).
"""

import argparse
import json
import os
import sys


def laplace_log_evidence(fit, x_map):
    """ln Z under the Laplace approximation with the preset's uniform
    prior: ln Z = logL(map) - ln V + (D/2) ln 2pi + 0.5 ln det cov.

    Exact for a Gaussian likelihood whose mass lies inside the bounds
    box (tests/test_compare.py pins this analytically).
    """
    import numpy as np

    from cosmax.samplers.optimize import laplace

    cov, _, _ = laplace(fit.log_prob(), x_map)
    d = fit.spec.dim
    log_l_map = float(fit.log_prob()(x_map))
    bounds = np.asarray(fit.spec.bounds, dtype=np.float64)
    log_volume = float(np.sum(np.log(bounds[:, 1] - bounds[:, 0])))
    sign, logdet = np.linalg.slogdet(cov)
    if sign <= 0:
        raise ValueError("Laplace covariance not positive definite")
    return log_l_map - log_volume + 0.5 * d * np.log(2.0 * np.pi) + 0.5 * logdet


def compare_models(
    preset: str,
    models,
    fast: bool = False,
    sampled_evidence: bool = False,
    seed: int = 0,
    n_replicates: int = 4,
    ss_until_stable: float = None,
    **preset_kwargs,
):
    """Point-fit + Laplace comparison across model families.

    Returns a list of per-model dicts (chi2_min, dchi2, k, aic, bic,
    log_evidence, params). With ``sampled_evidence=True`` each row
    additionally carries the exact stepping-stone ``log_evidence_ss``
    and ``log_evidence_ss_err`` — the cross-replicate scatter of
    ``n_replicates`` independent tempered ladders
    (cosmax.samplers.evidence), i.e. an error bar that covers per-rung
    equilibration bias, not just within-ladder MC noise. The check
    that the Laplace approximation is trustworthy for the posterior at
    hand. Stepping stone always runs on the fast-mode likelihood (the
    parity trapezoid graphs make ``jax.grad`` compile poorly; fast vs
    parity chi2 agree far below the MC error).
    """
    import numpy as np
    import jax
    import jax.numpy as jnp

    from cosmax.configs import get_preset
    from cosmax.samplers.optimize import map_fit, laplace

    rows = []
    for model in models:
        fit = get_preset(preset, model, fast=fast, **preset_kwargs)
        # posterior mode, not raw-chi2 minimum: identical for pure-chi2
        # fits, required for f_cc / scatter likelihoods whose chi^2
        # alone is minimised on a nuisance bound
        best, _, _ = map_fit(fit)
        x = np.asarray([best[n] for n in fit.spec.names], dtype=np.float64)
        _, sig, _ = laplace(fit.log_prob(), x)
        chi2_min = float(sum(fit.chi2_breakdown()(jnp.asarray(x)).values()))
        k = fit.spec.dim
        n = fit.data_size
        row = dict(
            model=model,
            chi2_min=chi2_min,
            k=k,
            n=n,
            aic=chi2_min + 2.0 * k,
            bic=chi2_min + k * float(np.log(n)) if n else None,
            log_evidence=laplace_log_evidence(fit, x),
            params={
                name: (float(v), float(s))
                for name, v, s in zip(fit.spec.names, x, sig)
            },
        )
        if sampled_evidence:
            from cosmax.samplers.evidence import stepping_stone_log_evidence

            ss_fit = (
                fit if fast
                else get_preset(preset, model, fast=True, **preset_kwargs)
            )
            res = stepping_stone_log_evidence(
                ss_fit.log_prob(), ss_fit.spec.bounds,
                key=jax.random.PRNGKey(seed),
                n_replicates=n_replicates,
                **({"until_stable": ss_until_stable}
                   if ss_until_stable is not None else {}),
            )
            row["log_evidence_ss"] = res.log_evidence
            row["log_evidence_ss_err"] = res.error
            row["ss_per_replicate"] = [float(t) for t in res.per_replicate]
            row["ss_acceptance"] = res.acceptance
            row["ss_max_rung_rhat"] = float(np.max(res.rung_rhat))
            if res.converged is not None:
                row["ss_converged"] = bool(res.converged)
                row["ss_history"] = [list(h) for h in res.history]
                row["ss_budget"] = [res.n_warmup, res.n_samples]
        rows.append(row)
    base = next((r for r in rows if r["model"] == "lcdm"), rows[0])
    for r in rows:
        r["dchi2"] = r["chi2_min"] - base["chi2_min"]
        r["dlog_evidence"] = r["log_evidence"] - base["log_evidence"]
        if sampled_evidence:
            r["dlog_evidence_ss"] = (
                r["log_evidence_ss"] - base["log_evidence_ss"]
            )
    return rows


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--preset", required=True)
    p.add_argument("--models", default="lcdm,wcdm,wzcdm,w0wacdm",
                   help="comma-separated model families")
    p.add_argument("--fast", action="store_true",
                   help="use the fast-mode (GL/compressed) likelihoods")
    p.add_argument("--json", dest="json_out", default=None,
                   help="also write the table as JSON")
    p.add_argument("--sampled-evidence", action="store_true",
                   help="also compute the exact evidence by "
                        "stepping-stone sampling (tempered-ladder HMC; "
                        "~20s per model on CPU) next to the Laplace one")
    p.add_argument("--replicates", type=int, default=4,
                   help="independent stepping-stone ladders; the "
                        "printed ± is their cross-replicate scatter")
    p.add_argument("--ss-until-stable", type=float, default=None,
                   metavar="NATS",
                   help="double the stepping-stone budget until the "
                        "replicate-mean ln Z moves less than NATS "
                        "(e.g. 0.1) between budgets; rows then print "
                        "their convergence status")
    p.add_argument("--seed", type=int, default=0)
    args = p.parse_args(argv)

    # Host-side analysis: force CPU + f64 before jax initialises.
    # Save/restore the global config — tests invoke main() in-process,
    # and leaking x64 into the rest of a pytest session makes later
    # f32 tests order-dependent.
    prev_env = os.environ.get("JAX_PLATFORMS")
    os.environ["JAX_PLATFORMS"] = "cpu"
    import jax

    prev_x64 = jax.config.jax_enable_x64
    prev_platforms = jax.config.jax_platforms
    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_enable_x64", True)
    try:
        from cosmax.utils.cache import enable_compile_cache

        enable_compile_cache()

        rows = compare_models(
            args.preset,
            [m.strip() for m in args.models.split(",") if m.strip()],
            fast=args.fast, sampled_evidence=args.sampled_evidence,
            seed=args.seed, n_replicates=args.replicates,
            ss_until_stable=args.ss_until_stable,
        )
    finally:
        jax.config.update("jax_enable_x64", prev_x64)
        # restoring None is valid (it means "auto-select"): skipping it
        # would leak the cpu pin into the rest of an in-process session
        jax.config.update("jax_platforms", prev_platforms)
        if prev_env is None:
            os.environ.pop("JAX_PLATFORMS", None)
        else:
            os.environ["JAX_PLATFORMS"] = prev_env
    ss_hdr = "  ss: ln Z - ln Z_lcdm" if args.sampled_evidence else ""
    hdr = (f"{'model':10s} {'chi2_min':>9s} {'dchi2':>7s} {'k':>2s} "
           f"{'AIC':>9s} {'BIC':>9s} {'ln Z - ln Z_lcdm':>17s}{ss_hdr}")
    print(hdr)
    print("-" * len(hdr))
    for r in rows:
        bic = f"{r['bic']:9.2f}" if r["bic"] is not None else "      n/a"
        ss = (
            f"  {r['dlog_evidence_ss']:+12.2f} ±{r['log_evidence_ss_err']:.2f}"
            if args.sampled_evidence else ""
        )
        if args.sampled_evidence:
            ss += f"  rhat={r['ss_max_rung_rhat']:.3f}"
            if "ss_converged" in r:
                ss += (
                    f"  {'converged' if r['ss_converged'] else 'NOT converged'}"
                    f" @ warmup={r['ss_budget'][0]},samples={r['ss_budget'][1]}"
                )
        print(
            f"{r['model']:10s} {r['chi2_min']:9.2f} {r['dchi2']:+7.2f} "
            f"{r['k']:2d} {r['aic']:9.2f} {bic} {r['dlog_evidence']:+17.2f}{ss}"
        )
        best = "  ".join(
            f"{n}={v:.4g}±{s:.2g}" for n, (v, s) in r["params"].items()
        )
        print(f"           {best}")
    if args.json_out:
        with open(args.json_out, "w") as f:
            json.dump(rows, f, indent=1)
        print(f"# wrote {args.json_out}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
