"""Posterior-parity validation sweep.

Runs every preset whose full data is available end-to-end (fast-mode
likelihoods, reference move mixture) and compares posterior medians /
1-sigma widths and chi^2 at the median against the reference's
published docstring results (BASELINE.md). Writes VALIDATION.md.

Usage: python tools/validate.py [--out VALIDATION.md] [--quick]
"""

import argparse
import sys
import time

sys.path.insert(0, ".")

# (preset, model, kwargs, published{param: (median, sigma)}, chi2_pub)
CASES = [
    ("bao.desi", "lcdm", {},
     {"h": (0.690, 0.005), "Om": (0.298, 0.009)}, 10.27),
    ("bao.desi", "wzcdm", {},
     {"h": (0.670, 0.016), "Om": (0.308, 0.012), "w0": (-0.832, 0.12)}, 8.44),
    ("bao.sdss", "lcdm", {},
     {"h": (0.688, 0.007), "Om": (0.294, 0.016)}, 11.81),
    ("sn.union3", "lcdm", {},
     {"dM": (-0.070, 0.086), "Om": (0.357, 0.027)}, 24.0),
    ("cmb.cmb", "lcdm", {"compression": "chen"},
     {"H0": (67.40, 0.61), "Om": (0.3167, 0.0085), "Obh2": (0.02236, 0.00015)},
     None),
    ("cmb.cmb", "lcdm", {"compression": "desi"},
     {"H0": (67.50, 0.59), "Om": (0.3119, 0.0081), "Obh2": (0.02223, 0.00014)},
     None),
    ("cmb.cmb", "lcdm", {"compression": "act"},
     {"H0": (67.23, 0.51), "Om": (0.3170, 0.0073)}, None),
    ("cmb.cmb", "lcdm", {"compression": "union3"},
     {"H0": (67.39, 0.59), "Om": (0.3148, 0.0083)}, None),
    ("cc.cc", "lcdm", {},
     {"H0": (67.1, 3.8), "Om": (0.317, 0.039), "f_cc": (0.70, 0.10)}, 30.39),
    ("bao.desi_omh2", "lcdm", {},
     {"h": (0.693, 0.010), "Om": (0.298, 0.009), "rd": (146.48, 1.33)}, 10.27),
    ("bao.desi_bbn", "lcdm", {},
     {"H0": (68.45, 0.44), "Obh2": (0.02190, 0.00024), "Om": (0.2976, 0.0086)},
     10.29),
    ("bao.desi_bbn_theta_star", "lcdm", {},
     {"rd": (148.33, 0.79), "H0": (68.45, 0.65), "Om": (0.2974, 0.009)}, 10.29),
    ("bao.desi_omh2_theta_star", "lcdm", {},
     {"H0": (69.34, 1.02), "Om": (0.297, 0.009), "rd": (146.43, 1.33)}, 10.28),
    ("bao.desi_cc", "lcdm", {},
     {"f_cc": (0.70, 0.10), "H0": (69.1, 2.4), "rd": (146.9, 5.1),
      "Om": (0.299, 0.009)}, 40.55),
    ("bao.desi_union3", "lcdm", {},
     {"dM": (-0.119, 0.089), "H0": (68.69, 0.47), "Om": (0.304, 0.008)}, 38.82),
    ("bao.desi_union3", "w0wacdm", {},
     {"dM": (-0.166, 0.091), "H0": (66.23, 0.92), "Om": (0.330, 0.017),
      "w0": (-0.700, 0.114), "wa": (-0.996, 0.568)}, 28.79),
    ("bao.desi_union3_cc", "lcdm", {},
     {"f_cc": (0.70, 0.10), "dM": (-0.118, 0.09), "H0": (68.7, 2.3),
      "rd": (147.0, 5.0), "Om": (0.304, 0.008)}, 69.1),
    ("bao.desi_union3_omh2", "lcdm", {},
     {"rd": (147.32, 1.27), "H0": (68.59, 0.98), "Om": (0.304, 0.008)}, 38.8),
    # (published r_d = 146.89 there is a derived quantity — r_drag
    # formula — not a sampled parameter)
    ("bao.desi_union3_bbn", "lcdm", {},
     {"H0": (68.79, 0.60), "Obh2": (0.02218, 0.00055), "dM": (-0.116, 0.09)},
     38.8),
    ("bao.desi_cmb", "lcdm", {"compression": "desi"},
     {"rd": (148.41, 0.51), "H0": (68.01, 0.43), "Om": (0.3051, 0.006),
      "Obh2": (0.02231, 0.0002)}, 11.76),
    ("sn.union3_cmb", "lcdm", {},
     {"H0": (67.11, 0.57), "Om": (0.319, 0.008), "dM": (-0.167, 0.09)}, 26.2),
    ("cc.cc_union3", "lcdm", {},
     {"f_cc": (0.70, 0.1), "dM": (-0.202, 0.09), "H0": (65.9, 2.6),
      "Om": (0.349, 0.025)}, 54.25),
    ("qsr.desi", "lcdm", {},
     {"dM_qsr": (-0.197, 0.087), "s": (0.408, 0.07), "rd": (144.86, 1.05),
      "Om": (0.299, 0.009)}, 29.93),
    ("qsr.union3", "lcdm", {},
     {"dM_qsr": (-0.099, 0.09), "s": (0.382, 0.07), "dM": (-0.068, 0.09),
      "Om": (0.370, 0.028)}, 44.00),
    ("fs8.fs8", "lcdm", {},
     {"Om": (0.268, 0.020), "sigma8": (0.789, 0.015), "f_err": (0.78, 0.07)},
     62.73),
]


def run_case(name, model, kwargs, published, chi2_pub, quick=False):
    import numpy as np
    import jax

    from cosmax.configs import get_preset
    from cosmax.samplers import EnsembleSampler
    from cosmax.samplers.ensemble import uniform_init
    from cosmax.report import summarize

    fit = get_preset(name, model, fast=True, **kwargs)
    n_walkers = min(fit.n_walkers, 128) if quick else fit.n_walkers
    if n_walkers % 2:
        n_walkers += 1
    n_steps = min(fit.n_steps, 1200) if quick else min(fit.n_steps, 3000)
    seed = fit.seed or 0
    sampler = EnsembleSampler(fit.log_prob(), n_walkers, fit.spec.dim,
                              moves=fit.moves)
    k1, k2 = jax.random.split(jax.random.PRNGKey(seed))
    init = uniform_init(k1, fit.spec.bounds, n_walkers)
    t0 = time.time()
    state, chain = sampler.run(k2, init, n_steps)
    np.asarray(chain.samples)  # force completion
    dt = time.time() - t0
    summ = summarize(fit, chain, discard=min(fit.burn_in, n_steps // 4))
    rows = []
    worst = 0.0
    for pname, (med_pub, sig_pub) in published.items():
        got = summ["params"][pname]
        sig_got = 0.5 * (got["plus"] + got["minus"])
        zscore = abs(got["median"] - med_pub) / sig_pub
        worst = max(worst, zscore)
        rows.append(
            (pname, med_pub, sig_pub, got["median"], sig_got, zscore)
        )
    chi2_got = summ["chi2_total"]
    return dict(
        preset=name, model=model, kwargs=kwargs, rows=rows,
        chi2_pub=chi2_pub, chi2_got=chi2_got, worst_z=worst,
        walltime=dt, acceptance=summ["acceptance_fraction"],
        ess=summ["effective_samples"],
    )


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="VALIDATION.md")
    ap.add_argument("--quick", action="store_true")
    ap.add_argument("--only", default=None, help="substring filter")
    args = ap.parse_args(argv)

    results = []
    for case in CASES:
        label = f"{case[0]}[{case[1]}]" + (str(case[2]) if case[2] else "")
        if args.only and args.only not in label:
            continue
        print(f"=== {label}", flush=True)
        try:
            r = run_case(*case, quick=args.quick)
            results.append(r)
            print(
                f"    worst |dmedian|/sigma_pub = {r['worst_z']:.3f}, "
                f"chi2 {r['chi2_got']:.2f} (pub {r['chi2_pub']}), "
                f"{r['walltime']:.0f}s",
                flush=True,
            )
        except Exception as e:
            import traceback

            traceback.print_exc()
            results.append(dict(preset=case[0], model=case[1], error=str(e)))

    lines = [
        "# VALIDATION — posterior parity vs published reference results",
        "",
        "Generated by tools/validate.py: each config sampled end-to-end with",
        "the fast-mode likelihoods and the reference's move mixture; medians",
        "compared against the reference docstrings (BASELINE.md).",
        "`z` = |median_cosmax - median_published| / sigma_published — the",
        "0.1-sigma parity target (BASELINE.json) means z <~ 0.1 up to the",
        "published medians' own rounding and MCMC noise.",
        "",
        "| config | param | published | cosmax | z |",
        "|---|---|---|---|---|",
    ]
    summary_rows = []
    for r in results:
        if "error" in r:
            lines.append(f"| {r['preset']} [{r['model']}] | — | ERROR {r['error']} | | |")
            continue
        label = f"{r['preset']} [{r['model']}]"
        if r["kwargs"]:
            label += f" {r['kwargs']}"
        for i, (pname, mp, sp, mg, sg, z) in enumerate(r["rows"]):
            lines.append(
                f"| {label if i == 0 else ''} | {pname} | "
                f"{mp:g} ± {sp:g} | {mg:.4f} ± {sg:.4f} | {z:.2f} |"
            )
        chi2_pub = f"{r['chi2_pub']:g}" if r["chi2_pub"] is not None else "—"
        lines.append(
            f"| | chi2@median | {chi2_pub} | {r['chi2_got']:.2f} | |"
        )
        summary_rows.append((label, r["worst_z"]))
    lines.append("")
    lines.append("## Summary")
    lines.append("")
    lines.append("| config | worst z |")
    lines.append("|---|---|")
    for label, worst in summary_rows:
        lines.append(f"| {label} | {worst:.2f} |")
    with open(args.out, "w") as f:
        f.write("\n".join(lines) + "\n")
    print(f"wrote {args.out}")


if __name__ == "__main__":
    main()
