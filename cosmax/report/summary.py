"""Posterior summaries matching the reference's per-run reporting
(SURVEY.md SS2.6): median +/- percentile errors, chi^2 at the median,
dof, acceptance, autocorrelation time, ESS, R-hat, skew/kurtosis of the
first probe's residuals, correlation matrix, and derived parameters
(Om h^2, z_eq, z*, z_drag, r*, r_d, S8) where the sampled parameters
allow them — emitted as a JSON-able dict instead of ANSI prints.
"""

import numpy as np

from cosmax.samplers.diagnostics import (
    autocorr_time,
    effective_samples,
    gelman_rubin,
    percentile_summary,
    correlation_matrix,
)
from cosmax.models import recombination as rec


def _scalar_stats(x):
    p16, p50, p84 = np.percentile(x, [15.9, 50, 84.1])
    return {"median": p50, "plus": p84 - p50, "minus": p50 - p16}


def derived_posteriors(fit, flat):
    """Derived-parameter posteriors as in cmb/cmb.py:98-116 and
    fs8/fs8.py:159-160 (S8)."""
    names = fit.spec.names
    cols = {n: flat[:, i] for i, n in enumerate(names)}
    out = {}
    comp = next(
        (t.meta.get("compression") for t in fit.terms if t.meta.get("compression")),
        None,
    )
    if "H0" in cols or "h" in cols:
        h = cols["h"] if "h" in cols else cols["H0"] / 100.0
        if "Om" in cols:
            omh2 = cols["Om"] * h**2
            out["Omh2"] = _scalar_stats(omh2)
            if comp is not None:
                # z_eq = -1 + wm / (Or h^2), per-sample (cmb/cmb.py:101)
                out["z_eq"] = _scalar_stats(-1.0 + omh2 / comp.omega_r_h2())
            if "Obh2" in cols:
                wb = cols["Obh2"]
                # z* follows the compression's variant; z_drag is ALWAYS
                # the Aizpuru A2 formula — even the union3 compression,
                # whose z* is Hu-Sugiyama, uses A2 for the drag epoch
                # (data_union3_compression.py:88-103)
                zs_fn = (
                    rec.z_star_hu
                    if comp is not None and comp.z_star_variant == "hu"
                    else rec.z_star
                )
                out["z_star"] = _scalar_stats(zs_fn(wb, omh2))
                out["z_drag"] = _scalar_stats(rec.z_drag(wb, omh2))
                out["r_drag"] = _scalar_stats(rec.r_drag_aizpuru(wb, omh2))
                if comp is not None:
                    # r* / r_d from the sound-horizon integral at the
                    # posterior median, as the reference prints them
                    # (cmb/cmb.py:115-116)
                    med = {n: float(np.median(c)) for n, c in cols.items()}
                    p = fit.derive(dict(med))
                    h0 = float(p["H0"]) if "H0" in p else 100.0 * float(p["h"])
                    wb_m, wm_m = float(np.median(wb)), float(np.median(omh2))
                    for key, zz in (
                        ("r_star_median", float(zs_fn(wb_m, wm_m))),
                        ("r_d_median", float(rec.z_drag(wb_m, wm_m))),
                    ):
                        out[key] = {
                            "median": float(
                                rec.sound_horizon(
                                    zz, p, fit.model, h0, wb_m,
                                    o_gamma_h2=comp.o_gamma_h2,
                                )
                            ),
                            "plus": 0.0,
                            "minus": 0.0,
                        }
    if "sigma8" in cols and "Om" in cols:
        s8 = cols["sigma8"] * np.sqrt(cols["Om"] / 0.3)
        out["S8"] = _scalar_stats(s8)
    return out


def _residual_stats(fit, medians):
    """R^2, RMSD, skewness and kurtosis of each plottable probe's
    residuals at the posterior median (the reference prints these per
    run: sn/pantheon.py:116-142, bao/desi.py:151-162)."""
    from scipy import stats as sstats

    p = fit.derive(fit.spec.unpack(medians.astype(np.float64)))
    out = {}
    for term in fit.terms:
        kind = term.meta.get("plot_kind")
        try:
            if kind == "sn":
                theory = np.asarray(term.meta["theory_mag"](p))
            elif kind == "bao":
                z, qty = term.meta["z"], term.meta["quantity"]
                curve = term.meta["theory_curve"]
                theory = np.array(
                    [float(curve(p, np.array([zi]), int(q))[0]) for zi, q in zip(z, qty)]
                )
            elif kind == "cc":
                theory = np.asarray(term.meta["theory_curve"](p, term.meta["z"]))
            else:
                continue
            values = np.asarray(term.meta["values"])
            resid = values - theory
            ss_res = float(np.sum(resid**2))
            ss_tot = float(np.sum((values - values.mean()) ** 2))
            out[term.name] = dict(
                r2=1.0 - ss_res / ss_tot,
                rmsd=float(np.sqrt(np.mean(resid**2))),
                skewness=float(sstats.skew(resid)),
                kurtosis=float(sstats.kurtosis(resid)),
            )
        except KeyError:
            # a term whose meta lacks the plot contract simply has no
            # residual block; anything else (signature drift, bad
            # medians) must surface, not silently drop the statistics
            continue
    return out


def summarize(fit, chain, discard: int = None, thin: int = 1) -> dict:
    """Full summary dict for a finished chain."""
    discard = fit.burn_in if discard is None else discard
    samples = np.asarray(chain.samples)[discard::thin]
    flat = samples.reshape(-1, samples.shape[-1])
    names = fit.spec.names

    summ = percentile_summary(flat, names)
    medians = np.array([summ[n][0] for n in names])
    chis = {k: float(v) for k, v in fit.chi2_breakdown()(medians).items()}
    logp = float(fit.log_prob()(medians))

    try:
        taus = autocorr_time(samples)
        ess = float(effective_samples(samples, taus))
        taus = taus.tolist()
    except Exception:
        taus, ess = None, None

    out = {
        "preset": fit.name,
        "model": fit.model,
        "legend": " + ".join(
            str(t.meta.get("legend", t.name)) for t in fit.terms
        ),
        "params": {
            n: {"median": m, "plus": p, "minus": mi}
            for n, (m, p, mi) in summ.items()
        },
        "chi2": chis,
        "chi2_total": float(sum(chis.values())),
        "log_prob_at_median": logp,
        "dof": fit.dof,
        "acceptance_fraction": float(chain.acceptance_fraction),
        "autocorr_time": taus,
        "effective_samples": ess,
        "gelman_rubin": gelman_rubin(samples).tolist(),
        "correlation_matrix": correlation_matrix(flat).tolist(),
        "derived": derived_posteriors(fit, flat),
        "residual_stats": _residual_stats(fit, medians),
        "n_samples": int(flat.shape[0]),
    }
    return out


def format_summary(summary: dict) -> str:
    """Human-readable block in the reference's print style
    (bao/desi.py:156-162)."""
    lines = [
        f"{summary['legend']}  [{summary['preset']} / {summary['model']}]",
        "-" * 60,
    ]
    for name, s in summary["params"].items():
        lines.append(
            f"{name}: {s['median']:.4f} +{s['plus']:.4f} -{s['minus']:.4f}"
        )
    for name, s in summary.get("derived", {}).items():
        lines.append(
            f"{name} (derived): {s['median']:.4f} +{s['plus']:.4f} -{s['minus']:.4f}"
        )
    chi_parts = ", ".join(f"{k}={v:.2f}" for k, v in summary["chi2"].items())
    lines.append(f"Chi squared: {summary['chi2_total']:.2f} ({chi_parts})")
    lines.append(f"Degs of freedom: {summary['dof']}")
    for tname, rs in summary.get("residual_stats", {}).items():
        lines.append(
            f"{tname}: R^2={rs['r2']:.4f} RMSD={rs['rmsd']:.3f} "
            f"skew={rs['skewness']:.3f} kurtosis={rs['kurtosis']:.3f}"
        )
    lines.append(f"Acceptance fraction: {summary['acceptance_fraction']:.3f}")
    if summary["autocorr_time"] is not None:
        taus = ", ".join(f"{t:.1f}" for t in summary["autocorr_time"])
        lines.append(f"Autocorrelation time: [{taus}]")
        lines.append(f"Effective samples: {summary['effective_samples']:.0f}")
    rhat = ", ".join(f"{r:.4f}" for r in summary["gelman_rubin"])
    lines.append(f"Gelman-Rubin R-hat: [{rhat}]")
    return "\n".join(lines)
