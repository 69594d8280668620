"""Transcription / reproducibility pre-check for validate.py CASES.

For every CASES row, evaluates the f64 parity-path chi^2 at the
PUBLISHED medians and prints it against the published chi^2. Sampled
parameters the docstring does not publish (e.g. dM in
bao/desi_union3_omh2.py) are profiled out by scipy minimisation over
the preset bounds. A |delta| beyond the published rounding flags either
a transcription slip in CASES or a published row the current reference
code cannot reproduce (then the sweep needs an `alt` attribution, as
for bao.desi_cmb lcdm/desi — see VALIDATION.md).

Usage: python tools/precheck_rows.py [--only SUBSTR]
"""

import argparse
import os
import sys

_HERE = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, os.path.dirname(_HERE))  # repo root (cosmax package)
sys.path.insert(0, _HERE)  # tools/ (validate.CASES)

# host-side f64 parity evaluation (f32 chi^2 error on the sharp CMB
# joints is ~0.1-0.5 — larger than the deltas being checked)
os.environ.setdefault("JAX_PLATFORMS", "cpu")
import jax  # noqa: E402

jax.config.update("jax_enable_x64", True)


def _half_last_digit(v):
    """Half of the published value's last printed decimal: the radius
    of its rounding interval."""
    s = f"{v:g}"
    dec = len(s.split(".")[1]) if "." in s else 0
    return 0.5 * 10.0 ** (-dec)


def refine_case(name, model, kwargs, published, chi2_pub, extra=None):
    """Minimum chi2 over the publication-rounding box around the
    published medians (each published param within half its last
    printed digit; unpublished sampled params fully free). On sharp
    high-dimensional joints, independent rounding of correlated
    medians moves the quoted point off the posterior ridge — if the
    box minimum reaches the published chi2, the row is
    rounding-consistent; if it cannot, the published row was produced
    by a different code variant (attribution needed)."""
    import numpy as np
    import jax.numpy as jnp
    from scipy.optimize import minimize

    from cosmax.configs import get_preset

    fit = get_preset(name, model, fast=False, **kwargs)
    breakdown = fit.chi2_breakdown()
    names = list(fit.spec.names)

    def chi2_vec(x):
        return float(
            sum(breakdown(jnp.asarray(x, dtype=jnp.float64)).values())
        )

    x0, lo, hi = [], [], []
    for i, p in enumerate(names):
        if p in published:
            med = published[p][0]
            r = _half_last_digit(med)
            x0.append(med)
            lo.append(med - r)
            hi.append(med + r)
        else:
            a, b = fit.spec.bounds[i]
            x0.append(0.5 * (a + b))
            lo.append(a)
            hi.append(b)
    res = minimize(
        chi2_vec, np.array(x0), method="Nelder-Mead",
        bounds=list(zip(lo, hi)),
        options={"xatol": 1e-9, "fatol": 1e-10, "maxiter": 20000,
                 "maxfev": 40000},
    )
    return float(res.fun)


def check_case(name, model, kwargs, published, chi2_pub, extra=None):
    import numpy as np
    import jax.numpy as jnp
    from scipy.optimize import minimize

    from cosmax.configs import get_preset

    fit = get_preset(name, model, fast=False, **kwargs)
    breakdown = fit.chi2_breakdown()
    names = list(fit.spec.names)
    fixed = {p: med for p, (med, _sig) in published.items() if p in names}
    free = [p for p in names if p not in fixed]

    def chi2_at(x_free):
        vals = dict(fixed)
        vals.update(zip(free, x_free))
        x = jnp.asarray([vals[p] for p in names], dtype=jnp.float64)
        return float(sum(breakdown(x).values()))

    if free:
        lo = [fit.spec.bounds[names.index(p), 0] for p in free]
        hi = [fit.spec.bounds[names.index(p), 1] for p in free]
        x0 = np.array([0.5 * (a + b) for a, b in zip(lo, hi)])
        res = minimize(chi2_at, x0, method="Nelder-Mead",
                       options={"xatol": 1e-6, "fatol": 1e-8, "maxiter": 4000})
        chi2 = float(res.fun)
        prof = dict(zip(free, [float(v) for v in res.x]))
    else:
        chi2 = chi2_at([])
        prof = {}
    return chi2, prof


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--only", default=None)
    ap.add_argument("--refine", action="store_true",
                    help="for rows beyond the flag threshold, also "
                    "minimize chi2 over the publication-rounding box "
                    "(see refine_case docstring)")
    args = ap.parse_args(argv)

    from validate import CASES  # noqa: E402 (sys.path above)

    bad = 0
    for case in CASES:
        name, model, kwargs, published, chi2_pub = case[:5]
        label = f"{name}[{model}]" + (str(kwargs) if kwargs else "")
        if args.only and args.only not in label:
            continue
        if chi2_pub is None:
            print(f"{label:60s}  (no published chi2)")
            continue
        try:
            chi2, prof = check_case(*case[:5], *case[5:])
        except Exception as e:
            print(f"{label:60s}  ERROR {e}")
            bad += 1
            continue
        d = chi2 - chi2_pub
        # ~0.3-0.4 is the natural scale of published-median rounding on
        # the multi-nuisance joints (measured on rows already validated
        # at z<=0.08 by the sweep, e.g. bao.desi_cc lcdm d=+0.31);
        # transcription slips produce deltas of tens
        flag = "" if abs(d) < 0.6 else "  <-- CHECK"
        if flag:
            bad += 1
        extra = f"  profiled {prof}" if prof else ""
        if flag and args.refine:
            box_min = refine_case(*case[:5], *case[5:])
            extra += (
                f"  rounding-box min {box_min:.3f}"
                f" ({'rounding-consistent' if box_min <= chi2_pub + 0.15 else 'NOT reachable'})"
            )
        print(f"{label:60s}  chi2@pub {chi2:8.3f}  pub {chi2_pub:8.2f}  "
              f"d {d:+.3f}{flag}{extra}")
    print(f"\n{bad} rows flagged")
    return 0


if __name__ == "__main__":
    sys.exit(main())
