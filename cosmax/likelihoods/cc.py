"""Cosmic-chronometer H(z) likelihood with the error-rescaling nuisance
parameter f.

The CC covariance is believed overestimated; the reference fits a scale
factor with two (inconsistent) conventions that we reproduce exactly:

* ``divide`` — chi^2 = f^-2 d^T C^-1 d with normalisation
  N ln 2pi + ln|C| + 2N ln f (cosmic_chronometers/cc.py:40-55);
  the fitted f ~ 0.70 means errors inflated by 1/f.
* ``multiply`` — chi^2 = f^2 d^T C^-1 d with normalisation
  N ln 2pi + ln|C| - 2N ln f (cosmic_chronometers/cc_des5y.py:58-79).

With ``f_param=None`` the plain Gaussian chi^2 is used (the "CC without
f" variant, cc.py docstring block).
"""

import numpy as np
import jax.numpy as jnp

from cosmax.likelihoods.base import Term
from cosmax.models.background import hubble
from cosmax.ops.linalg import chi2_from_whitener
from cosmax.data.loaders import CovDataset


def build_cc_term(
    dataset: CovDataset,
    model: str,
    f_param: str = None,
    convention: str = "divide",
    name: str = "cc",
) -> Term:
    z = np.asarray(dataset.z, dtype=np.float64)
    h_obs = np.asarray(dataset.values, dtype=np.float64)
    linv = dataset.linv
    logdet = dataset.log_det
    n = dataset.n
    if convention not in ("divide", "multiply"):
        raise ValueError(convention)

    def base_chi2(p):
        return chi2_from_whitener(linv, h_obs - hubble(z, p, model))

    meta = dict(
        n=n,
        legend=dataset.legend,
        plot_kind="cc",
        z=z,
        values=h_obs,
        errors=np.sqrt(np.diag(dataset.cov)),
        theory_curve=lambda p, zg: hubble(jnp.asarray(zg), p, model),
    )
    if f_param is None:
        return Term(name=name, chi2=base_chi2, meta=meta)

    def chi2(p):
        f = p[f_param]
        scale = f**-2 if convention == "divide" else f**2
        return scale * base_chi2(p)

    # Constant part folded at build time in f64 (keeps the fast f32 path
    # from rounding the large N ln 2pi + ln|C| constant).
    const_norm = -0.5 * (n * np.log(2.0 * np.pi) + logdet)
    sign = 1.0 if convention == "divide" else -1.0

    def log_norm(p):
        return const_norm - sign * n * jnp.log(p[f_param])

    return Term(name=name, chi2=chi2, log_norm=log_norm, meta=meta)
