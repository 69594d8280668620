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
    method: str = "direct",
) -> Term:
    """method 'direct' evaluates H(z) = H0 E(z) per walker (already
    quadrature-free); 'emulated' (the fast-mode default) notes the
    whitened residual Linv (H_obs - H0 E(z_i; theta)) is linear in H0
    and tabulates Linv E on the family's parameter grid
    (models.linear_chi2), collapsing the term to a rank-space
    contraction — no per-walker sqrt/exp chain over the 33 redshifts.
    The f rescaling wraps either path analytically."""
    from cosmax.likelihoods.fastmode import fast_mode

    z = np.asarray(dataset.z, dtype=np.float64)
    h_obs = np.asarray(dataset.values, dtype=np.float64)
    linv = dataset.linv
    logdet = dataset.log_det
    n = dataset.n
    if convention not in ("divide", "multiply"):
        raise ValueError(convention)

    if method == "direct" and fast_mode():
        method = "emulated"
    if method == "emulated":
        from cosmax.models.background import e_of_z
        from cosmax.models.linear_chi2 import _hash_arrays, make_linear_chi2
        import jax

        def curve_fn(flat, to_params):
            def one(theta):
                e = e_of_z(jnp.asarray(z), to_params(theta), model)
                return jnp.tensordot(jnp.asarray(linv), e, axes=(1, 0))

            return np.asarray(jax.vmap(one)(jnp.asarray(flat, jnp.float64)))

        u0 = np.asarray(linv, np.float64) @ h_obs
        base_chi2 = make_linear_chi2(
            model,
            curve_fn,
            tag=f"cc-{model}",
            key_extra=_hash_arrays(z, h_obs, linv),
            u0_c=u0,
            u0_sq=float(u0 @ u0),
            beta_fn=lambda p: p["H0"],
            beta_ref=70.0,
        )
    elif method == "direct":

        def base_chi2(p):
            return chi2_from_whitener(linv, h_obs - hubble(z, p, model))

    else:
        raise ValueError(f"unknown CC method {method!r}")

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
