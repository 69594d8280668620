"""Standardised-quasar likelihood (Lusso+2020 binned Hubble diagram).

Diagonal Gaussian with an intrinsic-scatter nuisance ``s`` added in
quadrature and a magnitude offset ``dM_qsr``:

    chi^2 = sum d_i^2 / (sigma_i^2 + s^2),
    log L = -0.5 (chi^2 + sum ln(sigma_i^2 + s^2))

(reference quasars/qsr_desi.py:68-80). The distance modulus uses the
fixed-H0 cumulative-trapezoid scheme on a 3000-pt grid
(qsr_desi.py:25-32).
"""

import numpy as np
import jax.numpy as jnp

from cosmax.constants import C_KM_S
from cosmax.likelihoods.base import Term
from cosmax.models.background import e_of_z
from cosmax.ops.quadrature import cumtrapz


def build_quasar_term(
    z,
    mu,
    sigma_mu,
    model: str,
    h0: float = 70.0,
    offset_param: str = "dM_qsr",
    scatter_param: str = "s",
    grid_num: int = 3000,
    name: str = "quasars",
) -> Term:
    from cosmax.likelihoods.fastmode import fast_mode

    z = np.asarray(z, dtype=np.float64)
    mu = np.asarray(mu, dtype=np.float64)
    sigma_sq = np.asarray(sigma_mu, dtype=np.float64) ** 2
    z_grid = np.linspace(0.0, z.max(), num=grid_num)

    if fast_mode():
        # The mu(z_i; theta) curve is geometry-only (fixed h0), so it
        # rides the preset bundle's single shared contraction
        # (models.linear_chi2.make_curve_values): the per-eval
        # prefix-GL integrals + log10 of round 3 (2.3k flops and 63%
        # of the multiprobe joint's logical bytes, round-5 profile)
        # collapse to one [R, K] lift out of the shared coefficient
        # vector. The s-dependent diagonal metric — which is why this
        # term can't be a fixed quadratic form — is applied
        # analytically over the K bins below. Build-time tabulation
        # uses prefix-GL at double the runtime order (16 vs the
        # validated 8), f64, disk-cached.
        from cosmax.models.distances import make_prefix_comoving_integral
        from cosmax.models.emu_core import f64_build
        from cosmax.models.linear_chi2 import _hash_arrays, make_curve_values

        import jax

        p_ref = {"Om": 0.3, "w0": -1.0, "wa": 0.0}

        # mu_ref via the same machinery at the single reference point;
        # the integral fn is created INSIDE the f64 context so its GL
        # panel constants are exact f64 (make_prefix_comoving_integral
        # bakes its node arrays at creation dtype)
        with f64_build():
            prefix_ref = make_prefix_comoving_integral(z, model, order=16)
            mu_ref = np.asarray(
                25.0 + 5.0 * jnp.log10(
                    (1.0 + jnp.asarray(z)) * (C_KM_S / h0)
                    * prefix_ref(p_ref)
                ),
                np.float64,
            )

        def curve_fn(flat, to_params):
            prefix_integral = make_prefix_comoving_integral(z, model, order=16)

            def one(th):
                integral = prefix_integral(to_params(th))
                mu_th = 25.0 + 5.0 * jnp.log10(
                    (1.0 + jnp.asarray(z)) * (C_KM_S / h0) * integral
                )
                return mu_th - mu_ref

            return np.asarray(
                jax.vmap(one)(jnp.asarray(flat, jnp.float64)), np.float64
            )

        dmu = make_curve_values(
            model, curve_fn, "qsr",
            (_hash_arrays(z, mu_ref), float(h0), 16),
        )
        mu_ref_j = jnp.asarray(mu_ref)

        def mu_model(p):
            return mu_ref_j + dmu(p)

    else:

        def mu_model(p):
            inv_e = 1.0 / e_of_z(jnp.asarray(z_grid), p, model)
            integral = jnp.interp(z, z_grid, cumtrapz(inv_e, z_grid))
            return 25.0 + 5.0 * jnp.log10((1.0 + z) * (C_KM_S / h0) * integral)

    def chi2(p):
        delta = mu - mu_model(p) - p[offset_param]
        var = sigma_sq + p[scatter_param] ** 2
        return jnp.sum(delta**2 / var)

    def log_norm(p):
        var = sigma_sq + p[scatter_param] ** 2
        return -0.5 * jnp.sum(jnp.log(var))

    return Term(
        name=name,
        chi2=chi2,
        log_norm=log_norm,
        meta=dict(n=z.size, legend=f"Quasars - {z.size} bins", mu_model=mu_model),
    )
