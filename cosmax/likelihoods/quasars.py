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
        # prefix-GL comoving integrals at the bin redshifts replace the
        # reference's 3000-pt cumulative-trapezoid grid (~17x fewer
        # integrand evaluations, converged beyond the grid's own error)
        from cosmax.models.distances import make_prefix_comoving_integral

        prefix_integral = make_prefix_comoving_integral(z, model, order=8)

        def mu_model(p):
            integral = prefix_integral(p)
            return 25.0 + 5.0 * jnp.log10((1.0 + z) * (C_KM_S / h0) * integral)

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
