"""CMB distance-prior (compressed) likelihoods.

Four published compressions, each bundling its own prior vector,
inverse covariance, and radiation constants (the reference keeps one
module per compression, cmb/data_*_compression.py):

* ``chen``   — Chen+2018 arXiv:1808.05724, observables (R, lA, wb)
               (cmb/data_chen_compression.py:9-24)
* ``act``    — Planck+ACT, Bansal+2025 arXiv:2502.07185
               (cmb/data_cmb_act_compression.py:9-25)
* ``desi``   — DESI DR2 arXiv:2503.14738, observables (theta*, wb, wm)
               (cmb/data_desi_compression.py:10-26)
* ``union3`` — Rubin+ arXiv:2311.12098, observables (R, 100 theta*, wb)
               (cmb/data_union3_compression.py:11-26)

The sound horizon rs(z*) and comoving distance to z* are fixed-order
Gauss-Legendre (cosmax.models.recombination) instead of the reference's
per-call adaptive scipy.quad — two O(100)-node fused reductions per
likelihood eval instead of re-entrant adaptive quadrature.
"""

from dataclasses import dataclass

import numpy as np
import jax.numpy as jnp

from cosmax.likelihoods.base import Term
from cosmax.models import recombination
from cosmax.ops.linalg import whitening_operator


@dataclass(frozen=True)
class Compression:
    name: str
    priors: np.ndarray
    inv_cov: np.ndarray
    o_gamma_h2: float
    n_eff: float
    observables: str  # 'R_lA_wb' | 'theta_wb_wm' | 'R_100theta_wb'
    # z* fitting formula: 'aizpuru' (arXiv:2106.00428 eq A4) everywhere
    # except the Union3 compression, which uses Hu & Sugiyama 1996
    # (reference cmb/data_union3_compression.py:89-97).
    z_star_variant: str = "aizpuru"

    def omega_r_h2(self) -> float:
        return self.o_gamma_h2 * (1.0 + 0.2271 * self.n_eff)


_OG_STD = (0.75 / 31500.0) * (2.7255 / 2.7) ** 4

COMPRESSIONS = {
    "chen": Compression(
        name="chen",
        priors=np.array([1.750235, 301.4707, 0.02235976]),
        inv_cov=np.array(
            [
                [94392.3971, -1360.4913, 1664517.2916],
                [-1360.4913, 161.4349, 3671.618],
                [1664517.2916, 3671.618, 79719182.5162],
            ]
        ),
        o_gamma_h2=_OG_STD,
        n_eff=3.046,
        observables="R_lA_wb",
    ),
    "act": Compression(
        name="act",
        priors=np.array([1.7504, 301.77, 0.022371]),
        inv_cov=np.linalg.inv(
            1e-8
            * np.array(
                [
                    [1559.83, -1325.41, -36.45],
                    [-1325.41, 714691.80, 269.77],
                    [-36.45, 269.77, 2.10],
                ]
            )
        ),
        o_gamma_h2=_OG_STD,
        n_eff=3.044,
        observables="R_lA_wb",
    ),
    "desi": Compression(
        name="desi",
        priors=np.array([0.01041, 0.02223, 0.14208]),
        inv_cov=np.linalg.inv(
            1e-9
            * np.array(
                [
                    [0.006621, 0.12444, -1.1929],
                    [0.12444, 21.344, -94.001],
                    [-1.1929, -94.001, 1488.4],
                ]
            )
        ),
        o_gamma_h2=_OG_STD,
        n_eff=3.044,
        observables="theta_wb_wm",
    ),
    "union3": Compression(
        name="union3",
        priors=np.array([1.7492768568335353, 1.039233410719115, 0.02239245]),
        inv_cov=np.array(
            [
                [92701.58172970748, 348041.8137694254, 1613445.8550364415],
                [348041.8137694254, 13114681.644682042, -3019007.1687636944],
                [1613445.8550364415, -3019007.1687636944, 80842256.32398143],
            ]
        ),
        o_gamma_h2=2.4729e-5,
        n_eff=3.04,
        observables="R_100theta_wb",
        z_star_variant="hu",
    ),
}


def cmb_observables(
    comp: Compression, p: dict, model: str, order: int = None,
    rs_order: int = 48, dc_order: int = 24,
):
    """The compression's observable vector at parameters ``p``
    (needs H0, Om, Obh2, and 'Or' for the radiation-aware E(z)).

    Mirrors cmb_distances of the matching reference module
    (cmb/data_chen_compression.py:85-93, data_desi_compression.py:52-58,
    data_union3_compression.py:53-59, data_cmb_act_compression.py:52-59).
    """
    if order is not None:  # explicit single order overrides both
        rs_order = dc_order = order
    h0, om, wb = p["H0"], p["Om"], p["Obh2"]
    wm = om * (h0 / 100.0) ** 2
    z_star_fn = (
        recombination.z_star_hu
        if comp.z_star_variant == "hu"
        else recombination.z_star
    )
    zstar = z_star_fn(wb, wm)
    rs_star = recombination.sound_horizon(
        zstar, p, model, h0, wb, order=rs_order, o_gamma_h2=comp.o_gamma_h2
    )
    dm_star = recombination.comoving_distance_to(zstar, p, model, h0, order=dc_order)
    from cosmax.constants import C_KM_S

    if comp.observables == "R_lA_wb":
        r = jnp.sqrt(om) * h0 * dm_star / C_KM_S
        la = jnp.pi * dm_star / rs_star
        return jnp.stack([r, la, wb])
    if comp.observables == "theta_wb_wm":
        theta = rs_star / dm_star
        return jnp.stack([theta, wb, wm])
    if comp.observables == "R_100theta_wb":
        r = jnp.sqrt(om) * h0 * dm_star / C_KM_S
        theta100 = 100.0 * rs_star / dm_star
        return jnp.stack([r, theta100, wb])
    raise ValueError(comp.observables)


def build_cmb_term(
    compression: str, model: str, order: int = None, name: str = None
) -> Term:
    # order=None uses the converged defaults (rs: GL-48 on [0, a*];
    # D_C: GL-24 in log a) — a f64 sweep over the prior box shows the
    # worst-case chi^2 error vs GL-256/128 is 1.5e-15 at these orders
    # (3e-8 even at 32/16), so the margin is ~13 orders of magnitude
    comp = COMPRESSIONS[compression]
    priors = comp.priors
    linv = whitening_operator(np.linalg.inv(comp.inv_cov))

    def chi2(p):
        from cosmax.ops.linalg import pdot

        delta = jnp.asarray(priors) - cmb_observables(comp, p, model, order)
        wht = pdot(jnp.asarray(linv), delta)
        return jnp.sum(wht * wht)

    return Term(
        name=name or f"cmb_{compression}",
        chi2=chi2,
        meta=dict(n=3, legend=f"CMB compression ({compression})", compression=comp),
    )


def build_theta_star_term(
    model: str,
    theta_100: float = 1.04110,
    theta_100_err: float = 0.00031,
    rs_order: int = 48,
    dc_order: int = 24,
    o_gamma_h2: float = _OG_STD,
    name: str = "theta_star",
    z_star: str = "aizpuru",
) -> Term:
    """Gaussian prior on 100 theta* alone (reference
    bao/desi_omh2_theta_star.py:19-20,88-95; note
    bao/desi_bbn_theta_star.py:17 uses err 0.00053, not the Plik
    0.00031). ``z_star`` picks the decoupling-redshift fitting formula:
    "aizpuru" (A4; the current reference code, data_desi_compression.py
    :69-74) or "hu" (Hu & Sugiyama; the variant the published
    desi_omh2_theta_star rows were produced with — their quoted z*
    equals z_star_HU at the quoted (wb, wm) to 2 decimals on all three
    model families, see VALIDATION.md attribution)."""
    zstar_fn = {
        "aizpuru": recombination.z_star,
        "hu": recombination.z_star_hu,
    }[z_star]

    def chi2(p):
        h0, om, wb = p["H0"], p["Om"], p["Obh2"]
        wm = om * (h0 / 100.0) ** 2
        zstar = zstar_fn(wb, wm)
        rs_star = recombination.sound_horizon(
            zstar, p, model, h0, wb, order=rs_order, o_gamma_h2=o_gamma_h2
        )
        dm_star = recombination.comoving_distance_to(
            zstar, p, model, h0, order=dc_order
        )
        theory = 100.0 * rs_star / dm_star
        return ((theta_100 - theory) / theta_100_err) ** 2

    return Term(name=name, chi2=chi2, meta=dict(n=1))
