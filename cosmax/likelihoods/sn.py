"""Type Ia supernova likelihoods (Pantheon+, Pantheon+&SH0ES, Union3,
DES-SN5YR, Pantheon 2018, Union2.1).

Theory: one cumulative-trapezoid integral of 1/E on a fixed grid shared
by all SNe, interpolated at the data redshifts — the reference's scheme
(sn/pantheon.py:32-35) kept verbatim because it is already optimal on
TPU (a prefix sum + gather, one per likelihood eval, reused for ~2000
SNe). chi^2 is the whitened-residual matmul against the full covariance.

Magnitude conventions covered (reference parameter naming varies per
script): absolute magnitude 'M' with sampled H0, magnitude offset 'dM'
with fixed H0 (Union3/DES5Y: sn/union3.py:14, sn/des5y.py:12), H0-free
log-distance with the offset absorbing c/H0 (bao/desi_des5y.py:34-37),
and the Cepheid-anchored variant (sn/pantheon_and_sh0es.py:34-45).
"""

import numpy as np
import jax.numpy as jnp

from cosmax.constants import C_KM_S
from cosmax.likelihoods.base import Term
from cosmax.models.background import e_of_z
from cosmax.ops.quadrature import cumtrapz
from cosmax.ops.linalg import chi2_from_whitener
from cosmax.data.loaders import CovDataset


def build_sn_term(
    dataset: CovDataset,
    model: str,
    mag_param: str = "M",
    h0: str | float = "H0",
    use_z_hel: bool = True,
    grid_num: int = 1000,
    cepheids: bool = False,
    name: str = "sn",
) -> Term:
    """h0: a float fixes H0 (Union3/DES5Y use 70); the string name of a
    sampled parameter reads it from the dict; None gives the H0-free
    parameterisation where ``mag_param`` absorbs 5 log10(c/H0) + 25.
    """
    z_cmb = np.asarray(dataset.z_cmb, dtype=np.float64)
    mags = np.asarray(dataset.values, dtype=np.float64)
    one_plus_z_hel = 1.0 + np.asarray(
        dataset.z_hel if use_z_hel else dataset.z_cmb, dtype=np.float64
    )
    linv = dataset.linv
    z_grid = np.linspace(0.0, z_cmb.max(), num=grid_num)
    if cepheids:
        ceph_dist = np.asarray(dataset.ceph_dist, dtype=np.float64)
        ceph_mask = ceph_dist != -9  # sn/pantheon_and_sh0es.py:17

    def theory_mag(p):
        inv_e = 1.0 / e_of_z(jnp.asarray(z_grid), p, model)
        integral = jnp.interp(z_cmb, z_grid, cumtrapz(inv_e, z_grid))
        if h0 is None:
            # H0-free: mu = 25 + 5 log10((1+z_hel) * c * I); the offset
            # parameter absorbs -5 log10(H0) (bao/desi_des5y.py:34-37).
            mu = 25.0 + 5.0 * jnp.log10(one_plus_z_hel * C_KM_S * integral)
        else:
            h0_val = p[h0] if isinstance(h0, str) else h0
            mu = 25.0 + 5.0 * jnp.log10(one_plus_z_hel * (C_KM_S / h0_val) * integral)
        if cepheids:
            mu = jnp.where(ceph_mask, ceph_dist, mu)
        return mu + p[mag_param]

    def chi2(p):
        return chi2_from_whitener(linv, mags - theory_mag(p))

    return Term(
        name=name,
        chi2=chi2,
        meta=dict(n=dataset.n, legend=dataset.legend, theory_mag=theory_mag),
    )
