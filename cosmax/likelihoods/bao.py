"""BAO likelihood (DESI DR2, SDSS DR16 and compilations).

Theory: D_V/r_d, D_M/r_d, D_H/r_d selected per data point by integer
quantity codes, against a dense covariance (reference bao/desi.py:47-83).
All three distance families are computed for every point and combined
with precomputed one-hot masks — branch-free, so the whole theory vector
is one fused elementwise pass + weighted reductions under ``vmap``.

r_d treatments (the reference encodes these by editing scripts):
pass ``rd_fn(p) -> Mpc``; helpers below cover fixed r_d (bao/desi.py:7),
a sampled ``rd`` (bao/desi_omh2.py:65-72), the H0-free ``rd_h`` combo
(bao/desi_des5y.py:76-87) and the BBN-derived sound horizon at z_drag
(bao/desi_bbn.py:14-19).
"""

from typing import Callable

import numpy as np
import jax.numpy as jnp

from cosmax.likelihoods.base import Term
from cosmax.models.distances import (
    comoving_distance_gl,
    comoving_distance_trapz,
    hubble_distance,
    volume_distance,
)
from cosmax.models import recombination
from cosmax.ops.quadrature import trapz_grid_weights
from cosmax.ops.linalg import chi2_from_whitener
from cosmax.data.loaders import CovDataset, QTY_DV, QTY_DM, QTY_DH


def rd_fixed(value: float = 147.09) -> Callable:
    return lambda p: value


def rd_param(name: str = "rd") -> Callable:
    return lambda p: p[name]


def rd_over_h(name: str = "rd_h") -> Callable:
    """H0-free fits sample the product r_d * h (bao/desi_des5y.py:99-104);
    the BAO theory divides by r_d = (rd_h) / h with h = H0/100."""
    return lambda p: p[name] / (p["H0"] / 100.0)


def rd_from_r_drag(which: str = "aizpuru", n_eff: float = 3.04) -> Callable:
    """r_d from a published fitting formula of (wb, wm):
    'aizpuru' = arXiv:2106.00428 eq 8 (bao/desi_union3_bbn.py:10,84) or
    'desi' = arXiv:2503.14738 eq 2 (bao/desi_des5y_bbn.py:27-31)."""

    def fn(p):
        wm = p["Om"] * (p["H0"] / 100.0) ** 2
        if which == "aizpuru":
            return recombination.r_drag_aizpuru(p["Obh2"], wm)
        if which == "desi":
            return recombination.r_drag_desi(p["Obh2"], wm, n_eff)
        raise ValueError(which)

    return fn


def rd_from_z_drag(model: str, order: int = 128) -> Callable:
    """r_d = r_s(z_drag) integrated from the background, as in
    bao/desi_bbn.py:14-19. Requires radiation ('Or') and 'Obh2'."""

    def fn(p):
        wm = p["Om"] * (p["H0"] / 100.0) ** 2
        zd = recombination.z_drag(p["Obh2"], wm)
        return recombination.sound_horizon(zd, p, model, p["H0"], p["Obh2"], order)

    return fn


def build_bao_term(
    dataset: CovDataset,
    model: str,
    rd_fn: Callable,
    grid: tuple = ("gl", 64),
    name: str = "bao",
) -> Term:
    """grid: ('emu',) fast path | ('gl', order) | ('dyn_trapz', n_base)
    or ('fixed_trapz', n) parity paths matching the reference's
    per-script discretisations (bao/desi.py:34 uses 300,
    bao/desi_cmb_des5y.py:63 uses 250, quasars/qsr_desi.py:39-41
    uses fixed 3000-pt grids).

    The 'emu' path exploits that every BAO observable is homogeneous
    of degree 1 in c/H0 — DH = (c/H0)/E, DM = (c/H0) Int dz'/E and
    DV = (z DM^2 DH)^(1/3) all scale together — so the whitened
    theory vector is beta(p) * t_hat(theta) with
    beta = (c/H0) / r_d(p) a scalar that covers ALL r_d treatments
    unchanged, and t_hat a smooth function of the 1-3 dark-energy
    parameters that models.linear_chi2 tabulates at build time. Per
    evaluation: a rank-space contraction + O(R) flops, no quadrature
    (radiation enters as the same secant-delta axpy as the fs8
    emulator)."""
    from cosmax.likelihoods.fastmode import fast_mode, GL_ORDER

    if fast_mode():
        grid = ("emu",)
    z = np.asarray(dataset.z, dtype=np.float64)
    qty = np.asarray(dataset.quantity)
    values = np.asarray(dataset.values, dtype=np.float64)
    linv = dataset.linv
    mask_dv = (qty == QTY_DV).astype(np.float64)
    mask_dm = (qty == QTY_DM).astype(np.float64)
    mask_dh = (qty == QTY_DH).astype(np.float64)

    kind = grid[0]
    if kind == "emu":
        from cosmax.constants import C_KM_S
        from cosmax.models.distances import make_prefix_comoving_integral
        from cosmax.models.background import e_of_z
        from cosmax.models.linear_chi2 import _hash_arrays, make_linear_chi2
        import jax

        z_unique, z_inverse = np.unique(z, return_inverse=True)

        def curve_fn(flat, to_params):
            # t_hat at H0 = c, r_d = 1: dh_hat = 1/E, dm_hat = Int dz'/E
            # (16-node build panels; runtime uses none), dv_hat the
            # same cube-root mix as the runtime path below
            prefix = make_prefix_comoving_integral(z_unique, model, order=16)

            def one(theta):
                p = to_params(theta)
                dhh = 1.0 / e_of_z(jnp.asarray(z), p, model)
                dmh = prefix(p)[z_inverse]
                dvh = jnp.cbrt(jnp.asarray(z) * dmh * dmh * dhh)
                t_hat = (
                    jnp.asarray(mask_dh) * dhh
                    + jnp.asarray(mask_dm) * dmh
                    + jnp.asarray(mask_dv) * dvh
                )
                return jnp.tensordot(jnp.asarray(linv), t_hat, axes=(1, 0))

            return np.asarray(jax.vmap(one)(jnp.asarray(flat, jnp.float64)))

        u0 = np.asarray(linv, np.float64) @ values
        chi2 = make_linear_chi2(
            model,
            curve_fn,
            tag=f"bao-{model}",
            key_extra=_hash_arrays(z, values, qty.astype(np.float64), linv),
            u0_c=u0,
            u0_sq=float(u0 @ u0),
            beta_fn=lambda p: C_KM_S / (p["H0"] * rd_fn(p)),
            beta_ref=C_KM_S / (70.0 * 147.09),
        )
        return _bao_term(name, dataset, chi2, model, rd_fn, z, qty, values)

    if kind in ("dyn_trapz", "fixed_trapz"):
        tgrid, tw = trapz_grid_weights(z, grid[1], dynamic=(kind == "dyn_trapz"))

        def dm_of(p):
            return comoving_distance_trapz(p, model, tgrid, tw)

    elif kind == "gl":
        # shared-panel prefix quadrature over the (static, sorted)
        # data redshifts — N panels instead of N independent rules
        from cosmax.models.distances import make_prefix_comoving_integral
        from cosmax.constants import C_KM_S

        z_unique, z_inverse = np.unique(z, return_inverse=True)
        # 8-node panels: worst d(DM/rd) vs order-32 panels is 1.3e-14
        # over the prior box (order 6 is already 1.3e-11); data sigma
        # is ~0.1-0.5.
        prefix_integral = make_prefix_comoving_integral(
            z_unique, model, order=max(8, grid[1] // 8)
        )

        def dm_of(p):
            from cosmax.ops.quadrature import static_take

            return (C_KM_S / p["H0"]) * static_take(
                prefix_integral(p), z_inverse
            )

    else:
        raise ValueError(f"unknown grid mode {grid!r}")

    def chi2(p):
        dh = hubble_distance(z, p, model)
        dm = dm_of(p)
        dv = volume_distance(z, dh, dm)
        theory = (mask_dh * dh + mask_dm * dm + mask_dv * dv) / rd_fn(p)
        return chi2_from_whitener(linv, values - theory)

    return _bao_term(name, dataset, chi2, model, rd_fn, z, qty, values)


def _bao_term(name, dataset, chi2, model, rd_fn, z, qty, values):
    def theory_curve(p, z_grid, which):
        """Smooth D_{V,M,H}/r_d curve for plotting (which in {0,1,2})."""
        zg = jnp.asarray(z_grid)
        dh = hubble_distance(zg, p, model)
        dm = comoving_distance_gl(zg, p, model, order=64)
        dv = volume_distance(zg, dh, dm)
        table = {QTY_DV: dv, QTY_DM: dm, QTY_DH: dh}
        return table[which] / rd_fn(p)

    return Term(
        name=name,
        chi2=chi2,
        meta=dict(
            n=dataset.n,
            legend=dataset.legend,
            plot_kind="bao",
            z=z,
            values=values,
            errors=np.sqrt(np.diag(dataset.cov)),
            quantity=qty,
            theory_curve=theory_curve,
        ),
    )
