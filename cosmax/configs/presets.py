"""Declarative preset registry replacing the reference's ~40 analysis
scripts (SURVEY.md SS2.3).

Every reference script is one preset here, reproducing its exact
parameter order, bounds, discretisation grids, r_d treatment, magnitude
convention, f-rescaling convention, radiation constants and prior
anchors — the per-script quirks live in these ~30-line builders instead
of 250-line copy-pasted scripts. ``get_preset(name, model)`` returns a
``FitSpec`` whose ``log_prob`` is one pure jitted function.

Model handling: the reference produces LCDM/wCDM/wzCDM/w0waCDM variants
by editing the rho_de line in place (bao/desi.py docstrings record all
variants). Here the model is an argument: for 'lcdm' the w0/wa
parameters are dropped from the sampled vector, for 'w0wacdm' a wa
parameter is appended (bounds (-3, 2) as in the published w0waCDM rows).
"""

from dataclasses import dataclass, replace
from typing import Callable, Optional, Sequence

import numpy as np

from cosmax.likelihoods.base import ParamSpec, make_log_prob, make_chi2_breakdown
from cosmax.likelihoods import bao as bao_mod
from cosmax.likelihoods import sn as sn_mod
from cosmax.likelihoods import cc as cc_mod
from cosmax.likelihoods import cmb as cmb_mod
from cosmax.likelihoods import fs8 as fs8_mod
from cosmax.likelihoods import quasars as qsr_mod
from cosmax.likelihoods import priors as priors_mod
from cosmax.data import load_bao, load_sn, load_cc, load_fs8, load_quasars
from cosmax.samplers.ensemble import MoveSpec, default_moves, stretch_only

DE_PARAMS = ("w0", "wa", "exp_w0")
WA_BOUNDS = (-3.0, 2.0)


@dataclass(frozen=True)
class FitSpec:
    """A fully-specified fit: sampled parameters, likelihood terms, and
    the reference sampler configuration."""

    name: str
    model: str
    spec: ParamSpec
    terms: tuple
    derive: Callable
    n_walkers: int = 150
    n_steps: int = 2200
    burn_in: int = 200
    moves: tuple = None
    seed: Optional[int] = None
    note: str = ""
    data_size: int = 0

    def log_prob(self):
        return make_log_prob(self.spec, self.terms, self.derive)

    def chi2_breakdown(self):
        return make_chi2_breakdown(self.spec, self.terms, self.derive)

    @property
    def dof(self) -> int:
        return self.data_size - self.spec.dim


def _adjust_params(params: Sequence[tuple], model: str):
    """Drop / append DE parameters per model (see module docstring)."""
    out = []
    for p in params:
        if p[0] in ("w0", "exp_w0") and model == "lcdm":
            continue
        out.append(p)
    if model == "w0wacdm":
        idx = max(
            (i for i, p in enumerate(out) if p[0] in ("w0", "exp_w0")), default=None
        )
        if idx is not None:
            out.insert(idx + 1, ("wa", *WA_BOUNDS))
    return out


def _spec(params) -> ParamSpec:
    names = tuple(p[0] for p in params)
    bounds = np.array([[p[1], p[2]] for p in params], dtype=np.float64)
    return ParamSpec(names=names, bounds=bounds)


def _chain(*fns):
    def derive(p):
        for f in fns:
            p = f(p)
        return p

    return derive


def _h_to_H0(p):
    if "h" in p:
        p = dict(p, H0=100.0 * p["h"])
    return p


def _exp_w0(p):
    if "exp_w0" in p:
        import jax.numpy as jnp

        p = dict(p, w0=jnp.log(p["exp_w0"]))
    return p


def _radiation(orh2: float):
    """Or = (Omega_r h^2) / h^2 — the CMB/BBN-coupled scripts' Ez
    (bao/desi_cmb_des5y.py:28-37)."""

    def derive(p):
        return dict(p, Or=orh2 / (p["H0"] / 100.0) ** 2)

    return derive


def _const(**kw):
    def derive(p):
        return dict(p, **kw)

    return derive


_IDENT = lambda p: p

# Radiation constants per compression (each reference compression module
# carries its own Omega_r_h2, SURVEY.md SS2.2).
ORH2_CHEN = cmb_mod.COMPRESSIONS["chen"].omega_r_h2()
ORH2_DESI = cmb_mod.COMPRESSIONS["desi"].omega_r_h2()
ORH2_ACT = cmb_mod.COMPRESSIONS["act"].omega_r_h2()
ORH2_UNION3 = cmb_mod.COMPRESSIONS["union3"].omega_r_h2()

PRESETS = {}


def preset(name):
    def wrap(builder):
        builder.preset_name = name
        PRESETS[name] = builder
        return builder

    return wrap


def list_presets():
    return sorted(PRESETS)


def get_preset(
    name: str,
    model: str = "wzcdm",
    fast: bool = False,
    synthetic_sys: bool = False,
    **kwargs,
) -> FitSpec:
    """Build a preset. ``fast=True`` swaps the reference-matched parity
    discretisations for the production TPU path (GL BAO distances,
    compressed Chebyshev-basis SN chi^2) — same physics, converged
    beyond the reference's own discretisation error.

    ``synthetic_sys=True`` adds the deterministic synthetic systematic
    covariance to SN datasets whose published one is stripped from the
    checkout (cosmax/data/synthetic_cov.py) — full-scale dense
    covariances with realistic structure, NOT comparable to published
    chi^2."""
    if name not in PRESETS:
        raise KeyError(
            f"unknown preset {name!r}; available: {', '.join(list_presets())}"
        )
    from cosmax.likelihoods.fastmode import use_fast_mode
    from cosmax.data.loaders import use_synthetic_sys

    with use_fast_mode(fast), use_synthetic_sys(synthetic_sys):
        fit = PRESETS[name](model, **kwargs)
        if fast:
            # narrow the preset's emulator bundles (still unbuilt —
            # finalize is lazy) to its own prior box: smaller ranks,
            # smaller table scale, same absolute contract
            from cosmax.models.linear_chi2 import set_scope_domains

            set_scope_domains({
                nm: tuple(b) for nm, b in zip(fit.spec.names, fit.spec.bounds)
            })
    if fit.moves is None:
        fit = replace(fit, moves=default_moves())
    return fit


# --------------------------------------------------------------------------
# SN-only fits
# --------------------------------------------------------------------------


@preset("sn.pantheon")
def _sn_pantheon(model):
    """Pantheon+ SN-only (reference sn/pantheon.py)."""
    ds = load_sn("pantheon_plus")
    params = _adjust_params(
        [("M", -20, -19), ("Om", 0, 1), ("w0", -2, 0)], model
    )
    terms = (sn_mod.build_sn_term(ds, model, "M", h0=70.0, name="sn"),)
    return FitSpec(
        "sn.pantheon", model, _spec(params), terms, _IDENT,
        n_walkers=150, n_steps=2200, data_size=ds.n,
        note="sn/pantheon.py: M + fixed H0=70, full covariance",
    )


@preset("sn.pantheon_shoes")
def _sn_pantheon_shoes(model):
    """Pantheon+ & SH0ES Cepheid-anchored (sn/pantheon_and_sh0es.py)."""
    ds = load_sn("pantheon_plus_shoes")
    params = _adjust_params(
        [("M", -19.5, -19.0), ("H0", 60, 85), ("Om", 0.1, 0.6), ("w0", -2, 0)], model
    )
    terms = (
        sn_mod.build_sn_term(ds, model, "M", h0="H0", cepheids=True, name="sn"),
    )
    return FitSpec(
        "sn.pantheon_shoes", model, _spec(params), terms, _IDENT,
        n_walkers=500, n_steps=2200, data_size=ds.n,
        moves=(MoveSpec("kde", 0.5), MoveSpec("de", 0.4), MoveSpec("snooker", 0.1)),
        note="sn/pantheon_and_sh0es.py: Cepheid anchor, move weights 0.5/0.4/0.1",
    )


@preset("sn.union3")
def _sn_union3(model):
    ds = load_sn("union3")
    params = _adjust_params([("dM", -0.6, 0.6), ("Om", 0, 1), ("w0", -2, 0)], model)
    terms = (
        sn_mod.build_sn_term(ds, model, "dM", h0=70.0, use_z_hel=False, name="sn"),
    )
    return FitSpec(
        "sn.union3", model, _spec(params), terms, _IDENT, data_size=ds.n,
        note="sn/union3.py: dM + fixed H0=70, (1+z_cmb) convention",
    )


@preset("sn.des5y")
def _sn_des5y(model):
    ds = load_sn("des5y")
    params = _adjust_params([("dM", -0.2, 0.2), ("Om", 0, 0.8), ("w0", -2, 0)], model)
    terms = (sn_mod.build_sn_term(ds, model, "dM", h0=70.0, name="sn"),)
    return FitSpec(
        "sn.des5y", model, _spec(params), terms, _IDENT,
        n_steps=1700, data_size=ds.effective_sample_size,
        note="sn/des5y.py: dM + fixed H0=70; dof uses effective sample size 1735",
    )


@preset("sn.union21")
def _sn_union21(model):
    ds = load_sn("union21")
    params = _adjust_params([("dM", -0.6, 0.6), ("Om", 0, 1), ("w0", -2, 0)], model)
    terms = (
        sn_mod.build_sn_term(ds, model, "dM", h0=70.0, use_z_hel=False, name="sn"),
    )
    return FitSpec(
        "sn.union21", model, _spec(params), terms, _IDENT, data_size=ds.n,
        note="Union2.1 mu with dM offset (y2011union2 loader)",
    )


@preset("sn.pantheon18")
def _sn_pantheon18(model):
    ds = load_sn("pantheon18")
    params = _adjust_params([("M", -20, -19), ("Om", 0, 1), ("w0", -2, 0)], model)
    terms = (sn_mod.build_sn_term(ds, model, "M", h0=70.0, name="sn"),)
    return FitSpec(
        "sn.pantheon18", model, _spec(params), terms, _IDENT, data_size=ds.n,
        note="Pantheon 2018 apparent magnitudes (y2018pantheon loader)",
    )


# --------------------------------------------------------------------------
# SN + CMB compressions
# --------------------------------------------------------------------------


def _sn_cmb(name, sn_name, compression, orh2, params_om, mag, use_z_hel=True):
    def build(model):
        ds = load_sn(sn_name)
        params = _adjust_params(
            [
                ("H0", 60, 75),
                ("Om", *params_om),
                ("Obh2", 0.019 if mag == "dM" else 0.020, 0.025),
                ("w0", -2, 0),
                (mag, *((-0.7, 0.7) if mag == "dM" else (-20, -19))),
            ],
            model,
        )
        terms = (
            cmb_mod.build_cmb_term(compression, model),
            sn_mod.build_sn_term(
                ds, model, mag, h0="H0", use_z_hel=use_z_hel, name="sn"
            ),
        )
        return FitSpec(
            name, model, _spec(params), terms, _radiation(orh2),
            data_size=ds.n + 3,
            note=f"{compression} compression + {sn_name}, radiation-aware E(z)",
        )


    build.__doc__ = f"{compression} compression + {sn_name}, radiation-aware E(z)"
    return build


PRESETS["sn.pantheon_cmb"] = _sn_cmb(
    "sn.pantheon_cmb", "pantheon_plus", "chen", ORH2_CHEN, (0.15, 0.40), "M"
)
PRESETS["sn.union3_cmb"] = _sn_cmb(
    "sn.union3_cmb", "union3", "union3", ORH2_UNION3, (0.1, 0.45), "dM",
    use_z_hel=False,
)
PRESETS["sn.des5y_cmb"] = _sn_cmb(
    "sn.des5y_cmb", "des5y", "chen", ORH2_CHEN, (0.1, 0.6), "dM"
)


# --------------------------------------------------------------------------
# BAO fits
# --------------------------------------------------------------------------


@preset("bao.desi")
def _bao_desi(model, dataset="desi_dr2"):
    """DESI DR2 BAO with fixed r_d (reference bao/desi.py)."""
    ds = load_bao(dataset)
    params = _adjust_params(
        [("h", 0.5, 0.8), ("Om", 0.1, 0.7), ("w0", -2, 0)], model
    )
    terms = (
        bao_mod.build_bao_term(
            ds, model, bao_mod.rd_fixed(147.09), grid=("dyn_trapz", 300)
        ),
    )
    return FitSpec(
        "bao.desi", model, _spec(params), terms, _h_to_H0, data_size=ds.n,
        note="bao/desi.py: rd=147.09 fixed, 300-pt dynamic trapezoids",
    )


@preset("bao.sdss")
def _bao_sdss(model, dataset="sdss_dr16_comp"):
    return replace(_bao_desi(model, dataset=dataset), name="bao.sdss",
                   note="bao/desi.py run against the SDSS DR16 compilation")


@preset("bao.desi_omh2")
def _bao_desi_omh2(model):
    ds = load_bao("desi_dr2")
    params = _adjust_params(
        [("h", 0.5, 0.8), ("Om", 0.1, 0.5), ("w0", -2, 0), ("rd", 130, 160)], model
    )
    terms = (
        bao_mod.build_bao_term(
            ds, model, bao_mod.rd_param("rd"), grid=("dyn_trapz", 250)
        ),
        priors_mod.omh2_term(),
    )
    return FitSpec(
        "bao.desi_omh2", model, _spec(params), terms, _h_to_H0,
        n_walkers=160, data_size=ds.n + 1,
        note="bao/desi_omh2.py: free r_d + Planck Om h^2 prior",
    )


@preset("bao.desi_bbn")
def _bao_desi_bbn(model):
    ds = load_bao("desi_dr2")
    params = _adjust_params(
        [("H0", 55, 75), ("Om", 0.17, 0.50), ("Obh2", 0.016, 0.030), ("w0", -2, 0)],
        model,
    )
    terms = (
        bao_mod.build_bao_term(
            ds, model, bao_mod.rd_from_z_drag(model), grid=("dyn_trapz", 250)
        ),
        priors_mod.bbn_term("cyril"),
    )
    return FitSpec(
        "bao.desi_bbn", model, _spec(params), terms, _radiation(ORH2_DESI),
        seed=42, data_size=ds.n + 1,
        note="bao/desi_bbn.py: r_d integrated from z_drag, BBN(cyril) prior",
    )


@preset("bao.desi_bbn_theta_star")
def _bao_desi_bbn_theta(model):
    ds = load_bao("desi_dr2")
    params = _adjust_params(
        [
            ("rd", 120, 160),
            ("H0", 55, 75),
            ("Om", 0.20, 0.50),
            ("Obh2", 0.020, 0.025),
            ("w0", -2, 0),
        ],
        model,
    )
    terms = (
        bao_mod.build_bao_term(
            ds, model, bao_mod.rd_param("rd"), grid=("dyn_trapz", 250)
        ),
        # the bbn variant uses the wider theta* error
        # (bao/desi_bbn_theta_star.py:17), NOT the Plik 0.00031 —
        # found by tools/precheck_rows.py on the wCDM row (r4)
        cmb_mod.build_theta_star_term(model, theta_100_err=0.00053),
        priors_mod.bbn_term("shonberg"),
    )
    return FitSpec(
        "bao.desi_bbn_theta_star", model, _spec(params), terms,
        _radiation(ORH2_DESI), seed=42, data_size=ds.n + 2,
        note="bao/desi_bbn_theta_star.py: free r_d + theta* + BBN(shonberg)",
    )


@preset("bao.desi_omh2_theta_star")
def _bao_desi_omh2_theta(model, z_star="aizpuru"):
    ds = load_bao("desi_dr2")
    params = _adjust_params(
        [
            ("rd", 120, 160),
            ("H0", 60, 80),
            ("Om", 0.20, 0.50),
            ("Obh2", 0.015, 0.040),
            ("w0", -1.4, 0),
        ],
        model,
    )
    terms = (
        bao_mod.build_bao_term(
            ds, model, bao_mod.rd_param("rd"), grid=("dyn_trapz", 250)
        ),
        # z_star="hu" reproduces the code variant the published rows
        # were run with (their quoted z* IS z_star_HU to 2 decimals);
        # the default follows the current reference code (Aizpuru A4)
        cmb_mod.build_theta_star_term(model, z_star=z_star),
        priors_mod.omh2_term(),
    )
    return FitSpec(
        "bao.desi_omh2_theta_star", model, _spec(params), terms,
        _radiation(ORH2_DESI), data_size=ds.n + 2,
        note="bao/desi_omh2_theta_star.py: free r_d + theta* + Om h^2 prior",
    )


@preset("bao.desi_cc")
def _bao_desi_cc(model):
    ds = load_bao("desi_dr2")
    cc_ds = load_cc()
    params = _adjust_params(
        [
            ("f_cc", 0.1, 1.5),
            ("H0", 45, 90),
            ("rd", 120, 175),
            ("Om", 0.2, 0.7),
            ("w0", -2, 1),
        ],
        model,
    )
    terms = (
        bao_mod.build_bao_term(
            ds, model, bao_mod.rd_param("rd"), grid=("dyn_trapz", 250)
        ),
        cc_mod.build_cc_term(cc_ds, model, "f_cc", "divide"),
    )
    return FitSpec(
        "bao.desi_cc", model, _spec(params), terms, _IDENT,
        data_size=ds.n + cc_ds.n,
        note="bao/desi_cc.py: CC with f^-2 rescaling + logdet normalisation",
    )


@preset("bao.desi_pantheon")
def _bao_desi_pantheon(model):
    """DESI + Pantheon+ with the exp(w0) sampling quirk
    (bao/desi_pantheon.py:27-31: rho_de exponent uses log(exp_w0))."""
    ds = load_bao("desi_dr2")
    sn_ds = load_sn("pantheon_plus")
    params = _adjust_params(
        [("M", -20, -19), ("H0", 50, 80), ("Om", 0.2, 0.7), ("exp_w0", 0.2, 0.7)],
        model,
    )
    terms = (
        bao_mod.build_bao_term(
            ds, model, bao_mod.rd_fixed(147.09), grid=("dyn_trapz", 250)
        ),
        sn_mod.build_sn_term(sn_ds, model, "M", h0="H0", name="sn"),
    )
    return FitSpec(
        "bao.desi_pantheon", model, _spec(params), terms, _exp_w0,
        data_size=ds.n + sn_ds.n,
        note="bao/desi_pantheon.py: rd fixed, w0 sampled as exp(w0)",
    )


@preset("bao.desi_union3")
def _bao_desi_union3(model):
    ds = load_bao("desi_dr2")
    sn_ds = load_sn("union3")
    params = _adjust_params(
        [("dM", -0.7, 0.7), ("H0", 60, 75), ("Om", 0.1, 0.6), ("w0", -2, 0)], model
    )
    terms = (
        bao_mod.build_bao_term(
            ds, model, bao_mod.rd_fixed(147.09), grid=("dyn_trapz", 250)
        ),
        sn_mod.build_sn_term(sn_ds, model, "dM", h0="H0", use_z_hel=False, name="sn"),
    )
    return FitSpec(
        "bao.desi_union3", model, _spec(params), terms, _IDENT,
        data_size=ds.n + sn_ds.n, note="bao/desi_union3.py: rd fixed 147.09",
    )


@preset("bao.desi_des5y")
def _bao_desi_des5y(model):
    """Fully H0-free: distances in h=1 units, r_d*h sampled
    (bao/desi_des5y.py:34-37, 76-87)."""
    ds = load_bao("desi_dr2")
    sn_ds = load_sn("des5y")
    params = _adjust_params(
        [("dM", -10, -8.5), ("rd_h", 90, 110), ("Om", 0.1, 0.7), ("w0", -2, 0)],
        model,
    )
    terms = (
        bao_mod.build_bao_term(
            ds, model, lambda p: p["rd_h"] * 100.0, grid=("dyn_trapz", 250)
        ),
        sn_mod.build_sn_term(sn_ds, model, "dM", h0=None, name="sn"),
    )
    return FitSpec(
        "bao.desi_des5y", model, _spec(params), terms, _const(H0=1.0),
        data_size=ds.n + sn_ds.effective_sample_size,
        note="bao/desi_des5y.py: H0-free (H_z = E, theory / (rd_h * 100))",
    )


def _bao_sn_cc(name, sn_name, f_bounds, dm_bounds, h0_b, rd_b, om_b, w0_b,
               param_order, note):
    def build(model):
        ds = load_bao("desi_dr2")
        sn_ds = load_sn(sn_name)
        cc_ds = load_cc()
        by_name = {
            "f_cc": ("f_cc", *f_bounds),
            "dM": ("dM", *dm_bounds),
            "M": ("M", *dm_bounds),
            "H0": ("H0", *h0_b),
            "rd": ("rd", *rd_b),
            "Om": ("Om", *om_b),
            "w0": ("w0", *w0_b),
        }
        params = _adjust_params([by_name[n] for n in param_order], model)
        mag = "M" if "M" in param_order else "dM"
        use_z_hel = sn_name != "union3"
        terms = (
            bao_mod.build_bao_term(
                ds, model, bao_mod.rd_param("rd"), grid=("dyn_trapz", 250)
            ),
            sn_mod.build_sn_term(
                sn_ds, model, mag, h0="H0", use_z_hel=use_z_hel, name="sn"
            ),
            cc_mod.build_cc_term(
                cc_ds, model, "f_cc",
                "multiply" if name == "bao.desi_pantheon_cc" else "divide",
            ),
        )
        n_sn = getattr(sn_ds, "effective_sample_size", sn_ds.n)
        return FitSpec(
            name, model, _spec(params), terms, _IDENT,
            data_size=ds.n + n_sn + cc_ds.n, note=note,
        )


    build.__doc__ = note
    return build


PRESETS["bao.desi_pantheon_cc"] = _bao_sn_cc(
    "bao.desi_pantheon_cc", "pantheon_plus", (0.4, 2.5), (-20, -19),
    (45, 85), (115, 170), (0.15, 0.7), (-3, 0),
    ["H0", "M", "rd", "Om", "w0", "f_cc"],
    "bao/desi_pantheon_cc.py: CC with f^2 convention (result f=1.47)",
)
PRESETS["bao.desi_union3_cc"] = _bao_sn_cc(
    "bao.desi_union3_cc", "union3", (0.1, 1.5), (-0.7, 0.7),
    (55, 80), (125, 170), (0.2, 0.7), (-2, 1),
    ["f_cc", "dM", "H0", "rd", "Om", "w0"],
    "bao/desi_union3_cc.py: CC with f^-2 convention",
)
PRESETS["bao.desi_des5y_cc"] = _bao_sn_cc(
    "bao.desi_des5y_cc", "des5y", (0.1, 1.5), (-0.55, 0.55),
    (50, 80), (110, 175), (0.2, 0.7), (-2, 0),
    ["f_cc", "dM", "H0", "rd", "Om", "w0"],
    "bao/desi_des5y_cc.py: CC with f^-2 convention",
)


@preset("bao.desi_cmb")
def _bao_desi_cmb(model, compression="chen"):
    ds = load_bao("desi_dr2")
    comp = cmb_mod.COMPRESSIONS[compression]
    params = _adjust_params(
        [
            ("rd", 120, 160),
            ("H0", 55, 75),
            ("Om", 0.25, 0.45),
            ("Obh2", 0.021, 0.023),
            ("w0", -1.5, 0),
        ],
        model,
    )
    terms = (
        bao_mod.build_bao_term(
            ds, model, bao_mod.rd_param("rd"), grid=("dyn_trapz", 250)
        ),
        cmb_mod.build_cmb_term(compression, model),
    )
    return FitSpec(
        "bao.desi_cmb", model, _spec(params), terms,
        _radiation(comp.omega_r_h2()), data_size=ds.n + 3,
        note=f"bao/desi_cmb.py with the {compression} compression",
    )


def _bao_cmb_sn(name, sn_name, compression, mag, w0_hi, note, use_z_hel=True):
    def build(model):
        ds = load_bao("desi_dr2")
        sn_ds = load_sn(sn_name)
        comp = cmb_mod.COMPRESSIONS[compression]
        params = _adjust_params(
            [
                ("rd", 120, 160),
                ("H0", 60, 75),
                ("Om", 0.1, 0.6),
                ("Obh2", 0.019, 0.025),
                ("w0", -2, w0_hi),
                (mag, *((-0.7, 0.7) if mag == "dM" else (-20, -19))),
            ],
            model,
        )
        terms = (
            bao_mod.build_bao_term(
                ds, model, bao_mod.rd_param("rd"), grid=("dyn_trapz", 250)
            ),
            cmb_mod.build_cmb_term(compression, model),
            sn_mod.build_sn_term(
                sn_ds, model, mag, h0="H0", use_z_hel=use_z_hel, name="sn"
            ),
        )
        n_sn = getattr(sn_ds, "effective_sample_size", sn_ds.n)
        return FitSpec(
            name, model, _spec(params), terms, _radiation(comp.omega_r_h2()),
            seed=42 if name == "bao.desi_cmb_union3" else None,
            data_size=ds.n + 3 + n_sn, note=note,
        )


    build.__doc__ = note
    return build


PRESETS["bao.desi_cmb_pantheon"] = _bao_cmb_sn(
    "bao.desi_cmb_pantheon", "pantheon_plus", "chen", "M", 0.0,
    "bao/desi_cmb_pantheon.py: chen compression",
)
PRESETS["bao.desi_cmb_union3"] = _bao_cmb_sn(
    "bao.desi_cmb_union3", "union3", "desi", "dM", 0.5,
    "bao/desi_cmb_union3.py: desi compression, seed 42", use_z_hel=False,
)
PRESETS["bao.desi_cmb_des5y"] = _bao_cmb_sn(
    "bao.desi_cmb_des5y", "des5y", "desi", "dM", 0.0,
    "bao/desi_cmb_des5y.py: the flagship three-probe joint",
)


def _bao_sn_bbn(name, sn_name, rd_formula, note, use_z_hel=True, h0_lo=55):
    def build(model):
        ds = load_bao("desi_dr2")
        sn_ds = load_sn(sn_name)
        params = _adjust_params(
            [
                ("H0", h0_lo, 75),
                ("Om", 0.1, 0.6),
                ("Obh2", 0.019, 0.025),
                ("w0", -2, 0),
                ("dM", -0.7, 0.7),
            ],
            model,
        )
        terms = (
            bao_mod.build_bao_term(
                ds, model, bao_mod.rd_from_r_drag(rd_formula),
                grid=("dyn_trapz", 250),
            ),
            sn_mod.build_sn_term(
                sn_ds, model, "dM", h0="H0", use_z_hel=use_z_hel, name="sn"
            ),
            priors_mod.bbn_term("shonberg"),
        )
        n_sn = getattr(sn_ds, "effective_sample_size", sn_ds.n)
        return FitSpec(
            name, model, _spec(params), terms, _IDENT,
            data_size=ds.n + n_sn + 1, note=note,
        )


    build.__doc__ = note
    return build


PRESETS["bao.desi_union3_bbn"] = _bao_sn_bbn(
    "bao.desi_union3_bbn", "union3", "aizpuru",
    "bao/desi_union3_bbn.py: r_d from the Aizpuru fitting formula",
    use_z_hel=False,
)
PRESETS["bao.desi_des5y_bbn"] = _bao_sn_bbn(
    "bao.desi_des5y_bbn", "des5y", "desi",
    "bao/desi_des5y_bbn.py: r_d from the DESI DR2 fitting formula (n_eff 3.04)",
    h0_lo=60,
)


@preset("bao.desi_union3_omh2")
def _bao_desi_union3_omh2(model):
    ds = load_bao("desi_dr2")
    sn_ds = load_sn("union3")
    params = _adjust_params(
        [
            ("rd", 120, 160),
            ("H0", 60, 75),
            ("Om", 0.1, 0.6),
            ("w0", -2, 0),
            ("dM", -0.7, 0.7),
        ],
        model,
    )
    terms = (
        bao_mod.build_bao_term(
            ds, model, bao_mod.rd_param("rd"), grid=("dyn_trapz", 250)
        ),
        sn_mod.build_sn_term(sn_ds, model, "dM", h0="H0", use_z_hel=False, name="sn"),
        priors_mod.omh2_term(),
    )
    return FitSpec(
        "bao.desi_union3_omh2", model, _spec(params), terms, _IDENT,
        data_size=ds.n + sn_ds.n + 1, note="bao/desi_union3_omh2.py",
    )


@preset("bao.desi_des5y_omh2")
def _bao_desi_des5y_omh2(model):
    ds = load_bao("desi_dr2")
    sn_ds = load_sn("des5y")
    params = _adjust_params(
        [
            ("dM", -0.6, 0.6),
            ("rd", 120, 160),
            ("H0", 60, 80),
            ("Om", 0.1, 0.7),
            ("w0", -2, 0),
        ],
        model,
    )
    terms = (
        bao_mod.build_bao_term(
            ds, model, bao_mod.rd_param("rd"), grid=("dyn_trapz", 250)
        ),
        sn_mod.build_sn_term(sn_ds, model, "dM", h0="H0", name="sn"),
        priors_mod.omh2_term(),
    )
    return FitSpec(
        "bao.desi_des5y_omh2", model, _spec(params), terms, _IDENT, seed=42,
        data_size=ds.n + sn_ds.effective_sample_size + 1,
        note="bao/desi_des5y_omh2.py: seed 42",
    )


# --------------------------------------------------------------------------
# Cosmic chronometers
# --------------------------------------------------------------------------


@preset("cc.cc")
def _cc_cc(model):
    ds = load_cc()
    params = _adjust_params(
        [("H0", 50, 90), ("Om", 0.15, 0.50), ("w0", -2.5, 0), ("f_cc", 0.1, 1.5)],
        model,
    )
    terms = (
        cc_mod.build_cc_term(ds, model, "f_cc", "divide"),
        priors_mod.omh2_term(),
    )
    return FitSpec(
        "cc.cc", model, _spec(params), terms, _IDENT, data_size=ds.n + 1,
        note="cosmic_chronometers/cc.py: f^-2 rescaling + Om h^2 prior",
    )


@preset("cc.cc_plain")
def _cc_plain(model):
    """The 'CC without f' variant recorded in cc.py's docstring."""
    ds = load_cc()
    params = _adjust_params(
        [("H0", 50, 90), ("Om", 0.15, 0.50), ("w0", -2.5, 0)], model
    )
    terms = (cc_mod.build_cc_term(ds, model, None), priors_mod.omh2_term())
    return FitSpec(
        "cc.cc_plain", model, _spec(params), terms, _IDENT, data_size=ds.n + 1,
        note="cc.py docstring variant without the f nuisance",
    )


@preset("cc.cc_cmb")
def _cc_cmb(model="lcdm"):
    """CC + CMB(chen); the reference hard-codes LCDM here
    (cosmic_chronometers/cc_cmb.py:22 rho_de = 1)."""
    model = "lcdm"
    ds = load_cc()
    params = [
        ("H0", 50, 85),
        ("Om", 0.1, 0.45),
        ("Obh2", 0.0210, 0.0235),
        ("f_cc", 0.1, 1.5),
    ]
    terms = (
        cc_mod.build_cc_term(ds, model, "f_cc", "divide"),
        cmb_mod.build_cmb_term("chen", model),
    )
    return FitSpec(
        "cc.cc_cmb", model, _spec(params), terms, _radiation(ORH2_CHEN),
        data_size=ds.n + 3, note="cosmic_chronometers/cc_cmb.py: LCDM only",
    )


def _cc_sn(name, sn_name, f_bounds, mag, mag_bounds, h0_b, om_b, convention,
           note, use_z_hel=True):
    def build(model):
        cc_ds = load_cc()
        sn_ds = load_sn(sn_name)
        params = _adjust_params(
            [
                ("f_cc", *f_bounds),
                *([] if mag == "M" else [(mag, *mag_bounds)]),
                ("H0", *h0_b),
                *([(mag, *mag_bounds)] if mag == "M" else []),
                ("Om", *om_b),
                ("w0", -2, 0),
            ],
            model,
        )
        terms = (
            sn_mod.build_sn_term(
                sn_ds, model, mag, h0="H0", use_z_hel=use_z_hel, name="sn"
            ),
            cc_mod.build_cc_term(cc_ds, model, "f_cc", convention),
        )
        n_sn = getattr(sn_ds, "effective_sample_size", sn_ds.n)
        return FitSpec(
            name, model, _spec(params), terms, _IDENT,
            data_size=cc_ds.n + n_sn, note=note,
        )


    build.__doc__ = note
    return build


PRESETS["cc.cc_pantheon"] = _cc_sn(
    "cc.cc_pantheon", "pantheon_plus", (0.1, 1.5), "M", (-20, -19),
    (55, 80), (0.15, 0.70), "divide",
    "cosmic_chronometers/cc_pantheon.py: f^-2 convention",
)
PRESETS["cc.cc_union3"] = _cc_sn(
    "cc.cc_union3", "union3", (0.4, 2.5), "dM", (-0.7, 0.5),
    (55, 80), (0.1, 0.7), "divide",
    "cosmic_chronometers/cc_union3.py: f^-2 convention", use_z_hel=False,
)
PRESETS["cc.cc_des5y"] = _cc_sn(
    "cc.cc_des5y", "des5y", (0.4, 2.5), "dM", (-0.55, 0.55),
    (55, 80), (0.1, 0.6), "multiply",
    "cosmic_chronometers/cc_des5y.py: inverse f^2 convention (result f=1.47)",
)


# --------------------------------------------------------------------------
# Quasars
# --------------------------------------------------------------------------


@preset("qsr.pantheon")
def _qsr_pantheon(model, sigma_mu_type="sem_errors"):
    legend, z, mu, sig = load_quasars(22, sigma_mu_type)
    sn_ds = load_sn("pantheon_plus")
    params = _adjust_params(
        [
            ("dM_qsr", -0.5, 0.5),
            ("s", 0, 3),
            ("M", -20, -19),
            ("Om", 0, 1),
            ("w0", -4, 0),
        ],
        model,
    )
    terms = (
        qsr_mod.build_quasar_term(z, mu, sig, model),
        sn_mod.build_sn_term(sn_ds, model, "M", h0=70.0, name="sn"),
    )
    return FitSpec(
        "qsr.pantheon", model, _spec(params), terms, _IDENT,
        n_walkers=8 * len(params), n_steps=10000, burn_in=2000,
        moves=stretch_only(), data_size=z.size + sn_ds.n,
        note="quasars/qsr_pantheon.py: 22 bins, default StretchMove",
    )


@preset("qsr.union3")
def _qsr_union3(model, sigma_mu_type="sem_errors"):
    legend, z, mu, sig = load_quasars(22, sigma_mu_type)
    sn_ds = load_sn("union3")
    params = _adjust_params(
        [
            ("dM_qsr", -0.5, 0.5),
            ("s", 0, 2.5),
            ("dM", -0.4, 0.3),
            ("Om", 0, 1),
            ("w0", -3, 0),
        ],
        model,
    )
    terms = (
        qsr_mod.build_quasar_term(z, mu, sig, model),
        sn_mod.build_sn_term(sn_ds, model, "dM", h0=70.0, use_z_hel=False, name="sn"),
    )
    return FitSpec(
        "qsr.union3", model, _spec(params), terms, _IDENT,
        n_walkers=8 * len(params), n_steps=10000, burn_in=2000,
        moves=stretch_only(), data_size=z.size + sn_ds.n,
        note="quasars/qsr_union3.py",
    )


@preset("qsr.des5y")
def _qsr_des5y(model, sigma_mu_type="sem_errors"):
    legend, z, mu, sig = load_quasars(50, sigma_mu_type)
    sn_ds = load_sn("des5y")
    params = _adjust_params(
        [
            ("dM_qsr", -0.5, 0.5),
            ("s", 0, 3),
            ("dM", -0.6, 0.6),
            ("Om", 0, 0.8),
            ("w0", -2, 0),
        ],
        model,
    )
    terms = (
        qsr_mod.build_quasar_term(z, mu, sig, model),
        sn_mod.build_sn_term(sn_ds, model, "dM", h0=70.0, name="sn"),
    )
    return FitSpec(
        "qsr.des5y", model, _spec(params), terms, _IDENT,
        n_walkers=8 * len(params), n_steps=10000, burn_in=2000,
        moves=stretch_only(),
        data_size=z.size + sn_ds.effective_sample_size,
        note="quasars/qsr_des5y.py: 50 quasar bins",
    )


@preset("qsr.desi")
def _qsr_desi(model, sigma_mu_type="sem_errors"):
    legend, z, mu, sig = load_quasars(22, sigma_mu_type)
    bao_ds = load_bao("desi_dr2")
    params = _adjust_params(
        [
            ("dM_qsr", -0.6, 0.5),
            ("s", 0, 1.5),
            ("rd", 110, 155),
            ("Om", 0, 0.6),
            ("w0", -1.6, 0),
        ],
        model,
    )
    terms = (
        qsr_mod.build_quasar_term(z, mu, sig, model),
        bao_mod.build_bao_term(
            bao_ds, model, bao_mod.rd_param("rd"), grid=("fixed_trapz", 3000)
        ),
    )
    return FitSpec(
        "qsr.desi", model, _spec(params), terms, _const(H0=70.0),
        n_walkers=8 * len(params), n_steps=10000, burn_in=2000,
        moves=stretch_only(), data_size=z.size + bao_ds.n,
        note="quasars/qsr_desi.py: H0=70 fixed, 3000-pt grids",
    )


@preset("qsr.des5y_desi")
def _qsr_des5y_desi(model, sigma_mu_type="sem_errors"):
    legend, z, mu, sig = load_quasars(22, sigma_mu_type)
    sn_ds = load_sn("des5y")
    bao_ds = load_bao("desi_dr2")
    params = _adjust_params(
        [
            ("dM_qsr", -1, 1),
            ("s", 0, 2.5),
            ("dM", -0.6, 0.6),
            ("rd", 110, 170),
            ("Om", 0, 0.6),
            ("w0", -1.5, 0),
        ],
        model,
    )
    terms = (
        qsr_mod.build_quasar_term(z, mu, sig, model),
        sn_mod.build_sn_term(sn_ds, model, "dM", h0=70.0, grid_num=3000, name="sn"),
        bao_mod.build_bao_term(
            bao_ds, model, bao_mod.rd_param("rd"), grid=("fixed_trapz", 3000)
        ),
    )
    return FitSpec(
        "qsr.des5y_desi", model, _spec(params), terms, _const(H0=70.0),
        n_walkers=8 * len(params), n_steps=10000, burn_in=2000,
        moves=stretch_only(),
        data_size=z.size + sn_ds.effective_sample_size + bao_ds.n,
        note="quasars/qsr_des5y_desi.py: three-probe with H0=70 fixed",
    )


# --------------------------------------------------------------------------
# Growth, CMB-only
# --------------------------------------------------------------------------


@preset("fs8.fs8")
def _fs8(model):
    ds = load_fs8()
    params = _adjust_params(
        [
            ("Om", 0.1, 0.6),
            ("sigma8", 0.2, 1.2),
            ("w0", -2.5, 0),
            ("f_err", 0.1, 1.5),
        ],
        model,
    )
    terms = (fs8_mod.build_fs8_term(ds, model),)
    return FitSpec(
        "fs8.fs8", model, _spec(params), terms, _IDENT,
        n_walkers=50, n_steps=1100, burn_in=100, seed=42, data_size=ds.n,
        note="fs8/fs8.py: growth ODE + AP correction, seed 42",
    )


@preset("cmb.cmb")
def _cmb_cmb(model="lcdm", compression="chen"):
    """CMB compression alone; the reference's Ez is LCDM-only
    (cmb/cmb.py:12-19)."""
    model = "lcdm"
    comp = cmb_mod.COMPRESSIONS[compression]
    params = [("H0", 60, 70), ("Om", 0.15, 0.45), ("Obh2", 0.020, 0.024)]
    terms = (cmb_mod.build_cmb_term(compression, model),)
    return FitSpec(
        "cmb.cmb", model, _spec(params), terms, _radiation(comp.omega_r_h2()),
        n_walkers=200, data_size=3,
        note=f"cmb/cmb.py with the {compression} compression",
    )


# --------------------------------------------------------------------------
# Full multiprobe joint (the BASELINE.json north-star config; no single
# reference script combines all probes — this is cosmax composition)
# --------------------------------------------------------------------------


@preset("joint.multiprobe")
def _joint_multiprobe(model):
    """DES-SN5YR + DESI DR2 BAO + CMB(desi) + cosmic chronometers +
    quasars + fsigma8, sharing one background cosmology. Offsets/
    nuisances follow the corresponding single-probe presets."""
    bao_ds = load_bao("desi_dr2")
    sn_ds = load_sn("des5y")
    cc_ds = load_cc()
    fs8_ds = load_fs8()
    _, qz, qmu, qsig = load_quasars(22)
    params = _adjust_params(
        [
            ("rd", 120, 160),
            ("H0", 60, 80),
            ("Om", 0.1, 0.6),
            ("Obh2", 0.019, 0.025),
            ("w0", -2, 0),
            ("dM", -0.7, 0.7),
            ("dM_qsr", -0.6, 0.6),
            ("s", 0.0, 1.5),
            ("f_cc", 0.1, 1.5),
            ("sigma8", 0.2, 1.2),
            ("f_err", 0.1, 1.5),
        ],
        model,
    )
    terms = (
        bao_mod.build_bao_term(
            bao_ds, model, bao_mod.rd_param("rd"), grid=("dyn_trapz", 250)
        ),
        cmb_mod.build_cmb_term("desi", model),
        sn_mod.build_sn_term(sn_ds, model, "dM", h0="H0", name="sn"),
        cc_mod.build_cc_term(cc_ds, model, "f_cc", "divide"),
        qsr_mod.build_quasar_term(qz, qmu, qsig, model),
        fs8_mod.build_fs8_term(fs8_ds, model),
    )
    return FitSpec(
        "joint.multiprobe", model, _spec(params), terms, _radiation(ORH2_DESI),
        n_walkers=256, n_steps=2200,
        data_size=(
            bao_ds.n + 3 + sn_ds.effective_sample_size + cc_ds.n
            + qz.size + fs8_ds.n
        ),
        note="all-probe joint (cosmax composition; BASELINE north-star config)",
    )


@preset("sn.des5y_bins")
def _sn_des5y_bins(model):
    """Inverse-variance 50-per-bin DES5Y compression — the reference
    ships the binned loader (y2024DES/data_bins.py) without an analysis
    script; this preset makes it fittable."""
    ds = load_sn("des5y_bins")
    params = _adjust_params([("dM", -0.2, 0.2), ("Om", 0, 0.8), ("w0", -2, 0)], model)
    terms = (sn_mod.build_sn_term(ds, model, "dM", h0=70.0, name="sn"),)
    return FitSpec(
        "sn.des5y_bins", model, _spec(params), terms, _IDENT, data_size=ds.n,
        note="y2024DES/data_bins.py binned compression (no reference script)",
    )
