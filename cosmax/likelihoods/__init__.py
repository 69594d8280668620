from cosmax.likelihoods.base import ParamSpec, Term, make_log_prob, make_chi2_breakdown
from cosmax.likelihoods import bao, sn, cmb, cc, quasars, fs8, priors

__all__ = [
    "ParamSpec",
    "Term",
    "make_log_prob",
    "make_chi2_breakdown",
    "bao",
    "sn",
    "cmb",
    "cc",
    "quasars",
    "fs8",
    "priors",
]
