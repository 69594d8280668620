from cosmax.gp.exact_gp import ExactGP, GPParams, fit_gp, reconstruct_hz

__all__ = ["ExactGP", "GPParams", "fit_gp", "reconstruct_hz"]
