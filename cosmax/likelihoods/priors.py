"""Scalar and low-dimensional Gaussian priors used as anchor terms.

* BBN omega_b priors (three published variants, reference y2024BBN/):
  chen arXiv:2509.11743 (0.02232 +- 0.00033), cyril arXiv:1801.08023
  (0.02190 +- 0.00025), shonberg arXiv:2401.15054 (0.02218 +- 0.00055),
  plus the Schoneberg 2x2 (omega_b, N_eff) covariance prior
  (y2024BBN/shonberg.py:8-15).
* Planck Omega_m h^2 prior 0.1430 +- 0.0011
  (reference bao/desi_omh2.py:17-18, cosmic_chronometers/cc.py:18-19).
"""

import numpy as np
import jax.numpy as jnp

from cosmax.likelihoods.base import Term

BBN_PRIORS = {
    "chen": (0.02232, 0.00033),  # y2024BBN/prior_lcdm_chen.py
    "cyril": (0.02190, 0.00025),  # y2024BBN/prior_lcdm_cyril.py
    "shonberg": (0.02218, 0.00055),  # y2024BBN/prior_lcdm_shonberg.py
}

OMH2_PLANCK = (0.1430, 0.0011)
THETA_100_PLANCK = (1.04110, 0.00031)


def gaussian_prior_term(fn, mean: float, sigma: float, name: str) -> Term:
    """chi^2 = ((mean - fn(p)) / sigma)^2."""

    def chi2(p):
        return ((mean - fn(p)) / sigma) ** 2

    return Term(name=name, chi2=chi2, meta=dict(n=1))


def bbn_term(variant: str = "cyril", param: str = "Obh2") -> Term:
    mean, sigma = BBN_PRIORS[variant]
    return gaussian_prior_term(lambda p: p[param], mean, sigma, f"bbn_{variant}")


def omh2_term(param_h0: str = "H0", param_om: str = "Om") -> Term:
    """Planck Omega_m h^2 prior (bao/desi_omh2.py:87-93)."""
    mean, sigma = OMH2_PLANCK
    return gaussian_prior_term(
        lambda p: p[param_om] * (p[param_h0] / 100.0) ** 2, mean, sigma, "omh2"
    )


def bbn_shonberg_2d_term(param_wb: str = "Obh2", n_eff: float = 3.044 - 0.1) -> Term:
    """Schoneberg+2024 joint (omega_b, N_eff) prior with N_eff held at
    the reference's Delta N_eff = -0.1 value (y2024BBN/shonberg.py:8-15).
    With N_eff fixed this reduces to the conditional Gaussian on omega_b.
    """
    data = np.array([0.02196, 3.044 - 0.1])
    cov = np.array(
        [
            [4.03112260e-07, 7.30390042e-05],
            [7.30390042e-05, 4.52831584e-02],
        ]
    )
    icov = np.linalg.inv(cov)

    def chi2(p):
        delta = jnp.stack(
            [data[0] - p[param_wb], jnp.asarray(data[1] - n_eff, dtype=jnp.result_type(p[param_wb]))]
        )
        from cosmax.ops.linalg import pdot

        return pdot(delta, pdot(jnp.asarray(icov), delta))

    return Term(name="bbn_shonberg2d", chi2=chi2, meta=dict(n=2))
