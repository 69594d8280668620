"""Linear-algebra helpers for Gaussian likelihoods.

The reference factors each covariance once at import and then runs two
triangular solves per likelihood call (bao/desi.py:78-83,
sn/pantheon.py:18,38-40). On TPU a triangular solve is a poor fit for
the MXU and serialises over columns; instead we invert the Cholesky
factor **once at build time in f64 numpy** and evaluate

    chi^2 = || Linv @ delta ||^2

as a single matmul + fused square-reduction — for a [W, N] batch of
walker residuals that is one [W, N] x [N, N] MXU contraction. The
build-time inversion is exact triangular inversion (scipy dtrtri), so
fast-path f32 error enters only in the final matmul.
"""

import numpy as np
import scipy.linalg
import jax
import jax.numpy as jnp

# TPU MXU matmuls run with bfloat16 inputs at the default precision —
# fine for neural nets, catastrophic for chi^2: measured on a v5e,
# walker-batched log-likelihoods were off by up to ~11 (!) in logL at
# default precision vs 0.07 worst-case at full f32, visibly shifting
# posteriors by ~0.3 sigma (round-2 validation). Every likelihood-path
# matmul therefore pins Precision.HIGHEST (exact f32 via 6-pass bf16);
# tests/test_likelihood_parity.py::test_all_dots_pin_highest_precision
# guards regressions. CPU/GPU are unaffected (f32 is f32 there).
HIGHEST = jax.lax.Precision.HIGHEST


def pdot(a, b):
    """matmul pinned to full-f32 accumulation (see HIGHEST above)."""
    return jnp.matmul(a, b, precision=HIGHEST)


def whitening_operator(cov: np.ndarray) -> np.ndarray:
    """L^{-1} with cov = L L^T, float64 numpy (build time only)."""
    L = np.linalg.cholesky(np.asarray(cov, dtype=np.float64))
    Linv = scipy.linalg.lapack.dtrtri(L, lower=1)[0]
    return Linv


def log_det_cov(cov: np.ndarray) -> float:
    """log|cov| via Cholesky (build time, for normalisation terms
    like the reference's f_cc log-likelihood, cosmic_chronometers/cc.py:52-55)."""
    L = np.linalg.cholesky(np.asarray(cov, dtype=np.float64))
    return float(2.0 * np.sum(np.log(np.diag(L))))


def chi2_from_whitener(linv, delta):
    """chi^2 = ||Linv delta||^2 for delta of shape [..., N]."""
    wht = pdot(delta, jnp.asarray(linv).T)
    return jnp.sum(wht * wht, axis=-1)
