"""Pallas kernels in interpreter mode (no TPU in the test environment;
the compiled path is exercised on hardware by bench/verify runs)."""

import numpy as np
import jax.numpy as jnp
import pytest

from cosmax.ops.pallas.chi2 import whitened_chi2_pallas
from cosmax.ops.linalg import whitening_operator, chi2_from_whitener


def test_whitened_chi2_interpret_matches_dense():
    rng = np.random.default_rng(0)
    n, w = 100, 64
    a = rng.normal(size=(n, n))
    cov = a @ a.T + n * np.eye(n)
    linv = whitening_operator(cov).astype(np.float32)
    delta = rng.normal(size=(w, n)).astype(np.float32)
    got = np.asarray(
        whitened_chi2_pallas(
            jnp.asarray(linv), jnp.asarray(delta),
            block_w=32, block_n=64, interpret=True,
        )
    )
    want = np.asarray(chi2_from_whitener(jnp.asarray(linv), jnp.asarray(delta)))
    np.testing.assert_allclose(got, want, rtol=5e-5)


def test_whitened_chi2_padding():
    """Non-multiple shapes are padded without changing the result."""
    rng = np.random.default_rng(1)
    n, w = 37, 19
    a = rng.normal(size=(n, n))
    cov = a @ a.T + n * np.eye(n)
    linv = whitening_operator(cov).astype(np.float32)
    delta = rng.normal(size=(w, n)).astype(np.float32)
    got = np.asarray(
        whitened_chi2_pallas(
            jnp.asarray(linv), jnp.asarray(delta),
            block_w=16, block_n=16, interpret=True,
        )
    )
    want = np.asarray(chi2_from_whitener(jnp.asarray(linv), jnp.asarray(delta)))
    assert got.shape == (w,)
    np.testing.assert_allclose(got, want, rtol=5e-5)
