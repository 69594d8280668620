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


def test_megakernel_blocked_log_prob_matches_vmap():
    """The whole-log-prob mega-kernel (ops/pallas/megakernel.py) agrees
    with jax.vmap on the flagship joint in interpreter mode, including
    the padded final block. f32 tolerance: different batch shapes
    change matmul lowering order, so per-walker values differ at the
    usual f32 reordering level (~3e-4 relative on |logp| ~ 1e3)."""
    import jax
    import jax.numpy as jnp

    from cosmax.configs import get_preset
    from cosmax.ops.pallas.megakernel import blocked_log_prob

    fit = get_preset("bao.desi_cmb_des5y", model="wzcdm", fast=True)
    lp = fit.log_prob()
    rng = np.random.default_rng(0)
    lo, hi = fit.spec.bounds[:, 0], fit.spec.bounds[:, 1]
    mid, span = 0.5 * (lo + hi), 0.05 * (hi - lo)
    w = jnp.asarray(
        (mid + span * rng.standard_normal((70, fit.spec.dim))).astype(
            np.float32
        )
    )
    ref = np.asarray(jax.vmap(lp)(w))
    got = np.asarray(
        blocked_log_prob(lp, fit.spec.dim, block=32, interpret=True)(w)
    )
    assert got.shape == (70,)
    np.testing.assert_allclose(got, ref, rtol=0, atol=2e-3 * np.abs(ref).max())


def test_dot_rewrite_two_axis_contraction():
    # A dot_general contracting TWO axes (Frobenius inner product,
    # jnp.tensordot(a, b, axes=2)) must take the general
    # multiply-reduce path — the rank-2 fast path's transpose logic
    # assumes exactly one contracting dim and would mis-rewrite it.
    import numpy as np
    import jax.numpy as jnp

    from cosmax.ops.pallas.megakernel import _dot_rewrite

    rng = np.random.default_rng(0)
    a = rng.standard_normal((3, 4)).astype(np.float32)
    b = rng.standard_normal((3, 4)).astype(np.float32)
    params = {
        "dimension_numbers": (((0, 1), (0, 1)), ((), ())),
        "precision": None,
        "preferred_element_type": None,
    }
    got = np.asarray(_dot_rewrite(params, jnp.asarray(a), jnp.asarray(b)))
    np.testing.assert_allclose(got, float(np.sum(a * b)), rtol=1e-5)
    # and the single-axis fast path still matches a plain matmul
    params1 = {
        "dimension_numbers": (((1,), (0,)), ((), ())),
        "precision": None,
        "preferred_element_type": None,
    }
    got1 = np.asarray(
        _dot_rewrite(params1, jnp.asarray(a), jnp.asarray(b.T.copy()))
    )
    np.testing.assert_allclose(got1, a @ b.T, rtol=1e-5)
