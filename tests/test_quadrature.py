import numpy as np
import scipy.integrate
import jax.numpy as jnp

from cosmax.ops.quadrature import (
    gl_integrate_01,
    cumtrapz,
    trapz_grid_weights,
    gauss_legendre,
)


def test_gl_exact_for_polynomials(x64):
    # order-n GL is exact for degree 2n-1
    val = float(gl_integrate_01(lambda t: 7 * t**6, 8))
    assert abs(val - 1.0) < 1e-14


def test_gl_vs_quad_smooth(x64):
    f = lambda t: np.exp(-t) / (1 + t**2)
    want = scipy.integrate.quad(f, 0, 1)[0]
    got = float(gl_integrate_01(lambda t: jnp.exp(-t) / (1 + t**2), 32))
    assert abs(got - want) < 1e-13


def test_cumtrapz_matches_scipy(x64):
    x = np.linspace(0, 2.3, 57)
    y = np.sin(x) + 0.3 * x
    want = scipy.integrate.cumulative_trapezoid(y, x, initial=0)
    got = np.asarray(cumtrapz(jnp.asarray(y), x))
    np.testing.assert_allclose(got, want, rtol=1e-13, atol=1e-15)


def test_trapz_grid_weights_match_np_trapz(x64):
    z_pts = np.array([0.3, 0.51, 1.0, 2.33])
    grid, w = trapz_grid_weights(z_pts, 300)
    f = lambda x: 1.0 / np.sqrt(0.3 * (1 + x) ** 3 + 0.7)
    got = np.sum(f(grid) * w, axis=1)
    for i, zi in enumerate(z_pts):
        x = np.linspace(0, zi, max(300, int(300 * zi)))
        want = np.trapezoid(f(x), x)
        assert abs(got[i] - want) < 1e-13


def test_trapz_fixed_mode(x64):
    z_pts = np.array([0.5, 1.4])
    grid, w = trapz_grid_weights(z_pts, 100, dynamic=False)
    assert grid.shape == (2, 100)
    f = lambda x: np.cos(x)
    got = np.sum(f(grid) * w, axis=1)
    for i, zi in enumerate(z_pts):
        x = np.linspace(0, zi, 100)
        assert abs(got[i] - np.trapezoid(f(x), x)) < 1e-14


def test_gauss_legendre_cached(x64):
    a = gauss_legendre(64)
    b = gauss_legendre(64)
    assert a[0] is b[0]


def test_matmul_prefix_sums_match_cumsum():
    """The Mosaic-safe triangular-matmul variant of the prefix-sum
    helpers (used by ops/pallas/megakernel.py) equals cumsum/gather."""
    import numpy as np

    from cosmax.ops.quadrature import (
        cumtrapz,
        matmul_prefix_sums,
        prefix_sum,
        prefix_sum_permuted,
    )

    rng = np.random.default_rng(3)
    y = rng.standard_normal((4, 33))
    perm = rng.permutation(33)
    x = np.sort(rng.uniform(0, 2, 33))

    base_ps = np.asarray(prefix_sum(y, axis=-1))
    base_pp = np.asarray(prefix_sum_permuted(y, perm))
    base_ct = np.asarray(cumtrapz(y, x, axis=-1))
    with matmul_prefix_sums():
        mm_ps = np.asarray(prefix_sum(y, axis=-1))
        mm_pp = np.asarray(prefix_sum_permuted(y, perm))
        mm_ct = np.asarray(cumtrapz(y, x, axis=-1))
    np.testing.assert_allclose(mm_ps, base_ps, rtol=1e-6, atol=1e-6)
    np.testing.assert_allclose(mm_pp, base_pp, rtol=1e-6, atol=1e-6)
    np.testing.assert_allclose(mm_ct, base_ct, rtol=1e-6, atol=1e-6)
