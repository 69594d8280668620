"""Shared-panel prefix Gauss-Legendre quadrature."""

import numpy as np
import pytest

from cosmax.models.distances import (
    make_prefix_comoving_integral,
    comoving_integral_gl,
)


def test_prefix_matches_independent_gl(x64):
    z = np.array([0.1, 0.3, 0.51, 1.0, 2.33])
    p = {"Om": 0.31, "w0": -0.9}
    fn = make_prefix_comoving_integral(z, "wzcdm", order=8)
    got = np.asarray(fn(p))
    want = np.asarray(comoving_integral_gl(z, p, "wzcdm", order=96))
    np.testing.assert_allclose(got, want, rtol=1e-12)


def test_prefix_handles_unsorted_input(x64):
    z_sorted = np.array([0.2, 0.5, 1.1])
    z_shuffled = np.array([1.1, 0.2, 0.5])
    p = {"Om": 0.3}
    a = np.asarray(make_prefix_comoving_integral(z_sorted, "lcdm")(p))
    b = np.asarray(make_prefix_comoving_integral(z_shuffled, "lcdm")(p))
    np.testing.assert_allclose(b, a[[2, 0, 1]], rtol=1e-13)


def test_prefix_monotone(x64):
    z = np.linspace(0.05, 2.0, 40)
    p = {"Om": 0.3, "w0": -1.2, "wa": 0.3}
    vals = np.asarray(make_prefix_comoving_integral(z, "w0wacdm")(p))
    assert np.all(np.diff(vals) > 0)
