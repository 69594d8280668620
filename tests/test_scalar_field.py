"""Quintessence reconstruction (reference field.py) sanity checks."""

import numpy as np
import pytest

from cosmax.models.scalar_field import reconstruct, w_de, rho_de


def test_w_limits():
    assert w_de(np.asarray(1e-6), -0.8) == pytest.approx(-1.0, abs=1e-5)
    # late times: w -> -1 + 2(1+w0) = 1 + 2 w0 as a -> inf
    assert float(w_de(np.asarray(1e3), -0.8)) == pytest.approx(1 + 2 * -0.8, abs=1e-5)


def test_rho_normalised_today():
    assert float(rho_de(np.asarray(1.0), -0.833)) == pytest.approx(
        (2.0 / 2.0) ** (2 * (1 - 0.833)), rel=1e-12
    )


def test_reconstruction_monotonic_field():
    out = reconstruct(om=0.307, w0=-0.833)
    phi = out["phi"]
    assert np.all(np.diff(phi) >= 0)  # phi grows with a
    assert np.all(np.isfinite(out["v_of_phi"]))
    assert out["v_of_a"][0] > out["v_of_a"][-1]  # potential rolls downhill


def test_lcdm_limit_frozen_field():
    """w0 = -1: no kinetic energy, phi stays at 0, V = rho = const."""
    out = reconstruct(om=0.3, w0=-1.0)
    np.testing.assert_allclose(out["phi"], 0.0, atol=1e-12)
    np.testing.assert_allclose(out["v_of_a"], 1.0, rtol=1e-12)
