import numpy as np
import jax.numpy as jnp
import pytest

from cosmax.models.background import de_density, e2_of_z, e_of_z, MODELS
from tests import oracles


Z = np.linspace(0.0, 3.0, 17)


@pytest.mark.parametrize("model", MODELS)
def test_e_of_z_matches_oracle(x64, model):
    p = {"Om": 0.31, "w0": -0.85, "wa": 0.2}
    got = np.asarray(e_of_z(jnp.asarray(Z), p, model))
    want = oracles.e_of_z(Z, 0.31, model, w0=-0.85, wa=0.2)
    np.testing.assert_allclose(got, want, rtol=5e-14)


def test_e_at_zero_is_one(x64):
    for model in MODELS:
        p = {"Om": 0.3, "w0": -0.9, "wa": 0.1}
        assert float(e2_of_z(jnp.asarray(0.0), p, model)) == pytest.approx(1.0, abs=1e-14)


def test_lcdm_limits(x64):
    """w0 = -1 reduces wcdm and wzcdm to lcdm; wa = 0 reduces cpl to wcdm."""
    p = {"Om": 0.3, "w0": -1.0, "wa": 0.0}
    z = jnp.asarray(Z)
    lcdm = de_density(z, p, "lcdm")
    np.testing.assert_allclose(np.asarray(de_density(z, p, "wcdm")), lcdm, rtol=5e-14)
    np.testing.assert_allclose(np.asarray(de_density(z, p, "wzcdm")), lcdm, rtol=5e-14)
    p2 = {"Om": 0.3, "w0": -0.8, "wa": 0.0}
    np.testing.assert_allclose(
        np.asarray(de_density(z, p2, "w0wacdm")),
        np.asarray(de_density(z, p2, "wcdm")),
        rtol=1e-14,
    )


def test_radiation_branch(x64):
    p = {"Om": 0.31, "Or": 8e-5}
    got = np.asarray(e_of_z(jnp.asarray(Z), p, "lcdm"))
    want = oracles.e_of_z(Z, 0.31, "lcdm", o_r=8e-5)
    np.testing.assert_allclose(got, want, rtol=5e-14)
