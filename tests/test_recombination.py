"""Direct validation of the recombination-era integrals against scipy.

The reference evaluates the sound horizon r_s(z) and the comoving
distance D_C(z) with adaptive scipy.integrate.quad per likelihood call
(cmb/data_chen_compression.py:70-82); cosmax replaces both with
fixed-order Gauss-Legendre rules (cosmax/models/recombination.py).
These tests pin the GL results against scipy.quad on the identical
integrands, and the fitting formulae against Planck-fiducial values.
"""

import numpy as np
import scipy.integrate

from cosmax.constants import C_KM_S, O_GAMMA_H2
from cosmax.models.recombination import (
    comoving_distance_to,
    r_drag_aizpuru,
    r_drag_desi,
    sound_horizon,
    z_drag,
    z_drag_hu,
    z_star,
    z_star_hu,
)

WB, WM, H0 = 0.02236, 0.1432, 67.36
OM = WM / (H0 / 100.0) ** 2
OR = 4.18343e-5 / (H0 / 100.0) ** 2  # Or h^2 of the chen compression
PARAMS = {"Om": OM, "Or": OR}


def _e(z):
    cubed = (1.0 + z) ** 3
    return np.sqrt(OR * cubed * (1.0 + z) + OM * cubed + (1.0 - OM - OR))


def test_sound_horizon_vs_quad(x64):
    zs = z_star(WB, WM)
    rb = 3.0 * WB / (4.0 * O_GAMMA_H2)

    def integrand(a):
        return C_KM_S / (a**2 * _e(1.0 / a - 1.0) * np.sqrt(3.0 * (1.0 + rb * a)))

    want = scipy.integrate.quad(integrand, 0.0, 1.0 / (1.0 + zs), limit=200)[0] / H0
    got = float(sound_horizon(zs, PARAMS, "lcdm", H0, WB, order=128))
    assert abs(got - want) < 1e-10 * want


def test_comoving_distance_vs_quad(x64):
    zs = z_star(WB, WM)
    want = scipy.integrate.quad(
        lambda z: C_KM_S / _e(z), 0.0, zs, limit=400
    )[0] / H0
    got = float(comoving_distance_to(zs, PARAMS, "lcdm", H0, order=64))
    assert abs(got - want) < 1e-8 * want


def test_fitting_formulae_fiducial():
    # Planck-2018-like fiducials: the published formulae quote ~1089 for
    # z*, ~1060 for z_drag, and ~147 Mpc for r_drag at these densities.
    assert abs(z_star(WB, WM) - 1089.0) < 2.0
    assert abs(z_star_hu(WB, WM) - 1089.0) < 3.0
    assert abs(z_drag(WB, WM) - 1060.0) < 2.0
    # Eisenstein & Hu 1998 sits ~3-4 higher than the modern fits
    assert abs(z_drag_hu(WB, WM) - 1060.0) < 5.0
    assert abs(r_drag_aizpuru(WB, WM) - 147.0) < 1.0
    assert abs(r_drag_desi(WB, WM) - 147.0) < 0.5
