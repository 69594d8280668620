"""Clean-room numpy/scipy oracles of the reference suite's numerics.

These reimplement the algorithms described in SURVEY.md SS2.2 (per-point
dynamic trapezoids, cumulative-trapezoid SN grids, adaptive-quad sound
horizons, the growth ODE) in plain numpy/scipy, independent of the JAX
code under test. Parity tests check cosmax against these to ~1e-9 and
against the published docstring chi^2 values to their printed precision.
"""

import numpy as np
import scipy.integrate
import scipy.linalg

C = 299792.458


def rho_de(z, model, w0=-1.0, wa=0.0):
    opz = 1.0 + np.asarray(z, dtype=np.float64)
    if model == "lcdm":
        return np.ones_like(opz)
    if model == "wcdm":
        return opz ** (3 * (1 + w0))
    if model == "wzcdm":
        cubed = opz**3
        return (2 * cubed / (1 + cubed)) ** (2 * (1 + w0))
    if model == "w0wacdm":
        return opz ** (3 * (1 + w0 + wa)) * np.exp(-3 * wa * (opz - 1) / opz)
    raise ValueError(model)


def e_of_z(z, om, model, w0=-1.0, wa=0.0, o_r=0.0):
    opz = 1.0 + np.asarray(z, dtype=np.float64)
    ode = 1.0 - om - o_r
    return np.sqrt(o_r * opz**4 + om * opz**3 + ode * rho_de(z, model, w0, wa))


def hubble(z, h0, om, model, w0=-1.0, wa=0.0, o_r=0.0):
    return h0 * e_of_z(z, om, model, w0, wa, o_r)


def dm_trapz(z_points, h0, om, model, w0=-1.0, wa=0.0, n_base=300, dynamic=True,
             o_r=0.0):
    """Per-point dynamic trapezoid D_M, the reference's BAO scheme."""
    out = np.empty(len(z_points), dtype=np.float64)
    for i, zi in enumerate(np.atleast_1d(z_points)):
        n = max(n_base, int(n_base * zi)) if dynamic else n_base
        x = np.linspace(0.0, zi, num=n)
        y = C / hubble(x, h0, om, model, w0, wa, o_r)
        out[i] = np.trapezoid(y, x)
    return out


def bao_theory(z, qty, h0, om, model, w0=-1.0, rd=147.09, n_base=300, o_r=0.0):
    dh = C / hubble(z, h0, om, model, w0, o_r=o_r)
    dm = dm_trapz(z, h0, om, model, w0, n_base=n_base, o_r=o_r)
    dv = (z * dh * dm**2) ** (1.0 / 3.0)
    table = np.stack([dv, dm, dh])
    return table[qty, np.arange(len(z))] / rd


def gaussian_chi2(delta, cov):
    return float(delta @ np.linalg.solve(cov, delta))


def sn_apparent_mag(z_cmb, one_plus_z_hel, om, model, w0=-1.0, h0=70.0,
                    offset=0.0, grid_num=1000):
    """Cumulative-trapezoid SN magnitudes (reference sn/pantheon.py:32-35)."""
    grid = np.linspace(0.0, np.max(z_cmb), num=grid_num)
    inv_e = 1.0 / e_of_z(grid, om, model, w0)
    cum = scipy.integrate.cumulative_trapezoid(inv_e, grid, initial=0)
    integral = np.interp(z_cmb, grid, cum)
    return offset + 25.0 + 5.0 * np.log10(one_plus_z_hel * (C / h0) * integral)


def rs_quad(z, h0, om, wb, model, w0=-1.0, o_gamma_h2=(0.75 / 31500) * (2.7255 / 2.7) ** 4,
            o_r=0.0):
    """Adaptive-quad sound horizon (reference cmb/data_chen_compression.py:70-77)."""
    rb = 3 * wb / (4 * o_gamma_h2)

    def integrand(a):
        zz = 1.0 / a - 1.0
        denom = a**2 * e_of_z(zz, om, model, w0, o_r=o_r) * np.sqrt(3 * (1 + rb * a))
        return C / denom

    return scipy.integrate.quad(integrand, 0.0, 1.0 / (1.0 + z))[0] / h0


def dc_quad(z, h0, om, model, w0=-1.0, o_r=0.0):
    """Adaptive-quad comoving distance to z (DA_z * (1+z) in the reference)."""
    integral = scipy.integrate.quad(
        lambda zp: C / e_of_z(zp, om, model, w0, o_r=o_r), 0.0, z
    )[0]
    return integral / h0


def growth_fs8(zs, om, s8, model, w0=-1.0):
    """solve_ivp growth factor (reference fs8/fs8.py:35-69)."""
    a_vals = np.logspace(-3, 0, 1000)

    def deriv(a, y):
        z = 1.0 / a - 1.0
        e2 = e_of_z(z, om, model, w0) ** 2
        dhh_da = -3 * om / a**4
        hprime_over_h = 0.5 * dhh_da / e2
        return [y[1], -(3 / a + hprime_over_h) * y[1] + 1.5 * (om / a**5) / e2 * y[0]]

    sol = scipy.integrate.solve_ivp(
        deriv, (a_vals[0], a_vals[-1]), [a_vals[0], 1.0], t_eval=a_vals,
        rtol=1e-8, atol=1e-10,
    )
    a_z = 1.0 / (1.0 + np.asarray(zs))
    dd = np.interp(a_z, a_vals, sol.y[1])
    return s8 * a_z * dd / sol.y[0][-1]
