"""Direct validation of the growth ODE path against scipy.

The reference integrates the growth system with scipy.integrate.solve_ivp
at rtol=1e-8 (fs8/fs8.py:52-59); cosmax uses fixed-step RK4 on the same
logspace grid (cosmax/ops/ode.py). These tests pin the RK4 solution —
and the derived fsigma8 observable — against solve_ivp on the identical
right-hand side.
"""

import numpy as np
import pytest
import scipy.integrate

from cosmax.models.growth import A_GRID, fsigma8, growth_solution


def _solve_ivp_growth(om, w0=None, wa=None):
    """The reference's growth system (fs8/fs8.py:35-59), pure numpy."""

    def e2(a):
        z = 1.0 / a - 1.0
        if w0 is None:
            de = 1.0 - om
        else:
            wA = 0.0 if wa is None else wa
            de = (1.0 - om) * (1.0 + z) ** (3.0 * (1.0 + w0 + wA)) * np.exp(
                -3.0 * wA * z / (1.0 + z)
            )
        return om * (1.0 + z) ** 3 + de

    def rhs(a, y):
        ee = e2(a)
        dhh_da = -3.0 * om / a**4  # the reference's simplification
        hprime_over_h = 0.5 * dhh_da / ee
        return [y[1], -(3.0 / a + hprime_over_h) * y[1] + 1.5 * (om / a**5) / ee * y[0]]

    sol = scipy.integrate.solve_ivp(
        rhs, (A_GRID[0], A_GRID[-1]), [A_GRID[0], 1.0],
        t_eval=A_GRID, rtol=1e-10, atol=1e-12, method="RK45",
    )
    return sol.y[0], sol.y[1]


@pytest.mark.parametrize(
    "params,model",
    [
        ({"Om": 0.30}, "lcdm"),
        ({"Om": 0.27}, "lcdm"),
        ({"Om": 0.30, "w0": -0.9}, "wcdm"),
        ({"Om": 0.31, "w0": -0.85, "wa": -0.4}, "w0wacdm"),
    ],
)
def test_rk4_matches_solve_ivp(params, model, x64):
    delta_ref, ddelta_ref = _solve_ivp_growth(
        params["Om"], params.get("w0"), params.get("wa")
    )
    _, delta, ddelta = growth_solution(params, model)
    np.testing.assert_allclose(np.asarray(delta), delta_ref, rtol=1e-8)
    np.testing.assert_allclose(np.asarray(ddelta), ddelta_ref, rtol=1e-8)


def test_fsigma8_matches_solve_ivp(x64):
    om, s8 = 0.28, 0.80
    delta_ref, ddelta_ref = _solve_ivp_growth(om)
    z = np.array([0.02, 0.2, 0.8, 1.4])
    a_z = 1.0 / (1.0 + z)
    want = s8 * a_z * np.interp(a_z, A_GRID, ddelta_ref) / delta_ref[-1]
    got = np.asarray(fsigma8(z, {"Om": om, "sigma8": s8}, "lcdm"))
    np.testing.assert_allclose(got, want, rtol=1e-8)
