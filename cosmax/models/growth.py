"""Linear growth of structure for the fsigma8 likelihood.

Transcribes the reference's growth system exactly (fs8/fs8.py:35-69),
**including its simplification** dH^2/da = -3 Om / a^4 (matter-only
derivative of E^2 even for evolving dark energy) — parity requires
reproducing that choice, not "fixing" it.

    delta''(a) = -(3/a + H'/H) delta' + (3/2) (Om / a^5) / E^2 * delta

integrated on the reference's grid a in logspace(-3, 0, 1000) from
y0 = [a0, 1], then fsigma8(z) = sigma8 * a * delta'(a) / delta(1) with
linear interpolation on the same grid (fs8/fs8.py:63-69).
"""

import numpy as np
import jax.numpy as jnp

from cosmax.models.background import e2_of_z
from cosmax.ops.ode import rk4

A_GRID = np.logspace(-3.0, 0.0, 1000)


def growth_solution(params, model, a_grid=None, substeps: int = 4):
    """Integrate the growth ODE; returns (delta, ddelta_da) on a_grid."""
    a_grid = A_GRID if a_grid is None else a_grid
    om = params["Om"]

    def rhs(a, y):
        z = 1.0 / a - 1.0
        e2 = e2_of_z(z, params, model)
        dhh_da = -3.0 * om / a**4  # reference fs8/fs8.py:41
        hprime_over_h = 0.5 * dhh_da / e2
        ddelta = y[1]
        ddelta_da = -(3.0 / a + hprime_over_h) * y[1] + 1.5 * (om / a**5) / e2 * y[0]
        return jnp.stack([ddelta, ddelta_da])

    dt = jnp.result_type(om, 1.0)
    a_grid = jnp.asarray(a_grid, dtype=dt)
    y0 = jnp.array([a_grid[0], 1.0], dtype=dt)
    ys = rk4(rhs, y0, a_grid, substeps=substeps)
    return a_grid, ys[:, 0], ys[:, 1]


def fsigma8(z, params, model, substeps: int = 4):
    """fsigma8(z) = sigma8 * a * delta'(a) / delta(a=1)
    (reference fs8/fs8.py:65-69). params needs 'Om', 'sigma8' (+ DE)."""
    a_grid, delta, ddelta = growth_solution(params, model, substeps=substeps)
    a_z = 1.0 / (1.0 + jnp.asarray(z))
    dd = jnp.interp(a_z, a_grid, ddelta)
    return params["sigma8"] * a_z * dd / delta[-1]
