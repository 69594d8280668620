"""Quintessence reconstruction of the wzCDM dark-energy fluid.

JAX port of the reference's offline visualisation script (field.py):
given best-fit (Om, w0) from a wzCDM fit, reconstruct the scalar field
phi(a) and its potential V(phi) that reproduce

    w(a) = -1 + 2 (1+w0) a^3 / (1+a^3),
    rho_de(a) = (2 / (1+a^3))^{2 (1+w0)}   (field.py:20-24, natural units)

via  V(a) = (1 - w) rho/2  and  dphi/da = sqrt(rho (1+w)) / (a H(a))
(field.py:26-28), with phi(a) a cumulative-trapezoid integral on a
2000-pt grid in a in [1e-3, 3] (field.py:17,30).
"""

import numpy as np
import jax.numpy as jnp

from cosmax.ops.quadrature import cumtrapz

A_GRID = np.linspace(1e-3, 3.0, 2000)


def w_de(a, w0):
    return -1.0 + 2.0 * (1.0 + w0) * a**3 / (1.0 + a**3)


def rho_de(a, w0):
    return (2.0 / (1.0 + a**3)) ** (2.0 * (1.0 + w0))


def hubble_of_a(a, om, w0, o_r=4e-5, h0=1.0):
    return h0 * jnp.sqrt(
        om * a**-3 + o_r * a**-4 + (1.0 - om) * rho_de(a, w0)
    )


def reconstruct(om: float, w0: float, o_r: float = 4e-5, a_grid=None) -> dict:
    """Returns phi(a), V(phi), dphi/dt and the potential evaluated on a
    uniform phi grid — everything field.py:17-38 computes, as arrays."""
    a = jnp.asarray(A_GRID if a_grid is None else a_grid)
    w = w_de(a, w0)
    rho = rho_de(a, w0)
    h = hubble_of_a(a, om, w0, o_r)
    v_of_a = 0.5 * (1.0 - w) * rho
    dphi_da = jnp.sqrt(jnp.clip(rho * (1.0 + w), 0.0, None)) / (a * h)
    phi = cumtrapz(dphi_da, a)
    dphi_dt = dphi_da * h * a
    # cosmic time t(a) = int da / (a H) (field.py:74-75, H0=1 units)
    t = cumtrapz(1.0 / (a * h), a)
    phi_grid = jnp.linspace(phi.min(), phi.max(), a.shape[0])
    # V(phi) via monotone interpolation of a(phi)
    a_of_phi = jnp.interp(phi_grid, phi, a)
    v_of_phi = 0.5 * (1.0 - w_de(a_of_phi, w0)) * rho_de(a_of_phi, w0)
    return dict(
        a=np.asarray(a),
        phi=np.asarray(phi),
        v_of_a=np.asarray(v_of_a),
        dphi_dt=np.asarray(dphi_dt),
        t=np.asarray(t),
        phi_grid=np.asarray(phi_grid),
        v_of_phi=np.asarray(v_of_phi),
    )
