"""Recombination / drag-epoch fitting formulae and the sound horizon.

Fitting formulae are exact transcriptions of the published equations the
reference uses (arXiv:2106.00428 eqs A2/A4/8, Hu & Sugiyama 1996 eqs
1-2, DESI DR2 eq 2) — reference cmb/data_chen_compression.py:45-113,
cmb/data_desi_compression.py:61-104.

The sound-horizon and comoving-angular integrals replace the
reference's per-likelihood-call adaptive ``scipy.integrate.quad``
(data_chen_compression.py:70-82) with fixed-order Gauss-Legendre in the
scale factor. The rs integrand c / (a^2 E(1/a-1) sqrt(3 (1 + Rb a))) is
finite at a -> 0 when radiation is included (a^2 E -> sqrt(Or)), so GL
on [0, a*] converges rapidly; order 128 matches scipy.quad to ~1e-12
relative (verified in tests/test_recombination.py).
"""

import jax.numpy as jnp

from cosmax.constants import C_KM_S, O_GAMMA_H2
from cosmax.models.background import e_of_z
from cosmax.ops.quadrature import gl_nodes_01


def z_star(wb, wm):
    """Redshift of photon decoupling, arXiv:2106.00428 eq A4
    (reference cmb/data_chen_compression.py:45-49)."""
    return (391.672 * wm ** (-0.372296) + 937.422 * wb ** (-0.97966)) / (
        wm ** (-0.0192951) * wb ** (-0.93681)
    ) + wm ** (-0.731631)


def z_star_hu(wb, wm):
    """Hu & Sugiyama 1996 eq 1 (reference cmb/data_chen_compression.py:52-59)."""
    g1 = 0.0783 * wb**-0.238 / (1.0 + 39.5 * wb**0.763)
    g2 = 0.560 / (1.0 + 21.1 * wb**1.81)
    return 1048.0 * (1.0 + 0.00124 * wb**-0.738) * (1.0 + g1 * wm**g2)


def z_drag(wb, wm):
    """Drag epoch, arXiv:2106.00428 eq A2 (reference
    cmb/data_chen_compression.py:62-67)."""
    return (
        1.0 + 428.169 * wb**0.256459 * wm**0.616388 + 925.56 * wm**0.751615
    ) * wm**-0.714129


def z_drag_hu(wb, wm):
    """Eisenstein & Hu drag redshift (reference
    cmb/data_desi_compression.py:86-96)."""
    b1 = 0.313 * wm**-0.419 * (1.0 + 0.607 * wm**0.674)
    b2 = 0.238 * wm**0.223
    return (1345.0 * wm**0.251 / (1.0 + 0.659 * wm**0.828)) * (1.0 + b1 * wb**b2)


def r_drag_aizpuru(wb, wm):
    """Sound horizon at the drag epoch, arXiv:2106.00428 eq 8
    (reference cmb/data_chen_compression.py:96-112). Mpc."""
    a1, a2, a3 = 0.00257366, 0.05032, 0.013
    a4, a5, a6 = 0.7720642, 0.24346362, 0.00641072
    a7, a8, a9 = 0.5350899, 32.7525, 0.315473
    term_a = 1.0 / (a1 * wb**a2 + a3 * wb**a4 * wm**a5 + a6 * wm**a7)
    return term_a - a8 / wm**a9


def r_drag_desi(wb, wm, n_eff=3.044):
    """DESI DR2 fitting form, arXiv:2503.14738 eq 2
    (reference cmb/data_desi_compression.py:61-65). Mpc."""
    return 147.05 * (0.02236 / wb) ** 0.13 * (0.1432 / wm) ** 0.23 * (3.04 / n_eff) ** 0.1


def sound_horizon(z, params, model, h0, wb, order: int = 128, o_gamma_h2=O_GAMMA_H2):
    """r_s(z) = int_0^{a(z)} c da / (a^2 H(1/a-1) sqrt(3 (1+Rb a))) [Mpc].

    GL replacement for the reference's scipy.quad
    (cmb/data_chen_compression.py:70-77). ``params`` must include 'Or'
    (radiation), otherwise the a->0 endpoint diverges — exactly as in
    the reference, where rs is only evaluated in radiation-aware fits.
    ``o_gamma_h2`` is compression-specific (the Union3 compression uses
    its own photon density, cmb/data_union3_compression.py:29-30).
    """
    rb = 3.0 * wb / (4.0 * o_gamma_h2)
    a_end = 1.0 / (1.0 + z)
    t, w = gl_nodes_01(order)
    a = a_end * jnp.asarray(t, dtype=jnp.result_type(z, 1.0))
    wq = a_end * jnp.asarray(w, dtype=a.dtype)
    ez = e_of_z(1.0 / a - 1.0, params, model)
    integ = C_KM_S / (a**2 * ez * jnp.sqrt(3.0 * (1.0 + rb * a)))
    return jnp.sum(integ * wq, axis=-1) / h0


def comoving_distance_to(z, params, model, h0, order: int = 64):
    """D_C(z) = int_0^z c dz'/H(z') via the log-a substitution
    int_{ln a*}^{0} c du / (a H(1/a-1)) — the integrand spans orders of
    magnitude in a out to z* ~ 1100 but is gentle in ln a: GL-32
    already reaches ~4e-11 Mpc vs scipy.quad, where a linear-in-a rule
    needs >128 nodes for 1e-5 Mpc.

    GL replacement for DA_z's scipy.quad (data_chen_compression.py:80-82).
    Returns the comoving distance in Mpc; D_A = D_C / (1+z).
    """
    u0 = jnp.log(1.0 / (1.0 + z))  # ln a*
    t, w = gl_nodes_01(order)
    dt = jnp.result_type(z, 1.0)
    u = u0 * (1.0 - jnp.asarray(t, dtype=dt))  # ln a* -> 0
    a = jnp.exp(u)
    wq = -u0 * jnp.asarray(w, dtype=dt)
    ez = e_of_z(1.0 / a - 1.0, params, model)
    integ = C_KM_S / (a * ez)
    return jnp.sum(integ * wq, axis=-1) / h0
