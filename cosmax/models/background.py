"""Background expansion E(z) for the supported dark-energy model family.

One parameterised pure function replaces the reference's practice of
editing the ``rho_de`` line of every script in place (the docstrings in
e.g. bao/desi.py:202-275 record LCDM / wCDM / wzCDM variants of the same
file). The model is selected by a *static* string so each variant jits
to its own specialised XLA program with no runtime branching.

Models (rho_de(z) / rho_de(0)):

* ``lcdm``    : 1
* ``wcdm``    : (1+z)^{3 (1+w0)}
* ``wzcdm``   : (2 (1+z)^3 / (1 + (1+z)^3))^{2 (1+w0)}   — the reference's
                custom w(z) = -1 + 2 (1+w0) / (1 + (1+z)^3)
                (bao/desi.py:14-21)
* ``w0wacdm`` : CPL, (1+z)^{3 (1+w0+wa)} exp(-3 wa z / (1+z))

Flat universe throughout (as in the reference). Radiation is included
only when ``params`` carries an ``'Or'`` entry (CMB / BBN-coupled fits:
bao/desi_cmb_des5y.py:28-37, cmb/cmb.py:12-19).

``params`` is a dict of scalars (or walker-batched arrays — everything
broadcasts); z arrays live on trailing axes.
"""

import jax.numpy as jnp

MODELS = ("lcdm", "wcdm", "wzcdm", "w0wacdm")


def de_density(z, params, model: str):
    """rho_de(z) / rho_de(0) for a static model name.

    Powers with parameter-dependent exponents are written as
    exp(k * log(base)): z lives on static quadrature grids in the hot
    loop, so XLA constant-folds log(base) and each evaluation costs one
    exp instead of the backend pow's internal log+exp per element
    (XLA does not fold the log inside power(const, traced)).
    """
    if model == "lcdm":
        return jnp.ones_like(z)
    one_plus_z = 1.0 + z
    if model == "wcdm":
        w0 = params["w0"]
        return jnp.exp(3.0 * (1.0 + w0) * jnp.log(one_plus_z))
    if model == "wzcdm":
        w0 = params["w0"]
        cubed = one_plus_z**3
        return jnp.exp(
            2.0 * (1.0 + w0) * jnp.log(2.0 * cubed / (1.0 + cubed))
        )
    if model == "w0wacdm":
        w0, wa = params["w0"], params["wa"]
        return jnp.exp(
            3.0 * (1.0 + w0 + wa) * jnp.log(one_plus_z)
            - 3.0 * wa * z / one_plus_z
        )
    raise ValueError(f"unknown model {model!r}; expected one of {MODELS}")


def e2_of_z(z, params, model: str):
    """E^2(z) = H^2(z)/H0^2 for a flat universe.

    With radiation (params['Or'] present):
        E^2 = Or (1+z)^4 + Om (1+z)^3 + (1 - Om - Or) rho_de
    (reference cmb/cmb.py:12-19); else Or = 0 (bao/desi.py:14-21).
    """
    om = params["Om"]
    one_plus_z = 1.0 + z
    cubed = one_plus_z**3
    rho = de_density(z, params, model)
    if "Or" in params:
        o_r = params["Or"]
        ode = 1.0 - om - o_r
        return o_r * cubed * one_plus_z + om * cubed + ode * rho
    return om * cubed + (1.0 - om) * rho


def e_of_z(z, params, model: str):
    return jnp.sqrt(e2_of_z(z, params, model))


def hubble(z, params, model: str):
    """H(z) in km/s/Mpc. params must carry 'H0' (km/s/Mpc)."""
    return params["H0"] * e_of_z(z, params, model)


def omega_r_of(h, om):
    """Matter-radiation-equality parameterisation of Omega_r used by the
    reference's CMB scripts (cmb/data_chen_compression.py:35-41):
    z_eq = 24077.44 Om h^2, Or = Om / (1 + z_eq)."""
    z_eq = 24077.44 * om * h**2
    return om / (1.0 + z_eq)
