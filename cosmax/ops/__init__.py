from cosmax.ops.quadrature import (
    gauss_legendre,
    gl_integrate_01,
    cumtrapz,
    trapz_grid_weights,
)
from cosmax.ops.linalg import whitening_operator, chi2_from_whitener

__all__ = [
    "gauss_legendre",
    "gl_integrate_01",
    "cumtrapz",
    "trapz_grid_weights",
    "whitening_operator",
    "chi2_from_whitener",
]
