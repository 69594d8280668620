"""Fast-mode switch.

Presets default to the reference-matched parity discretisations
(dynamic trapezoids, cumulative-trapezoid SN grids). Inside
``use_fast_mode()`` the builders swap in the production TPU path:
Gauss-Legendre BAO distances and the compressed (Chebyshev-basis)
SN chi^2 — both converged beyond the reference's own discretisation
error (see tests/test_compressed_sn.py). ``get_preset(..., fast=True)``
wraps preset construction in this context.
"""

from contextlib import contextmanager

_FAST = False
GL_ORDER = 64


def fast_mode() -> bool:
    return _FAST


@contextmanager
def use_fast_mode(on: bool = True):
    global _FAST
    prev = _FAST
    _FAST = on
    try:
        if on:
            # terms built in one fast-mode scope co-compress their
            # parameter-grid emulators into a single rank program per
            # (model, grid) — the whole joint's geometry then costs one
            # barycentric contraction (models.linear_chi2 docstring)
            from cosmax.models.linear_chi2 import bundle_scope

            with bundle_scope():
                yield
        else:
            yield
    finally:
        _FAST = prev
