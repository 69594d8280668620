"""Precision policy.

The reference computes everything in numpy float64. TPUs have no native
f64, so cosmax uses a two-mode policy:

* fast mode (TPU default): float32 arrays with numerically-stabilised
  formulations (whitened residuals, compensated constants prefolded in
  f64 numpy at build time);
* parity mode (CPU tests / verification): float64 via
  ``cosmax.enable_x64()``; every builder takes an explicit ``dtype``.

``default_dtype()`` resolves to f64 when x64 is enabled, else f32.
"""

import jax
import jax.numpy as jnp


def default_dtype():
    return jnp.float64 if jax.config.jax_enable_x64 else jnp.float32


def canonical_dtype(dtype=None):
    return default_dtype() if dtype is None else jnp.dtype(dtype)
