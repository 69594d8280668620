"""Test configuration.

* CPU-only (the ambient JAX_PLATFORMS=axon would route every test
  through the TPU tunnel's remote compiler).
* 8 virtual devices for sharding tests.
* float64 is NOT enabled globally: this container's single-core XLA:CPU
  compiles f64 programs ~30x slower than f32 (measured: 1.6s vs 36s for
  the same 50-op chain). Tests that check reference parity at <=1e-6
  take the ``x64`` fixture, which wraps them in jax.enable_x64(True);
  statistical tests (samplers) run in f32 like the TPU fast path.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax

# The axon sitecustomize calls jax.config.update("jax_platforms",
# "axon,cpu") at interpreter start, which overrides the env var — force
# CPU back programmatically so tests really run on the host.
jax.config.update("jax_platforms", "cpu")

import pytest

# Persistent compilation cache: this container's single-core XLA:CPU is
# compile-bound, so reruns should reuse executables.
_cache_dir = os.path.expanduser("~/.cache/cosmax_jax_cache")
os.makedirs(_cache_dir, exist_ok=True)
jax.config.update("jax_compilation_cache_dir", _cache_dir)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)


@pytest.fixture
def x64():
    """Parity mode: float64 for the duration of the test."""
    with jax.enable_x64(True):
        yield
