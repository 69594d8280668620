"""Persistent XLA compile cache shared by every cosmax entry point.

The remote TPU compile service behind the tunnel is sometimes busy (a
30 s compile can take minutes under load), and the whole-chain
``lax.scan`` programs recompile per (steps, walkers) shape — repeat
CLI runs should reuse the executable. bench.py, the test conftest and
all CLIs call this.
"""

import os


def enable_compile_cache(path: str = None) -> str:
    import jax

    cache = path or os.environ.get(
        "COSMAX_COMPILE_CACHE",
        os.path.expanduser("~/.cache/cosmax_jax_cache"),
    )
    os.makedirs(cache, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", cache)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    return cache
