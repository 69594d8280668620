"""Debug / observability helpers (SURVEY.md SS5: the reference has no
tracing, sanitizer, or profiling subsystem — these are cosmax's).

* ``enable_nan_checks()`` — turn on jax debug_nans/debug_infs so any
  NaN inside a jitted likelihood raises at the producing primitive
  (the reference silently maps NaN log-probs to -inf; cosmax does the
  same in production via make_log_prob's guard, but behind this flag
  the source is surfaced instead).
* ``profile_trace(dir)`` — context manager around jax.profiler for a
  TensorBoard-loadable trace of the sampling hot loop.
* ``timed_evals(fn, args, iters)`` — steady-state evals/sec with a
  forced host fetch (the axon tunnel's block_until_ready is async).
"""

import contextlib
import time

import numpy as np
import jax


def enable_nan_checks(on: bool = True):
    jax.config.update("jax_debug_nans", on)
    jax.config.update("jax_debug_infs", on)


@contextlib.contextmanager
def profile_trace(log_dir: str):
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def timed_evals(fn, args, iters: int = 20, warmup: int = 1):
    """Returns (evals_per_call * iters / seconds, seconds)."""
    for _ in range(warmup):
        out = fn(*args)
    np.asarray(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    np.asarray(out)
    dt = time.perf_counter() - t0
    return iters / dt, dt
