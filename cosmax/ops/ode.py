"""Fixed-step ODE integration under ``lax.scan``.

Replaces the reference's ``scipy.integrate.solve_ivp`` (fs8/fs8.py:52-59)
inside the jitted likelihood: adaptive stepping is data-dependent control
flow XLA can't compile, so we integrate on a static grid with enough
substeps that the discretisation error is far below the reference's
rtol=1e-8 (validated against scipy.solve_ivp in tests/test_growth.py).
"""

import jax
import jax.numpy as jnp


def rk4(f, y0, ts, substeps: int = 4):
    """Classic RK4 along the (static) grid ``ts``; returns y at every
    grid point, shape [len(ts), *y0.shape]. ``f(t, y) -> dy/dt`` must be
    jit-pure. Each grid interval is split into ``substeps`` RK4 steps.
    """
    ts = jnp.asarray(ts)

    def step(y, t0, dt):
        k1 = f(t0, y)
        k2 = f(t0 + dt / 2, y + dt / 2 * k1)
        k3 = f(t0 + dt / 2, y + dt / 2 * k2)
        k4 = f(t0 + dt, y + dt * k3)
        return y + (dt / 6) * (k1 + 2 * k2 + 2 * k3 + k4)

    def interval(y, t_pair):
        t0, t1 = t_pair
        dt = (t1 - t0) / substeps

        def sub(i, yy):
            return step(yy, t0 + i * dt, dt)

        y1 = jax.lax.fori_loop(0, substeps, sub, y)
        return y1, y1

    _, ys = jax.lax.scan(interval, y0, (ts[:-1], ts[1:]))
    return jnp.concatenate([y0[None], ys], axis=0)
