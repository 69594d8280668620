"""Deterministic point fits — a capability the reference lacks
(it only reports MCMC medians; SURVEY.md SS2.5 notes "no scipy
least-squares anywhere").

* ``minimize_chi2`` — damped-Newton / Levenberg-Marquardt on the total
  chi^2 using exact ``jax.grad`` + ``jax.hessian`` (parameter spaces
  here are <= 8-dim, so the Hessian is cheap and the quadratic model is
  exact for the Gaussian terms);
* ``adam_minimize`` — optax Adam under ``lax.scan`` for rough descent
  (the GP module uses the same pattern, cosmax/gp/exact_gp.py).
"""

import numpy as np
import jax
import jax.numpy as jnp


def adam_minimize(loss_fn, x0, iters: int = 1000, lr: float = 1e-2):
    import optax

    opt = optax.adam(lr)

    @jax.jit
    def run(x):
        state = opt.init(x)

        def step(carry, _):
            xx, ss = carry
            loss, grads = jax.value_and_grad(loss_fn)(xx)
            updates, ss = opt.update(grads, ss, xx)
            return (optax.apply_updates(xx, updates), ss), loss

        (x, _), losses = jax.lax.scan(step, (x, state), None, length=iters)
        return x, losses

    x, losses = run(jnp.asarray(x0))
    return x, np.asarray(losses)


def minimize_chi2(
    chi2_fn,
    x0,
    bounds=None,
    iters: int = 100,
    lam0: float = 1e-3,
    tol: float = 1e-10,
):
    """Levenberg-damped Newton on a scalar chi^2.

    chi2_fn: jittable [D] -> scalar; bounds [D, 2] optional clipping.
    Returns (x_best, chi2_best, info). Runs the trust-region damping
    loop on host (cheap: tens of Hessian evals of a small jitted fn).
    """
    grad_fn = jax.jit(jax.grad(chi2_fn))
    hess_fn = jax.jit(jax.hessian(chi2_fn))
    chi2_jit = jax.jit(chi2_fn)

    x = np.asarray(x0, dtype=np.float64)
    lam = lam0
    f = float(chi2_jit(x))
    n_evals = 1
    for it in range(iters):
        g = np.asarray(grad_fn(x), dtype=np.float64)
        h = np.asarray(hess_fn(x), dtype=np.float64)
        for _ in range(25):
            try:
                step = np.linalg.solve(h + lam * np.diag(np.diag(h) + 1e-12), -g)
            except np.linalg.LinAlgError:
                lam *= 10.0
                continue
            x_new = x + step
            if bounds is not None:
                b = np.asarray(bounds, dtype=np.float64)
                x_new = np.clip(x_new, b[:, 0] + 1e-9, b[:, 1] - 1e-9)
            f_new = float(chi2_jit(x_new))
            n_evals += 1
            if np.isfinite(f_new) and f_new < f:
                lam = max(lam / 3.0, 1e-12)
                improvement = f - f_new
                x, f = x_new, f_new
                break
            lam *= 10.0
        else:
            break
        if improvement < tol * max(1.0, abs(f)):
            break
    return x, f, dict(iterations=it + 1, chi2_evals=n_evals, lambda_=lam)


def best_fit(fit, x0=None, **kwargs):
    """Point estimate for a FitSpec: LM-Newton on the total chi^2 from
    the bounds midpoint (or x0)."""
    breakdown = fit.chi2_breakdown()

    def total(theta):
        return sum(breakdown(theta).values())

    if x0 is None:
        x0 = 0.5 * (fit.spec.bounds[:, 0] + fit.spec.bounds[:, 1])
    x, f, info = minimize_chi2(total, x0, bounds=fit.spec.bounds, **kwargs)
    return {name: float(v) for name, v in zip(fit.spec.names, x)}, f, info


def map_fit(fit, x0=None, **kwargs):
    """Posterior-mode fit: LM-Newton on -2 log_prob (NOT the raw chi^2 —
    for likelihoods with parameter-dependent normalisations, e.g. the
    f_cc-rescaled CC term whose chi^2/f^2 alone is minimised by pushing
    f to its bound, the mode of the posterior is the only well-defined
    point estimate). Coincides with ``best_fit`` when no log_norm terms
    are present. Returns ({name: value}, -2 logL at the mode, info)."""
    lp = fit.log_prob()

    def nll(theta):
        return -2.0 * lp(theta)

    if x0 is None:
        x0 = 0.5 * (fit.spec.bounds[:, 0] + fit.spec.bounds[:, 1])
    x, f, info = minimize_chi2(nll, x0, bounds=fit.spec.bounds, **kwargs)
    return {name: float(v) for name, v in zip(fit.spec.names, x)}, f, info


def laplace(log_prob_fn, x_map):
    """Gaussian (Laplace/Fisher) approximation around a mode.

    covariance = inverse Hessian of -log_prob at ``x_map`` (exact
    ``jax.hessian``, no finite differences). Returns
    ``(cov [D,D], sigma [D], corr [D,D])``. Seconds instead of an MCMC
    run — the instant error forecast the reference has no analogue for
    (it only reports chain percentiles, e.g. bao/desi.py:143-147).
    """
    x = jnp.asarray(np.asarray(x_map, dtype=np.float64))
    h = np.asarray(jax.hessian(lambda t: -log_prob_fn(t))(x), dtype=np.float64)
    if not np.all(np.isfinite(h)):
        raise ValueError("Hessian not finite at x_map (mode on a bound?)")
    cov = np.linalg.inv(h)
    sig = np.sqrt(np.diag(cov))
    corr = cov / np.outer(sig, sig)
    return cov, sig, corr


def laplace_fit(fit, x0=None, **kwargs):
    """MAP + Laplace errors for a FitSpec: posterior-mode LM fit
    (``map_fit``, so parameter-dependent normalisation terms of f_cc /
    quasar-scatter likelihoods are included), then the inverse-Hessian
    covariance of the full log-posterior at the mode.

    Returns ``(params {name: (map, sigma)}, chi2_at_map, corr [D,D])``
    where chi2_at_map is the total data chi^2 evaluated at the mode.
    """
    best, _, _ = map_fit(fit, x0=x0, **kwargs)
    x = np.asarray([best[n] for n in fit.spec.names], dtype=np.float64)
    _, sig, corr = laplace(fit.log_prob(), x)
    chi2_at_map = float(sum(fit.chi2_breakdown()(jnp.asarray(x)).values()))
    params = {n: (float(v), float(s)) for n, v, s in zip(fit.spec.names, x, sig)}
    return params, chi2_at_map, corr


def map_jitter_init(fit, key, n_chains, scale=1.0):
    """Initial chain positions at the posterior mode with
    ``scale``-times-Laplace-sigma Gaussian jitter, clipped to the
    bounds interior.

    The robust initializer for gradient-based sampling: the
    CMB-anchored posteriors occupy ~1e-4 of the prior box per
    dimension, and a uniform-in-box init leaves warmup adaptation
    estimating its mass matrix from a diffuse unconverged cloud —
    measured to fail catastrophically on a fraction of seeds
    (bao.desi_cmb chains ending 20 sigma off). Costs one LM point fit
    (~seconds). scale=1 (default): the Laplace sigma is itself
    conservative along degenerate directions (e.g. the w0-wa banana,
    where scale=2 put ~10% of chains into rejuvenation-needing
    territory), so unit scale still overdisperses enough for R-hat.
    """
    import jax
    import jax.numpy as jnp

    best, _, _ = map_fit(fit)
    x = np.asarray([best[n] for n in fit.spec.names], dtype=np.float64)
    cov, sig, _ = laplace(fit.log_prob(), x)
    lo = fit.spec.bounds[:, 0]
    hi = fit.spec.bounds[:, 1]
    width = hi - lo
    z = np.asarray(
        jax.random.normal(key, (n_chains, fit.spec.dim)), dtype=np.float64
    )
    # jitter with the FULL covariance, not independent marginal sigmas:
    # the joint posteriors are thin correlated ellipsoids (condition
    # numbers ~100), and axis-aligned marginal-sigma jitter lands the
    # cloud ~300 logp units off the shell (measured on
    # bao.desi_cmb_union3) — warmup then sometimes never recovers.
    cov = np.asarray(cov, dtype=np.float64)
    try:
        chol = np.linalg.cholesky(
            cov + 1e-12 * np.eye(len(x)) * np.trace(cov)
        )
        init = x + scale * z @ chol.T
    except np.linalg.LinAlgError:
        sig = np.minimum(
            np.where(np.isfinite(sig), sig, 0.05 * width), 0.2 * width
        )
        init = x + scale * sig * z
    return jnp.asarray(
        np.clip(init, lo + 1e-6 * width, hi - 1e-6 * width)
    )
