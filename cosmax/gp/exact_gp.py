"""Exact Gaussian-process regression of H(z) from cosmic chronometers.

JAX rebuild of the reference's torch/gpytorch stack
(cosmic_chronometers/gp_lib.py + cc_gp.py):

* RBF kernel with a learnable output scale and a lengthscale
  constrained to the interval (1.2 z_max, 3 z_max) via the same
  sigmoid transform gpytorch's Interval uses (cc_gp.py:27-29);
* constant mean;
* fixed observation noise given as a **full PSD covariance** times a
  learnable scalar ``noise_scale`` (gp_lib.py:13-67) — the
  GP counterpart of the CC error-rescaling nuisance f (the reference
  finds noise_scale ~ 0.699^2 ~ f^2);
* hyperparameters optimised by Adam (lr 0.01, 5000 iterations,
  cc_gp.py:46-70) on the exact marginal log-likelihood — here optax
  inside one ``lax.scan``-jitted loop;
* predictive mean/variance on a test grid, and the deceleration
  parameter q(z) = -1 + (1+z) H'(z)/H(z) via ``jax.grad`` through the
  predictive mean (cc_gp.py:88-94) — replacing torch autograd.

All linear algebra is Cholesky-based and jit-compiled; data are
standardised exactly as the reference does (cc_gp.py:16-21).
"""

from typing import NamedTuple

import numpy as np
import jax
import jax.numpy as jnp

from cosmax.ops.linalg import pdot


class GPParams(NamedTuple):
    raw_outputscale: jnp.ndarray  # softplus-constrained, as gpytorch
    raw_lengthscale: jnp.ndarray  # sigmoid interval (lo, hi)
    mean_const: jnp.ndarray
    noise_scale: jnp.ndarray  # unconstrained scalar multiplier


def _softplus(x):
    return jnp.logaddexp(x, 0.0)


def _inv_softplus(y):
    return np.log(np.expm1(y))


class ExactGP:
    """``ExactGP(x, y, noise_cov, lengthscale_interval)`` on
    standardised data; see ``fit_gp`` for the turnkey path."""

    def __init__(self, x, y, noise_cov, lengthscale_interval):
        self.x = jnp.asarray(x)
        self.y = jnp.asarray(y)
        self.noise_cov = jnp.asarray(noise_cov)
        self.ls_lo, self.ls_hi = map(float, lengthscale_interval)
        self.n = self.x.shape[0]

    # -- constrained hyperparameters ----------------------------------
    def outputscale(self, p: GPParams):
        return _softplus(p.raw_outputscale)

    def lengthscale(self, p: GPParams):
        return self.ls_lo + (self.ls_hi - self.ls_lo) * jax.nn.sigmoid(
            p.raw_lengthscale
        )

    def init_params(self) -> GPParams:
        return GPParams(
            raw_outputscale=jnp.asarray(_inv_softplus(1.0)),
            raw_lengthscale=jnp.asarray(0.0),  # interval midpoint
            mean_const=jnp.asarray(0.0),
            noise_scale=jnp.asarray(1.0),
        )

    # -- kernel -------------------------------------------------------
    def kernel(self, p: GPParams, xa, xb):
        ls = self.lengthscale(p)
        d = (xa[:, None] - xb[None, :]) / ls
        return self.outputscale(p) * jnp.exp(-0.5 * d * d)

    def train_cov(self, p: GPParams):
        k = self.kernel(p, self.x, self.x)
        return k + self.noise_cov * p.noise_scale

    # -- marginal likelihood ------------------------------------------
    def mll(self, p: GPParams):
        """Exact marginal log-likelihood (sum over data, incl. the
        constant), as gpytorch's ExactMarginalLogLikelihood * N."""
        c = self.train_cov(p)
        chol = jnp.linalg.cholesky(c)
        delta = self.y - p.mean_const
        alpha = jax.scipy.linalg.cho_solve((chol, True), delta)
        logdet = 2.0 * jnp.sum(jnp.log(jnp.diag(chol)))
        return -0.5 * (
            pdot(delta, alpha) + logdet + self.n * jnp.log(2.0 * jnp.pi)
        )

    # -- prediction ---------------------------------------------------
    def _solve_terms(self, p: GPParams):
        chol = jnp.linalg.cholesky(self.train_cov(p))
        alpha = jax.scipy.linalg.cho_solve((chol, True), self.y - p.mean_const)
        return chol, alpha

    def predict_mean(self, p: GPParams, x_test):
        _, alpha = self._solve_terms(p)
        k_star = self.kernel(p, jnp.atleast_1d(x_test), self.x)
        return p.mean_const + pdot(k_star, alpha)

    def predict(self, p: GPParams, x_test, test_noise=1e-4):
        """(mean, cov) of the posterior predictive incl. ``test_noise``
        on the diagonal (reference uses 1e-4, cc_gp.py:76)."""
        x_test = jnp.atleast_1d(x_test)
        chol, alpha = self._solve_terms(p)
        k_star = self.kernel(p, x_test, self.x)
        mean = p.mean_const + pdot(k_star, alpha)
        v = jax.scipy.linalg.solve_triangular(chol, k_star.T, lower=True)
        k_ss = self.kernel(p, x_test, x_test)
        cov = k_ss - pdot(v.T, v) + test_noise * jnp.eye(x_test.shape[0])
        return mean, cov

    # -- fantasy models -----------------------------------------------
    def condition_on(self, x_new, y_new, noise_new) -> "ExactGP":
        """Fantasy model: a new ``ExactGP`` conditioned on extra
        observations without refitting hyperparameters.

        The counterpart of gpytorch's ``ExactGP.get_fantasy_model`` +
        ``FixedNoiseGaussianLikelihood.get_fantasy_likelihood``
        (reference cosmic_chronometers/gp_lib.py:155-179): the training
        set becomes the concatenation of the current data and
        ``(x_new, y_new)``, and the fixed observation-noise covariance
        is extended block-diagonally — ``noise_new`` may be a 1-D
        vector of variances or a full PSD matrix, matching the 1-D/2-D
        branches of gp_lib.py:169-176. Hyperparameters are shared:
        evaluate ``predict``/``mll`` on the returned GP with the same
        ``GPParams`` (``noise_scale`` multiplies the extended noise
        covariance exactly as it does the original one).

        Inputs must be in the GP's (standardised) units — the same
        frame as ``self.x``/``self.y``.
        """
        x_new = jnp.atleast_1d(jnp.asarray(x_new, dtype=self.x.dtype))
        y_new = jnp.atleast_1d(jnp.asarray(y_new, dtype=self.y.dtype))
        noise_new = jnp.asarray(noise_new, dtype=self.noise_cov.dtype)
        if noise_new.ndim == 1:
            noise_new = jnp.diag(noise_new)
        if x_new.shape[0] != y_new.shape[0] or (
            noise_new.shape != (x_new.shape[0], x_new.shape[0])
        ):
            raise ValueError(
                "condition_on: x_new, y_new and noise_new must describe "
                f"the same number of points; got {x_new.shape[0]} x, "
                f"{y_new.shape[0]} y, noise {noise_new.shape}"
            )
        return ExactGP(
            jnp.concatenate([self.x, x_new]),
            jnp.concatenate([self.y, y_new]),
            jax.scipy.linalg.block_diag(self.noise_cov, noise_new),
            (self.ls_lo, self.ls_hi),
        )


def fit_gp(
    z,
    y,
    noise_cov,
    lengthscale_interval=None,
    iters: int = 5000,
    lr: float = 0.01,
    standardize: bool = True,
):
    """Standardise, build, and Adam-optimise the GP; returns
    (gp, params, info) where info carries the standardisation and the
    loss history. Mirrors cc_gp.py:14-70."""
    import optax

    z = np.asarray(z, dtype=np.float64)
    y = np.asarray(y, dtype=np.float64)
    noise_cov = np.asarray(noise_cov, dtype=np.float64)
    if standardize:
        y_mean, y_std = float(np.mean(y)), float(np.std(y))
    else:
        y_mean, y_std = 0.0, 1.0
    y_s = (y - y_mean) / y_std
    cov_s = noise_cov / y_std**2
    if lengthscale_interval is None:
        lengthscale_interval = (1.2 * z.max(), 3.0 * z.max())

    gp = ExactGP(z, y_s, cov_s, lengthscale_interval)
    params = gp.init_params()
    opt = optax.adam(lr)
    opt_state = opt.init(params)

    loss_fn = lambda p: -gp.mll(p)

    @jax.jit
    def run(params, opt_state):
        def step(carry, _):
            p, s = carry
            loss, grads = jax.value_and_grad(loss_fn)(p)
            updates, s = opt.update(grads, s, p)
            p = optax.apply_updates(p, updates)
            return (p, s), loss

        (params, opt_state), losses = jax.lax.scan(
            step, (params, opt_state), None, length=iters
        )
        return params, opt_state, losses

    params, opt_state, losses = run(params, opt_state)
    info = dict(
        y_mean=y_mean,
        y_std=y_std,
        losses=np.asarray(losses),
        outputscale=float(gp.outputscale(params)) * y_std**2,
        lengthscale=float(gp.lengthscale(params)),
        noise_scale=float(params.noise_scale),
    )
    return gp, params, info


def reconstruct_hz(z, h, cov, n_grid: int = 100, **kwargs):
    """Full cc_gp pipeline: fit, predict H(z) on a grid, and derive
    q(z) = -1 + (1+z) H'/H via jax.grad of the predictive mean.

    Returns a dict with the grid, H mean/std, q(z), and the fitted
    hyperparameters (reference prints lengthscale ~ 2.366 and
    noise_scale ~ 0.699^2, cc_gp.py:63-64)."""
    gp, params, info = fit_gp(z, h, cov, **kwargs)
    z_grid = jnp.linspace(0.0, float(np.max(z)), n_grid)
    mean_s, cov_s = gp.predict(params, z_grid)
    h_mean = np.asarray(mean_s) * info["y_std"] + info["y_mean"]
    h_std = np.sqrt(np.clip(np.diag(np.asarray(cov_s)), 0.0, None)) * info["y_std"]

    def h_of_z(zz):
        return gp.predict_mean(params, jnp.reshape(zz, (1,)))[0] * info[
            "y_std"
        ] + info["y_mean"]

    dh_dz = jax.vmap(jax.grad(h_of_z))(z_grid)
    h_vals = jax.vmap(h_of_z)(z_grid)
    q = -1.0 + (1.0 + z_grid) * dh_dz / h_vals
    return dict(
        z_grid=np.asarray(z_grid),
        h_mean=h_mean,
        h_std=h_std,
        h_cov=np.asarray(cov_s) * info["y_std"] ** 2,
        q=np.asarray(q),
        info=info,
        params=params,
        gp=gp,
    )
