"""Absolute sampler calibration against brute-force integration.

The parity suite anchors on the reference's published numbers; this
file anchors on mathematics alone: for a 2-parameter posterior the
marginal medians and 68% intervals can be computed exactly by grid
integration, so any systematic bias in the ensemble sampler (broken
detailed balance in a move, wrong complementary-half handling, f32
accumulation error) shows up as a median offset no published-value
comparison could distinguish from reference noise. The same technique
attributed the bao.sdss published-row offsets (VALIDATION.md).
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from cosmax.data import load_bao
from cosmax.likelihoods import ParamSpec, make_log_prob
from cosmax.likelihoods.bao import build_bao_term, rd_fixed
from cosmax.samplers import EnsembleSampler, default_moves
from cosmax.samplers.ensemble import uniform_init


def _setup():
    ds = load_bao("desi_dr2")
    spec = ParamSpec(("h", "Om"), np.array([(0.5, 0.8), (0.1, 0.7)]))
    term = build_bao_term(ds, "lcdm", rd_fixed(147.09), grid=("gl", 32))
    log_prob = make_log_prob(spec, [term], lambda p: {**p, "H0": 100 * p["h"]})
    return spec, log_prob


def _grid_marginals(log_prob, spec, n=400):
    """Exact marginal quantiles by 2-D grid integration (f64)."""
    hs = np.linspace(spec.bounds[0, 0], spec.bounds[0, 1], n + 2)[1:-1]
    oms = np.linspace(spec.bounds[1, 0], spec.bounds[1, 1], n + 2)[1:-1]
    hh, oo = np.meshgrid(hs, oms, indexing="ij")
    pts = jnp.asarray(np.stack([hh.ravel(), oo.ravel()], axis=1))
    ll = np.asarray(jax.vmap(log_prob)(pts), dtype=np.float64).reshape(n, n)
    w = np.exp(ll - ll.max())

    def quantiles(axis, grid):
        m = w.sum(axis=1 - axis)
        # cumsum(m)[i] is the mass through cell i, i.e. the CDF at the
        # cell's RIGHT edge; evaluating it at the cell center grid[i]
        # would bias every quantile by half a cell (+0.07σ at n=400).
        c = np.cumsum(m) - 0.5 * m
        c /= m.sum()
        return tuple(np.interp(q, c, grid) for q in (0.159, 0.5, 0.841))

    return quantiles(0, hs), quantiles(1, oms)


def test_chain_matches_exact_grid_posterior(x64):
    """Production sampler (full reference move mixture, f64 here)
    reproduces the grid-exact marginal medians to ~the chain's own
    median standard error and the 68% interval widths to a few %."""
    spec, log_prob = _setup()
    (h_lo, h_med, h_hi), (o_lo, o_med, o_hi) = _grid_marginals(log_prob, spec)

    s = EnsembleSampler(log_prob, 256, 2, moves=default_moves())
    init = uniform_init(jax.random.PRNGKey(3), spec.bounds, 256)
    _, chain = s.run(jax.random.PRNGKey(11), init, 1500)
    flat = np.asarray(chain.flat(discard=400))

    h_sig = 0.5 * (h_hi - h_lo)
    o_sig = 0.5 * (o_hi - o_lo)
    assert np.median(flat[:, 0]) == pytest.approx(h_med, abs=0.05 * h_sig)
    assert np.median(flat[:, 1]) == pytest.approx(o_med, abs=0.05 * o_sig)
    q = np.percentile(flat, [15.9, 84.1], axis=0)
    assert 0.5 * (q[1, 0] - q[0, 0]) == pytest.approx(h_sig, rel=0.06)
    assert 0.5 * (q[1, 1] - q[0, 1]) == pytest.approx(o_sig, rel=0.06)


def test_laplace_matches_exact_grid_sigma(x64):
    """The Laplace sigma at the mode tracks the grid-exact 68% widths
    (posterior is close to Gaussian here)."""
    from cosmax.samplers.optimize import laplace, minimize_chi2

    spec, log_prob = _setup()
    (h_lo, _, h_hi), (o_lo, _, o_hi) = _grid_marginals(log_prob, spec, n=300)
    x, _, _ = minimize_chi2(
        lambda t: -2.0 * log_prob(t), np.array([0.69, 0.3]), bounds=spec.bounds
    )
    _, sig, _ = laplace(log_prob, x)
    assert sig[0] == pytest.approx(0.5 * (h_hi - h_lo), rel=0.1)
    assert sig[1] == pytest.approx(0.5 * (o_hi - o_lo), rel=0.1)
