"""Stepping-stone evidence (cosmax.samplers.evidence).

Anchored on mathematics twice over: an analytic Gaussian evidence, and
agreement with the independent Laplace closed form on a real
(near-Gaussian) preset posterior.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from cosmax.samplers.evidence import SteppingStone, stepping_stone_log_evidence


def test_beta_schedule():
    ss = SteppingStone(lambda x: 0.0, np.array([[0.0, 1.0]]), n_rungs=16)
    b = np.asarray(ss.betas)
    assert b[0] == 0.0 and b[-1] == 1.0
    assert np.all(np.diff(b) > 0)
    # gamma > 1 concentrates rungs near beta = 0
    assert b[8] < 0.5


def test_gaussian_evidence_analytic():
    mean = np.array([0.2, -0.3])
    sig = np.array([0.3, 0.5])
    bounds = np.array([[-4.0, 4.0], [-4.0, 4.0]])

    def lp(x):
        return -0.5 * jnp.sum(((x - mean) / sig) ** 2)

    # edges are >7 sigma out: the truncated integral is the full one
    ln_z_true = float(
        np.sum(np.log(np.sqrt(2 * np.pi) * sig))
        - np.sum(np.log(bounds[:, 1] - bounds[:, 0]))
    )
    res = stepping_stone_log_evidence(
        lp, bounds, key=jax.random.PRNGKey(0),
        n_rungs=24, n_chains=64, n_warmup=300, n_samples=300,
    )
    assert res.log_evidence == pytest.approx(ln_z_true, abs=0.05)
    assert res.error < 0.05
    assert 0.5 < res.acceptance < 0.95
    assert len(res.per_rung) == 24
    # the telescope reconstructs the total
    assert res.per_rung.sum() == pytest.approx(res.log_evidence, abs=1e-9)


@pytest.mark.filterwarnings(
    # the f64-built preset constants are deliberately truncated when
    # the stepping stone traces them in f32 sampling mode
    "ignore:Explicitly requested dtype float64"
)
def test_matches_laplace_on_preset(x64):
    """Near-Gaussian bao.desi posterior: the sampled evidence must sit
    on the Laplace closed form."""
    from cosmax.compare import laplace_log_evidence
    from cosmax.configs import get_preset
    from cosmax.samplers.optimize import map_fit

    fit = get_preset("bao.desi", "lcdm", fast=True)
    best, _, _ = map_fit(fit)
    x = np.asarray([best[n] for n in fit.spec.names])
    lap = laplace_log_evidence(fit, x)
    with jax.enable_x64(False):
        res = stepping_stone_log_evidence(
            fit.log_prob(), fit.spec.bounds, key=jax.random.PRNGKey(1),
            n_rungs=24, n_chains=64, n_warmup=300, n_samples=300,
        )
    assert res.log_evidence == pytest.approx(lap, abs=0.1)


def test_replicated_error_covers_analytic_truth():
    """n_replicates > 1: the reported error is the cross-replicate
    scatter and it covers the analytic Gaussian ln Z across seeds —
    the honest-uncertainty contract (the old chain-group error was a
    documented underestimate)."""
    mean = np.array([0.2, -0.3])
    sig = np.array([0.3, 0.5])
    bounds = np.array([[-4.0, 4.0], [-4.0, 4.0]])

    def lp(x):
        return -0.5 * jnp.sum(((x - mean) / sig) ** 2)

    ln_z_true = float(
        np.sum(np.log(np.sqrt(2 * np.pi) * sig))
        - np.sum(np.log(bounds[:, 1] - bounds[:, 0]))
    )
    for seed in (0, 1, 2):
        res = stepping_stone_log_evidence(
            lp, bounds, key=jax.random.PRNGKey(seed),
            n_rungs=16, n_chains=32, n_warmup=200, n_samples=200,
            n_replicates=4,
        )
        assert res.per_replicate.shape == (4,)
        # independent ladders: genuinely distinct estimates
        assert len(set(np.round(res.per_replicate, 12))) == 4
        assert res.error > 0.0
        # mean-of-replicates lands on the truth within the quoted error
        # (4 replicates: allow the t-tail with a 4x factor)
        assert abs(res.log_evidence - ln_z_true) <= 4.0 * res.error
        # per_rung stays the telescope of the mean estimate
        assert res.per_rung.sum() == pytest.approx(
            res.log_evidence, abs=1e-9
        )


def test_rung_rhat_diagnostic():
    """Every result carries per-rung split R-hat of ln L; on an easy
    well-mixed Gaussian all rungs must look equilibrated."""
    mean = np.array([0.2, -0.3])
    sig = np.array([0.3, 0.5])
    bounds = np.array([[-4.0, 4.0], [-4.0, 4.0]])

    def lp(x):
        return -0.5 * jnp.sum(((x - mean) / sig) ** 2)

    res = stepping_stone_log_evidence(
        lp, bounds, key=jax.random.PRNGKey(0),
        n_rungs=16, n_chains=32, n_warmup=200, n_samples=200,
        n_replicates=2,
    )
    assert res.rung_rhat.shape == (16,)
    assert np.all(np.isfinite(res.rung_rhat))
    assert float(np.max(res.rung_rhat)) < 1.2
    # static budget: no convergence loop ran
    assert res.converged is None


def test_until_stable_converges_to_analytic_truth():
    """Budget-doubling mode on a sharp posterior (the flagship-regime
    stressor: the posterior occupies ~1e-10 of the prior box, the same
    prior-to-posterior volume compression that produced the documented
    ~0.3-0.5 nat systematic at static default budgets). Starting from a
    deliberately-too-small budget, run(until_stable=...) must double
    its way to an estimate that matches the analytic ln Z within the
    reported replicate error."""
    sig = np.array([0.01, 0.02, 0.015])
    mean = np.array([0.2, -0.3, 0.1])
    bounds = np.array([[-4.0, 4.0]] * 3)

    def lp(x):
        return -0.5 * jnp.sum(((x - mean) / sig) ** 2)

    ln_z_true = float(
        np.sum(np.log(np.sqrt(2 * np.pi) * sig))
        - np.sum(np.log(bounds[:, 1] - bounds[:, 0]))
    )
    res = stepping_stone_log_evidence(
        lp, bounds, key=jax.random.PRNGKey(3),
        n_rungs=16, n_chains=32, n_warmup=50, n_samples=50,
        n_replicates=3, until_stable=0.1, max_doublings=4,
    )
    assert res.converged is True
    assert len(res.history) >= 2
    # budgets doubled between steps
    assert res.history[1][0] == 2 * res.history[0][0]
    assert res.history[1][1] == 2 * res.history[0][1]
    # final (returned) budget matches the last history row
    assert (res.n_warmup, res.n_samples) == res.history[-1][:2]
    assert abs(res.log_evidence - ln_z_true) <= max(4.0 * res.error, 0.25)


def test_until_stable_exhausted_flag():
    """max_doublings=0 leaves nothing to compare against: the loop must
    report converged=False rather than pretend."""
    bounds = np.array([[-4.0, 4.0], [-4.0, 4.0]])

    def lp(x):
        return -0.5 * jnp.sum((x / 0.3) ** 2)

    res = stepping_stone_log_evidence(
        lp, bounds, key=jax.random.PRNGKey(0),
        n_rungs=8, n_chains=16, n_warmup=50, n_samples=50,
        until_stable=1e-6, max_doublings=0,
    )
    assert res.converged is False
    assert len(res.history) == 1


def test_compare_cli_until_stable(capsys):
    from cosmax.compare import main

    rc = main([
        "--preset", "bao.desi", "--models", "lcdm", "--sampled-evidence",
        "--replicates", "2", "--ss-until-stable", "0.5",
    ])
    assert rc == 0
    out = capsys.readouterr().out
    assert "rhat=" in out
    assert "converged" in out


def test_compare_cli_sampled_evidence(capsys):
    import jax as _jax

    from cosmax.compare import main

    prev_x64 = _jax.config.jax_enable_x64
    rc = main([
        "--preset", "bao.desi", "--models", "lcdm", "--sampled-evidence",
        "--replicates", "2",
    ])
    assert rc == 0
    # main() must not leak its x64/platform overrides into the session
    assert _jax.config.jax_enable_x64 == prev_x64
    out = capsys.readouterr().out
    assert "ss: ln Z - ln Z_lcdm" in out
    assert "±" in out
