"""Summary/report output parity (reference per-run prints,
SURVEY.md §2.6: medians, chi^2, derived parameters, diagnostics)."""

import numpy as np
import jax
import pytest

from cosmax.configs import get_preset
from cosmax.report import format_summary, summarize
from cosmax.samplers import EnsembleSampler, stretch_only
from cosmax.samplers.ensemble import uniform_init


@pytest.fixture(scope="module")
def cmb_summary():
    fit = get_preset("cmb.cmb", "lcdm", compression="chen", fast=True)
    s = EnsembleSampler(fit.log_prob(), 64, fit.spec.dim, moves=stretch_only())
    init = uniform_init(jax.random.PRNGKey(1), fit.spec.bounds, 64)
    _, chain = s.run(jax.random.PRNGKey(0), init, 600)
    return summarize(fit, chain, discard=200)


def test_derived_parameters_match_reference(cmb_summary):
    """cmb/cmb.py:98-116 prints wm, z_eq, z*, z_drag, r*, r_d; the chen
    run's published values are z*=1088.91, z_drag=1059.93, r*=144.17,
    r_d=146.73 (BASELINE.md)."""
    d = cmb_summary["derived"]
    assert d["z_star"]["median"] == pytest.approx(1088.91, abs=0.3)
    assert d["z_drag"]["median"] == pytest.approx(1059.93, abs=0.3)
    assert d["r_star_median"]["median"] == pytest.approx(144.17, abs=0.2)
    assert d["r_d_median"]["median"] == pytest.approx(146.73, abs=0.2)
    # z_eq = -1 + wm/(Or h^2): wm ~ 0.1437, Or_h2(chen) ~ 4.18e-5
    assert d["z_eq"]["median"] == pytest.approx(3435.0, abs=40.0)
    assert d["Omh2"]["median"] == pytest.approx(0.1437, abs=0.002)


def test_format_summary_contains_reference_blocks(cmb_summary):
    text = format_summary(cmb_summary)
    for token in ("Chi squared:", "Degs of freedom:", "Acceptance fraction:",
                  "Gelman-Rubin", "z_star (derived)"):
        assert token in text


def test_s8_derived_for_growth_fits():
    fit = get_preset("fs8.fs8", "lcdm", fast=True)
    s = EnsembleSampler(fit.log_prob(), 64, fit.spec.dim, moves=stretch_only())
    init = uniform_init(jax.random.PRNGKey(2), fit.spec.bounds, 64)
    _, chain = s.run(jax.random.PRNGKey(3), init, 300)
    summ = summarize(fit, chain, discard=100)
    s8 = summ["derived"]["S8"]["median"]
    flat = np.asarray(chain.flat(discard=100))
    i_om = fit.spec.names.index("Om")
    i_s8 = fit.spec.names.index("sigma8")
    want = np.median(flat[:, i_s8] * np.sqrt(flat[:, i_om] / 0.3))
    assert s8 == pytest.approx(want, rel=1e-6)
