from cosmax.samplers.ensemble import (
    EnsembleSampler,
    MoveSpec,
    default_moves,
    stretch_only,
)
from cosmax.samplers.evidence import (
    SteppingStone,
    stepping_stone_log_evidence,
)
from cosmax.samplers.hmc import HMCChain, HMCSampler
from cosmax.samplers.optimize import (
    adam_minimize,
    best_fit,
    map_fit,
    map_jitter_init,
    laplace,
    laplace_fit,
    minimize_chi2,
)
from cosmax.samplers.diagnostics import (
    autocorr_time,
    effective_samples,
    gelman_rubin,
    split_gelman_rubin,
    percentile_summary,
)

__all__ = [
    "EnsembleSampler",
    "HMCChain",
    "HMCSampler",
    "MoveSpec",
    "SteppingStone",
    "default_moves",
    "stepping_stone_log_evidence",
    "stretch_only",
    "adam_minimize",
    "best_fit",
    "map_fit",
    "map_jitter_init",
    "laplace",
    "laplace_fit",
    "minimize_chi2",
    "autocorr_time",
    "effective_samples",
    "gelman_rubin",
    "split_gelman_rubin",
    "percentile_summary",
]
