from cosmax.samplers.ensemble import (
    EnsembleSampler,
    MoveSpec,
    default_moves,
    stretch_only,
)
from cosmax.samplers.diagnostics import (
    autocorr_time,
    effective_samples,
    gelman_rubin,
    percentile_summary,
)

__all__ = [
    "EnsembleSampler",
    "MoveSpec",
    "default_moves",
    "stretch_only",
    "autocorr_time",
    "effective_samples",
    "gelman_rubin",
    "percentile_summary",
]
