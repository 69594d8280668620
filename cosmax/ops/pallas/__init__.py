from cosmax.ops.pallas.chi2 import whitened_chi2_pallas
from cosmax.ops.pallas.megakernel import blocked_log_prob

__all__ = ["blocked_log_prob", "whitened_chi2_pallas"]
