from cosmax.ops.pallas.chi2 import whitened_chi2_pallas

__all__ = ["whitened_chi2_pallas"]
