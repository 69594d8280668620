from cosmax.utils.dtypes import default_dtype, canonical_dtype

__all__ = ["default_dtype", "canonical_dtype"]
