from cosmax.utils.cache import enable_compile_cache
from cosmax.utils.dtypes import default_dtype, canonical_dtype

__all__ = ["default_dtype", "canonical_dtype", "enable_compile_cache"]
