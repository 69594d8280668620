from cosmax.configs.presets import PRESETS, get_preset, list_presets, FitSpec

__all__ = ["PRESETS", "get_preset", "list_presets", "FitSpec"]
