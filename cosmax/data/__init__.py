from cosmax.data.loaders import (
    load_bao,
    load_sn,
    load_cc,
    load_fs8,
    load_quasars,
    store_path,
)

__all__ = ["load_bao", "load_sn", "load_cc", "load_fs8", "load_quasars", "store_path"]
