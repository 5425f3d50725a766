from .config import (
    load_config,
    apply_overrides,
    copy_config,
    Config,
)
from .registry import Registry, get_class

__all__ = [
    "load_config",
    "apply_overrides",
    "copy_config",
    "Config",
    "Registry",
    "get_class",
]
