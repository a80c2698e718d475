from .config import DEFAULTS, load_config, load_default_config
from .registry import Registry

__all__ = ["DEFAULTS", "load_config", "load_default_config", "Registry"]
