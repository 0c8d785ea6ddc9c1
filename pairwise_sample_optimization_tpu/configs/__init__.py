from .sdxl_turbo_dpo import get_config as turbo_config
from .sdxl_dmd_dpo import get_config as dmd_config

__all__ = ["turbo_config", "dmd_config"]
