"""Infrastructure: config system, logging."""

from .config import Config, load_config
from .logger import Logger

__all__ = ["Config", "load_config", "Logger"]
