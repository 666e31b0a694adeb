"""Infrastructure: config system, logging."""

from .config import Config, load_config
from .logger import Logger, logger_from_config

__all__ = ["Config", "load_config", "Logger", "logger_from_config"]
