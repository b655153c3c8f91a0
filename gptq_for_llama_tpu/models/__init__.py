"""Model definitions (pure functions over pytrees) and checkpoint loading."""

from .config import ModelConfig, config_from_hf
from .registry import ARCHS, get_arch

__all__ = ["ModelConfig", "config_from_hf", "ARCHS", "get_arch"]
