"""Utility layer (L0): config base, vector math, filters, logging."""

from routeformer_tpu.utils.config import BaseConfig
from routeformer_tpu.utils.device import init_on_cpu
from routeformer_tpu.utils.filter import median_downsampler
from routeformer_tpu.utils.logging import set_logger_config
from routeformer_tpu.utils.vector import estimate_angle, estimate_angle_and_norm, rotate

__all__ = [
    "BaseConfig",
    "init_on_cpu",
    "median_downsampler",
    "set_logger_config",
    "rotate",
    "estimate_angle",
    "estimate_angle_and_norm",
]
