"""Optimizer layer (L4): schedules and the grouped-AdamW builder."""

from routeformer_tpu.optimizers.schedule import linear_warmup_cosine_annealing
from routeformer_tpu.optimizers.optimizer import build_optimizer

__all__ = ["linear_warmup_cosine_annealing", "build_optimizer"]
