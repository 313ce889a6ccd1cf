"""Trivial GPS forecasting baselines (Flax NNX).

Capability parity with reference
``routeformer/models/gps_backbone/Baselines.py:8-67``: zero-velocity
("stationary") and mean-of-last-5-velocities ("linear") extrapolators over
velocity inputs.
"""

import jax.numpy as jnp
from flax import nnx

from routeformer_tpu.models.gps_backbone.config import GPSBackboneConfig


class StationaryBaseline(nnx.Module):
    """Predicts zero velocity for all future steps (reference Baselines.py:8-35)."""

    def __init__(self, configs: GPSBackboneConfig, *, rngs: nnx.Rngs = None):
        self.seq_len = configs.seq_len
        self.pred_len = configs.pred_len

    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        return jnp.zeros((x.shape[0], self.pred_len, 2), dtype=x.dtype)


class LinearBaseline(nnx.Module):
    """Repeats the mean of the last 5 velocities (reference Baselines.py:38-67)."""

    def __init__(self, configs: GPSBackboneConfig, *, rngs: nnx.Rngs = None):
        self.seq_len = configs.seq_len
        self.pred_len = configs.pred_len

    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        average = jnp.mean(x[:, -5:, :2], axis=1, keepdims=True)
        return jnp.repeat(average, self.pred_len, axis=1)
