"""LTSF-Linear GPS backbones: DLinear and NLinear (Flax NNX).

Capability parity with reference
``routeformer/models/gps_backbone/Linear.py:12-179``:

- ``moving_avg``/``series_decomp``: edge-replicated moving-average trend +
  residual decomposition (the torch AvgPool1d becomes one
  ``lax.reduce_window`` mean — a single fused VPU op).
- ``DLinear``: separate per-component linear maps over time.
- ``NLinear``: last-value-normalized linear map.

Both support ``individual`` per-channel heads; the reference's Python loop
over channels becomes a single batched einsum over a stacked weight.
"""

import jax
import jax.numpy as jnp
from flax import nnx

from routeformer_tpu.models.gps_backbone.config import GPSBackboneConfig


def moving_average(x: jnp.ndarray, kernel_size: int) -> jnp.ndarray:
    """Edge-replicated moving average over time (reference Linear.py:12-40).

    x: (B, L, C) -> (B, L, C) for odd kernels (matching the reference's
    padding arithmetic: (k-1)//2 replicated at each end, stride 1).
    """
    pad = (kernel_size - 1) // 2
    front = jnp.repeat(x[:, :1, :], pad, axis=1)
    end = jnp.repeat(x[:, -1:, :], pad, axis=1)
    xp = jnp.concatenate([front, x, end], axis=1)
    # cumulative-sum trick: windowed mean in O(L)
    c = jnp.cumsum(
        jnp.concatenate([jnp.zeros_like(xp[:, :1]), xp], axis=1), axis=1
    )
    return (c[:, kernel_size:] - c[:, :-kernel_size]) / kernel_size


def series_decomp(x: jnp.ndarray, kernel_size: int):
    """Residual + trend decomposition (reference Linear.py:43-67)."""
    moving_mean = moving_average(x, kernel_size)
    return x - moving_mean, moving_mean


class _TimeLinear(nnx.Module):
    """Linear map over the time axis, optionally per-channel ("individual")."""

    def __init__(
        self, seq_len: int, pred_len: int, channels: int, individual: bool,
        *, rngs: nnx.Rngs,
    ):
        self.individual = individual
        if individual:
            # (C, L_in, L_out) stacked per-channel weights; replaces the
            # reference's nn.ModuleList python loop with one einsum.
            init = nnx.initializers.lecun_normal()
            self.weight = nnx.Param(
                init(rngs.params(), (channels, seq_len, pred_len))
            )
            self.bias = nnx.Param(jnp.zeros((channels, pred_len)))
        else:
            self.linear = nnx.Linear(seq_len, pred_len, rngs=rngs)

    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        # x: (B, L, C) -> (B, pred_len, C)
        if self.individual:
            out = jnp.einsum("blc,clp->bpc", x, self.weight[...])
            return out + self.bias[...].T[None]
        return self.linear(x.transpose(0, 2, 1)).transpose(0, 2, 1)


class DLinear(nnx.Module):
    """Decomposition-Linear (reference Linear.py:69-130)."""

    def __init__(self, configs: GPSBackboneConfig, *, rngs: nnx.Rngs):
        self.seq_len = configs.seq_len
        self.pred_len = configs.pred_len
        self.c_out = configs.c_out
        self.kernel_size = configs.get("kernel_size", 25)
        channels = configs.enc_in
        self.linear_seasonal = _TimeLinear(
            self.seq_len, self.pred_len, channels, configs.individual, rngs=rngs
        )
        self.linear_trend = _TimeLinear(
            self.seq_len, self.pred_len, channels, configs.individual, rngs=rngs
        )

    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        seasonal, trend = series_decomp(x, self.kernel_size)
        out = self.linear_seasonal(seasonal) + self.linear_trend(trend)
        return out[:, : self.pred_len, : self.c_out]


class NLinear(nnx.Module):
    """Normalized Linear (reference Linear.py:132-179)."""

    def __init__(self, configs: GPSBackboneConfig, *, rngs: nnx.Rngs):
        self.seq_len = configs.seq_len
        self.pred_len = configs.pred_len
        self.c_out = configs.c_out
        self.linear = _TimeLinear(
            self.seq_len, self.pred_len, configs.enc_in, configs.individual, rngs=rngs
        )

    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        seq_last = jax.lax.stop_gradient(x[:, -1:, :])
        out = self.linear(x - seq_last) + seq_last
        return out[:, : self.pred_len, : self.c_out]
