"""Autoformer/FEDformer shared layers (Flax NNX).

Capability parity with reference
``routeformer/models/gps_backbone/layers/AutoformerEncoderDecoder.py`` and
``AutoCorrelation.py:165-191``:

- ``SeasonalLayerNorm``: LayerNorm with the per-sequence mean re-subtracted.
- ``autoformer_moving_avg`` / ``SeriesDecomp`` / ``SeriesDecompMulti``:
  edge-replicated moving-average trend split (asymmetric padding for even
  kernels, matching the reference's floor arithmetic) — one cumsum-based
  windowed mean instead of AvgPool permute round-trips.
- ``AutoformerEncoderLayer`` / ``Encoder``: progressive-decomposition
  encoder (bias-free position-wise FFN).
- ``AutoformerDecoderLayer`` / ``Decoder``: decoder accumulating the trend
  stream through a circular-conv projection.
- ``AutoCorrelationLayer``: q/k/v/out projections around the FFT
  autocorrelation op (``ops.autocorrelation_attention``).
"""

import math
from typing import List, Optional, Union

import jax
import jax.numpy as jnp
from flax import nnx

from routeformer_tpu.ops.attention import autocorrelation_attention


class SeasonalLayerNorm(nnx.Module):
    """LayerNorm minus the temporal mean (reference AutoformerEncoderDecoder.py:9-21)."""

    def __init__(self, channels: int, *, rngs: nnx.Rngs):
        self.layernorm = nnx.LayerNorm(channels, rngs=rngs)

    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        x_hat = self.layernorm(x)
        return x_hat - x_hat.mean(axis=1, keepdims=True)


def autoformer_moving_avg(x: jnp.ndarray, kernel_size: int) -> jnp.ndarray:
    """Edge-replicated moving average with the Autoformer padding convention
    (reference AutoformerEncoderDecoder.py:24-44): front pad =
    k-1-floor((k-1)/2), end pad = floor((k-1)/2)."""
    end_pad = math.floor((kernel_size - 1) // 2)
    front_pad = kernel_size - 1 - end_pad
    front = jnp.repeat(x[:, :1, :], front_pad, axis=1)
    end = jnp.repeat(x[:, -1:, :], end_pad, axis=1)
    xp = jnp.concatenate([front, x, end], axis=1)
    c = jnp.cumsum(
        jnp.concatenate([jnp.zeros_like(xp[:, :1]), xp], axis=1), axis=1
    )
    return (c[:, kernel_size:] - c[:, :-kernel_size]) / kernel_size


class SeriesDecomp(nnx.Module):
    """Residual/trend split (reference AutoformerEncoderDecoder.py:47-58)."""

    def __init__(self, kernel_size: int):
        self.kernel_size = kernel_size

    def __call__(self, x: jnp.ndarray):
        moving_mean = autoformer_moving_avg(x, self.kernel_size)
        return x - moving_mean, moving_mean


class SeriesDecompMulti(nnx.Module):
    """Softmax-weighted multi-kernel decomposition
    (reference AutoformerEncoderDecoder.py:61-80)."""

    def __init__(self, kernel_sizes: List[int], *, rngs: nnx.Rngs):
        self.kernel_sizes = list(kernel_sizes)
        self.layer = nnx.Linear(1, len(kernel_sizes), rngs=rngs)

    def __call__(self, x: jnp.ndarray):
        means = jnp.stack(
            [autoformer_moving_avg(x, k) for k in self.kernel_sizes], axis=-1
        )  # (B, L, C, K)
        weights = jax.nn.softmax(self.layer(x[..., None]), axis=-1)
        moving_mean = (means * weights).sum(axis=-1)
        return x - moving_mean, moving_mean


def _make_decomp(moving_avg: Union[int, List[int]], rngs: nnx.Rngs):
    if isinstance(moving_avg, (list, tuple)):
        return SeriesDecompMulti(list(moving_avg), rngs=rngs)
    return SeriesDecomp(moving_avg)


class AutoCorrelationLayer(nnx.Module):
    """Projections around an autocorrelation-style inner op
    (reference AutoCorrelation.py:165-191).

    ``inner=None`` uses the FFT autocorrelation op; FEDformer passes
    Fourier/multiwavelet blocks instead. Note the reference merges the inner
    output with a raw ``view(B, L, -1)`` regardless of the inner's layout —
    FourierBlock returns head-major (B, H, E, L), so that view is a
    deliberate memory reinterpretation; ``reshape`` here reproduces it.
    """

    def __init__(
        self,
        d_model: int,
        n_heads: int,
        factor: int = 1,
        d_keys: Optional[int] = None,
        d_values: Optional[int] = None,
        inner: Optional[nnx.Module] = None,
        *,
        rngs: nnx.Rngs,
    ):
        d_keys = d_keys or (d_model // n_heads)
        d_values = d_values or (d_model // n_heads)
        self.query_projection = nnx.Linear(d_model, d_keys * n_heads, rngs=rngs)
        self.key_projection = nnx.Linear(d_model, d_keys * n_heads, rngs=rngs)
        self.value_projection = nnx.Linear(d_model, d_values * n_heads, rngs=rngs)
        self.out_projection = nnx.Linear(d_values * n_heads, d_model, rngs=rngs)
        self.n_heads = n_heads
        self.factor = factor
        self.inner = inner
        # train/inference delay-aggregation variant switch (nnx train()/eval()).
        self.deterministic = False

    def __call__(self, queries, keys, values, attn_mask=None):
        b, l, _ = queries.shape
        s = keys.shape[1]
        h = self.n_heads

        q = self.query_projection(queries).reshape(b, l, h, -1)
        k = self.key_projection(keys).reshape(b, s, h, -1)
        v = self.value_projection(values).reshape(b, s, h, -1)

        if self.inner is None:
            out, attn = autocorrelation_attention(
                q, k, v, factor=self.factor, training=not self.deterministic
            )
        else:
            out, attn = self.inner(q, k, v, attn_mask)
        out = out.reshape(b, l, -1)
        return self.out_projection(out), attn


class AutoformerEncoderLayer(nnx.Module):
    """Progressive-decomposition encoder layer
    (reference AutoformerEncoderDecoder.py:83-120)."""

    def __init__(
        self,
        attention,
        d_model: int,
        d_ff: Optional[int] = None,
        moving_avg: Union[int, List[int]] = 25,
        dropout: float = 0.1,
        activation: str = "relu",
        *,
        rngs: nnx.Rngs,
    ):
        d_ff = d_ff or 4 * d_model
        self.attention = attention
        self.ff1 = nnx.Linear(d_model, d_ff, use_bias=False, rngs=rngs)
        self.ff2 = nnx.Linear(d_ff, d_model, use_bias=False, rngs=rngs)
        self.decomp1 = _make_decomp(moving_avg, rngs)
        self.decomp2 = _make_decomp(moving_avg, rngs)
        self.dropout = nnx.Dropout(dropout, rngs=rngs)
        self.activation = (
            jax.nn.relu
            if activation == "relu"
            else (lambda x: jax.nn.gelu(x, approximate=False))
        )

    def __call__(self, x, attn_mask=None):
        new_x, attn = self.attention(x, x, x, attn_mask=attn_mask)
        x = x + self.dropout(new_x)
        x, _ = self.decomp1(x)
        y = self.dropout(self.activation(self.ff1(x)))
        y = self.dropout(self.ff2(y))
        res, _ = self.decomp2(x + y)
        return res, attn


class AutoformerEncoder(nnx.Module):
    """(reference AutoformerEncoderDecoder.py:123-153)"""

    def __init__(self, attn_layers, conv_layers=None, norm_layer=None):
        self.attn_layers = nnx.List(attn_layers)
        self.conv_layers = nnx.List(conv_layers) if conv_layers is not None else None
        self.norm = norm_layer

    def __call__(self, x, attn_mask=None):
        attns = []
        if self.conv_layers is not None:
            for attn_layer, conv_layer in zip(self.attn_layers, self.conv_layers):
                x, attn = attn_layer(x, attn_mask=attn_mask)
                x = conv_layer(x)
                attns.append(attn)
            x, attn = self.attn_layers[-1](x)
            attns.append(attn)
        else:
            for attn_layer in self.attn_layers:
                x, attn = attn_layer(x, attn_mask=attn_mask)
                attns.append(attn)
        if self.norm is not None:
            x = self.norm(x)
        return x, attns


class AutoformerDecoderLayer(nnx.Module):
    """Decoder layer accumulating a trend stream
    (reference AutoformerEncoderDecoder.py:156-229)."""

    def __init__(
        self,
        self_attention,
        cross_attention,
        d_model: int,
        c_out: int,
        d_ff: Optional[int] = None,
        moving_avg: Union[int, List[int]] = 25,
        dropout: float = 0.1,
        activation: str = "relu",
        *,
        rngs: nnx.Rngs,
    ):
        d_ff = d_ff or 4 * d_model
        self.self_attention = self_attention
        self.cross_attention = cross_attention
        self.ff1 = nnx.Linear(d_model, d_ff, use_bias=False, rngs=rngs)
        self.ff2 = nnx.Linear(d_ff, d_model, use_bias=False, rngs=rngs)
        self.decomp1 = _make_decomp(moving_avg, rngs)
        self.decomp2 = _make_decomp(moving_avg, rngs)
        self.decomp3 = _make_decomp(moving_avg, rngs)
        self.dropout = nnx.Dropout(dropout, rngs=rngs)
        # Circular kernel-3 conv projecting the trend to output channels.
        self.projection = nnx.Conv(
            d_model, c_out, kernel_size=3, padding="CIRCULAR", use_bias=False,
            rngs=rngs,
        )
        self.activation = (
            jax.nn.relu
            if activation == "relu"
            else (lambda x: jax.nn.gelu(x, approximate=False))
        )

    def __call__(self, x, cross, x_mask=None, cross_mask=None):
        x = x + self.dropout(self.self_attention(x, x, x, attn_mask=x_mask)[0])
        x, trend1 = self.decomp1(x)
        x = x + self.dropout(
            self.cross_attention(x, cross, cross, attn_mask=cross_mask)[0]
        )
        x, trend2 = self.decomp2(x)
        y = self.dropout(self.activation(self.ff1(x)))
        y = self.dropout(self.ff2(y))
        x, trend3 = self.decomp3(x + y)

        residual_trend = trend1 + trend2 + trend3
        residual_trend = self.projection(residual_trend)
        return x, residual_trend


class AutoformerDecoder(nnx.Module):
    """(reference AutoformerEncoderDecoder.py:232-257)"""

    def __init__(self, layers, norm_layer=None, projection=None):
        self.layers = nnx.List(layers)
        self.norm = norm_layer
        self.projection = projection

    def __call__(self, x, cross, x_mask=None, cross_mask=None, trend=None):
        for layer in self.layers:
            x, residual_trend = layer(x, cross, x_mask=x_mask, cross_mask=cross_mask)
            trend = trend + residual_trend
        if self.norm is not None:
            x = self.norm(x)
        if self.projection is not None:
            x = self.projection(x)
        return x, trend
