"""Transformer encoder/decoder stacks with Informer distillation (Flax NNX).

Capability parity with reference
``routeformer/models/gps_backbone/layers/TransformerEncoderDecoder.py`` and
the encoder/decoder half of ``models/cross_modal_transformer.py:200-329``:

- ``ConvLayer``: Informer's distillation stage — circular kernel-3 conv,
  BatchNorm, ELU, stride-2 max-pool. The gps-backbone variant pads the
  circular conv by 2 (output L+2) while the cross-modal variant pads by 1
  (output L); both are supported via ``extra_padding``.
- ``EncoderLayer`` / ``Encoder``: pre-add + LayerNorm, position-wise conv
  FFN (kernel-1 convs ≡ Linear — implemented as Linear, which XLA maps to
  the same MXU matmul without the transpose round-trips).
- ``DecoderLayer`` / ``Decoder``: self-attn + cross-attn + FFN; optional
  final norm and projection.
"""

from typing import Callable, List, Optional

import jax
import jax.numpy as jnp
from flax import nnx


def _activation(name: str) -> Callable:
    if name == "relu":
        return jax.nn.relu
    # torch F.gelu default is the exact erf form; jax defaults to tanh
    return lambda x: jax.nn.gelu(x, approximate=False)


class ConvLayer(nnx.Module):
    """Distillation conv (reference TransformerEncoderDecoder.py:9-29;
    cross-modal variant cross_modal_transformer.py:251-273)."""

    def __init__(self, c_in: int, extra_padding: int = 2, *, rngs: nnx.Rngs):
        # torch Conv1d(kernel=3, padding=extra_padding, circular): output
        # length L + 2*(extra_padding - 1). We pad circularly by hand and run
        # a VALID conv for exact parity.
        self.extra_padding = extra_padding
        self.conv = nnx.Conv(
            in_features=c_in,
            out_features=c_in,
            kernel_size=3,
            padding="VALID",
            rngs=rngs,
        )
        # torch BatchNorm1d defaults: eps=1e-5, momentum=0.1 (flax: 0.9).
        self.norm = nnx.BatchNorm(
            c_in, momentum=0.9, epsilon=1e-5, rngs=rngs
        )

    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        p = self.extra_padding
        x = jnp.concatenate([x[:, -p:, :], x, x[:, :p, :]], axis=1)
        x = self.conv(x)
        x = self.norm(x)
        x = jax.nn.elu(x)
        # MaxPool1d(kernel=3, stride=2, padding=1): torch pads with -inf.
        x = nnx.max_pool(x, window_shape=(3,), strides=(2,), padding=((1, 1),))
        return x


class EncoderLayer(nnx.Module):
    def __init__(
        self,
        attention,
        d_model: int,
        d_ff: Optional[int] = None,
        dropout: float = 0.1,
        activation: str = "relu",
        dtype=None,
        *,
        rngs: nnx.Rngs,
    ):
        d_ff = d_ff or 4 * d_model
        self.attention = attention
        self.ff1 = nnx.Linear(d_model, d_ff, dtype=dtype, rngs=rngs)
        self.ff2 = nnx.Linear(d_ff, d_model, dtype=dtype, rngs=rngs)
        self.norm1 = nnx.LayerNorm(d_model, rngs=rngs)
        self.norm2 = nnx.LayerNorm(d_model, rngs=rngs)
        self.dropout = nnx.Dropout(dropout, rngs=rngs)
        self.activation = _activation(activation)

    def __call__(self, x: jnp.ndarray, attn_mask=None):
        new_x, attn = self.attention(x, x, x, attn_mask=attn_mask)
        x = x + self.dropout(new_x)

        y = x = self.norm1(x)
        y = self.dropout(self.activation(self.ff1(y)))
        y = self.dropout(self.ff2(y))

        return self.norm2(x + y), attn


class Encoder(nnx.Module):
    def __init__(
        self,
        attn_layers: List[EncoderLayer],
        conv_layers: Optional[List[ConvLayer]] = None,
        norm_layer: Optional[nnx.Module] = None,
    ):
        self.attn_layers = nnx.List(attn_layers)
        self.conv_layers = nnx.List(conv_layers) if conv_layers is not None else None
        self.norm = norm_layer

    def __call__(self, x: jnp.ndarray, attn_mask=None):
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


class DecoderLayer(nnx.Module):
    def __init__(
        self,
        self_attention,
        cross_attention,
        d_model: int,
        d_ff: Optional[int] = None,
        dropout: float = 0.1,
        activation: str = "relu",
        dtype=None,
        *,
        rngs: nnx.Rngs,
    ):
        d_ff = d_ff or 4 * d_model
        self.self_attention = self_attention
        self.cross_attention = cross_attention
        self.ff1 = nnx.Linear(d_model, d_ff, dtype=dtype, rngs=rngs)
        self.ff2 = nnx.Linear(d_ff, d_model, dtype=dtype, rngs=rngs)
        self.norm1 = nnx.LayerNorm(d_model, rngs=rngs)
        self.norm2 = nnx.LayerNorm(d_model, rngs=rngs)
        self.norm3 = nnx.LayerNorm(d_model, rngs=rngs)
        self.dropout = nnx.Dropout(dropout, rngs=rngs)
        self.activation = _activation(activation)

    def __call__(self, x, cross, x_mask=None, cross_mask=None):
        x = x + self.dropout(self.self_attention(x, x, x, attn_mask=x_mask)[0])
        x = self.norm1(x)

        x = x + self.dropout(
            self.cross_attention(x, cross, cross, attn_mask=cross_mask)[0]
        )

        y = x = self.norm2(x)
        y = self.dropout(self.activation(self.ff1(y)))
        y = self.dropout(self.ff2(y))

        return self.norm3(x + y)


class Decoder(nnx.Module):
    def __init__(
        self,
        layers: List[DecoderLayer],
        norm_layer: Optional[nnx.Module] = None,
        projection: Optional[nnx.Module] = None,
    ):
        self.layers = nnx.List(layers)
        self.norm = norm_layer
        self.projection = projection

    def __call__(self, x, cross, x_mask=None, cross_mask=None):
        for layer in self.layers:
            x = layer(x, cross, x_mask=x_mask, cross_mask=cross_mask)

        if self.norm is not None:
            x = self.norm(x)

        if self.projection is not None:
            x = self.projection(x)
        return x
