"""Embedding layers for time-series tokens (Flax NNX).

Capability parity with reference
``routeformer/models/gps_backbone/layers/Embedding.py`` (and the embedding
half of ``models/cross_modal_transformer.py:332-369``):

- ``TokenEmbedding``: kernel-3 *circular* conv over time, no bias, He init.
- ``PositionalEmbedding``: classic sinusoidal table. Computed on the fly
  (cheap VPU transcendentals, no 5000-row buffer shipped to HBM).
- ``FixedEmbedding`` / ``TemporalEmbedding`` / ``TimeFeatureEmbedding``:
  calendar-feature embeddings; the Routeformer pipeline always uses
  ``embed="timeF", freq="m"`` — a bias-free Linear on a float position
  mark (reference ``gps_backbone/config.py:15-16``,
  ``Informer.py:117-122``).
- ``DataEmbedding`` (+ ``_wo_pos`` / ``_onlypos`` variants): sum of the
  above followed by dropout.

Layout: all modules take channel-last ``(B, L, C)`` — the native layout for
TPU convs (lane dim = features), so no permutes around each conv as in the
torch versions.
"""

import math

import jax.numpy as jnp
from flax import nnx


class TokenEmbedding(nnx.Module):
    """Kernel-3 circular conv token embedding (reference Embedding.py:28-46).

    ``use_bias`` distinguishes the two reference variants: the gps-backbone
    layer library builds the conv with ``bias=False``
    (Embedding.py:32-39), while the cross-modal copy leaves torch's default
    ``bias=True`` (cross_modal_transformer.py:356-361) — the fusion
    encoders pass ``use_bias=True``.
    """

    def __init__(
        self, c_in: int, d_model: int, use_bias: bool = False, *, rngs: nnx.Rngs
    ):
        self.conv = nnx.Conv(
            in_features=c_in,
            out_features=d_model,
            kernel_size=3,
            padding="CIRCULAR",
            use_bias=use_bias,
            kernel_init=nnx.initializers.variance_scaling(
                2.0, "fan_in", "truncated_normal"
            ),
            rngs=rngs,
        )

    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        return self.conv(x)


class PositionalEmbedding(nnx.Module):
    """Sinusoidal positional encoding (reference Embedding.py:8-25)."""

    def __init__(self, d_model: int, max_len: int = 5000):
        self.d_model = d_model
        self.max_len = max_len

    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        length = x.shape[1]
        position = jnp.arange(length, dtype=jnp.float32)[:, None]
        div_term = jnp.exp(
            jnp.arange(0, self.d_model, 2, dtype=jnp.float32)
            * -(math.log(10000.0) / self.d_model)
        )
        pe = jnp.zeros((length, self.d_model), dtype=jnp.float32)
        pe = pe.at[:, 0::2].set(jnp.sin(position * div_term))
        pe = pe.at[:, 1::2].set(jnp.cos(position * div_term))
        return pe[None]


class FixedEmbedding(nnx.Module):
    """Non-trainable sinusoidal lookup table (reference Embedding.py:49-67)."""

    def __init__(self, c_in: int, d_model: int):
        position = jnp.arange(c_in, dtype=jnp.float32)[:, None]
        div_term = jnp.exp(
            jnp.arange(0, d_model, 2, dtype=jnp.float32)
            * -(math.log(10000.0) / d_model)
        )
        w = jnp.zeros((c_in, d_model), dtype=jnp.float32)
        w = w.at[:, 0::2].set(jnp.sin(position * div_term))
        w = w.at[:, 1::2].set(jnp.cos(position * div_term))
        self.weight = w  # plain array: not a Param, never trained

    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        return self.weight[x]


class TemporalEmbedding(nnx.Module):
    """Calendar embeddings summed over (month, day, weekday, hour[, minute])
    (reference Embedding.py:70-105)."""

    def __init__(
        self, d_model: int, embed_type: str = "fixed", freq: str = "h", *, rngs: nnx.Rngs
    ):
        sizes = {"minute": 4, "hour": 24, "weekday": 7, "day": 32, "month": 13}

        def make(size):
            if embed_type == "fixed":
                return FixedEmbedding(size, d_model)
            return nnx.Embed(size, d_model, rngs=rngs)

        self.minute_embed = make(sizes["minute"]) if freq == "t" else None
        self.hour_embed = make(sizes["hour"])
        self.weekday_embed = make(sizes["weekday"])
        self.day_embed = make(sizes["day"])
        self.month_embed = make(sizes["month"])

    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        x = x.astype(jnp.int32)
        out = (
            self.hour_embed(x[:, :, 3])
            + self.weekday_embed(x[:, :, 2])
            + self.day_embed(x[:, :, 1])
            + self.month_embed(x[:, :, 0])
        )
        if self.minute_embed is not None:
            out = out + self.minute_embed(x[:, :, 4])
        return out


class TimeFeatureEmbedding(nnx.Module):
    """Bias-free linear embedding of continuous time features
    (reference Embedding.py:108-117)."""

    FREQ_MAP = {"h": 4, "t": 5, "s": 6, "m": 1, "a": 1, "w": 2, "d": 3, "b": 3}

    def __init__(self, d_model: int, freq: str = "h", *, rngs: nnx.Rngs):
        self.linear = nnx.Linear(
            self.FREQ_MAP[freq], d_model, use_bias=False, rngs=rngs
        )

    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        return self.linear(x)


class DataEmbedding(nnx.Module):
    """value + temporal + positional embedding with dropout
    (reference Embedding.py:120-135)."""

    def __init__(
        self,
        c_in: int,
        d_model: int,
        embed_type: str = "fixed",
        freq: str = "h",
        dropout: float = 0.1,
        *,
        rngs: nnx.Rngs,
    ):
        self.value_embedding = TokenEmbedding(c_in, d_model, rngs=rngs)
        self.position_embedding = PositionalEmbedding(d_model)
        if embed_type != "timeF":
            self.temporal_embedding = TemporalEmbedding(
                d_model, embed_type=embed_type, freq=freq, rngs=rngs
            )
        else:
            self.temporal_embedding = TimeFeatureEmbedding(
                d_model, freq=freq, rngs=rngs
            )
        self.dropout = nnx.Dropout(dropout, rngs=rngs)

    def __call__(self, x: jnp.ndarray, x_mark: jnp.ndarray) -> jnp.ndarray:
        out = (
            self.value_embedding(x)
            + self.temporal_embedding(x_mark)
            + self.position_embedding(x)
        )
        return self.dropout(out)


class DataEmbedding_wo_pos(nnx.Module):
    """value + temporal embedding (no positional), with dropout
    (reference Embedding.py:150-170)."""

    def __init__(
        self,
        c_in: int,
        d_model: int,
        embed_type: str = "fixed",
        freq: str = "h",
        dropout: float = 0.1,
        *,
        rngs: nnx.Rngs,
    ):
        self.value_embedding = TokenEmbedding(c_in, d_model, rngs=rngs)
        if embed_type != "timeF":
            self.temporal_embedding = TemporalEmbedding(
                d_model, embed_type=embed_type, freq=freq, rngs=rngs
            )
        else:
            self.temporal_embedding = TimeFeatureEmbedding(
                d_model, freq=freq, rngs=rngs
            )
        self.dropout = nnx.Dropout(dropout, rngs=rngs)

    def __call__(self, x: jnp.ndarray, x_mark: jnp.ndarray) -> jnp.ndarray:
        return self.dropout(self.value_embedding(x) + self.temporal_embedding(x_mark))


class DataEmbedding_onlypos(nnx.Module):
    """value + positional embedding, with dropout
    (reference Embedding.py:138-147)."""

    def __init__(
        self,
        c_in: int,
        d_model: int,
        dropout: float = 0.1,
        *,
        rngs: nnx.Rngs,
    ):
        self.value_embedding = TokenEmbedding(c_in, d_model, rngs=rngs)
        self.position_embedding = PositionalEmbedding(d_model)
        self.dropout = nnx.Dropout(dropout, rngs=rngs)

    def __call__(self, x: jnp.ndarray, x_mark: jnp.ndarray = None) -> jnp.ndarray:
        return self.dropout(self.value_embedding(x) + self.position_embedding(x))
