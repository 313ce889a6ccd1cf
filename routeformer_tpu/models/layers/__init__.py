"""Shared transformer layer library for GPS backbones and the fusion stack.

Capability parity with reference ``routeformer/models/gps_backbone/layers/``
and the layer half of ``models/cross_modal_transformer.py``, rebuilt as Flax
NNX modules over the Pallas/XLA attention ops in ``routeformer_tpu.ops``.
"""

from routeformer_tpu.models.layers.embed import (
    DataEmbedding,
    DataEmbedding_onlypos,
    DataEmbedding_wo_pos,
    FixedEmbedding,
    PositionalEmbedding,
    TemporalEmbedding,
    TimeFeatureEmbedding,
    TokenEmbedding,
)
from routeformer_tpu.models.layers.attention import (
    AttentionLayer,
    FullAttention,
    ProbAttention,
)
from routeformer_tpu.models.layers.encdec import (
    ConvLayer,
    Decoder,
    DecoderLayer,
    Encoder,
    EncoderLayer,
)

__all__ = [
    "TokenEmbedding",
    "PositionalEmbedding",
    "FixedEmbedding",
    "TemporalEmbedding",
    "TimeFeatureEmbedding",
    "DataEmbedding",
    "DataEmbedding_wo_pos",
    "DataEmbedding_onlypos",
    "FullAttention",
    "ProbAttention",
    "AttentionLayer",
    "ConvLayer",
    "Encoder",
    "EncoderLayer",
    "Decoder",
    "DecoderLayer",
]
