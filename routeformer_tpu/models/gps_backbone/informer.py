"""Informer GPS backbone (Flax NNX).

Capability parity with reference
``routeformer/models/gps_backbone/Informer.py:18-167``: ProbSparse-attention
encoder with optional distillation convs halving the sequence length per
layer, ProbSparse self-attn + ProbSparse cross-attn decoder, and the "smart
decoder" that seeds the decoder with the input extended by the repeated last
token (vs zeros).

TPU notes: the whole forward is static-shape (pred_len fixed at build time),
jits to one XLA program. The gps-backbone flavor of ProbAttention is
*mixed* (see layers/attention.py), so every AttentionLayer here uses
``mix=True`` for the ProbSparse inner attention.
"""

import jax.numpy as jnp
from flax import nnx

from routeformer_tpu.models.gps_backbone.config import GPSBackboneConfig
from routeformer_tpu.models.layers import (
    AttentionLayer,
    ConvLayer,
    DataEmbedding,
    Decoder,
    DecoderLayer,
    Encoder,
    EncoderLayer,
    ProbAttention,
)


class Informer(nnx.Module):
    """Informer with ProbSparse attention in O(L log L) complexity."""

    def __init__(self, configs: GPSBackboneConfig, *, rngs: nnx.Rngs):
        self.pred_len = configs.pred_len
        self.output_attention = configs.output_attention
        self.smart_decoder = configs.smart_decoder

        self.enc_embedding = DataEmbedding(
            configs.enc_in, configs.d_model, configs.embed, configs.freq,
            configs.dropout, rngs=rngs,
        )
        self.dec_embedding = DataEmbedding(
            configs.dec_in, configs.d_model, configs.embed, configs.freq,
            configs.dropout, rngs=rngs,
        )

        self.encoder = Encoder(
            [
                EncoderLayer(
                    AttentionLayer(
                        ProbAttention(
                            False, configs.factor,
                            attention_dropout=configs.dropout,
                            output_attention=configs.output_attention,
                            rngs=rngs,
                        ),
                        configs.d_model, configs.n_heads, mix=True, rngs=rngs,
                    ),
                    configs.d_model, configs.d_ff,
                    dropout=configs.dropout, activation=configs.activation,
                    rngs=rngs,
                )
                for _ in range(configs.e_layers)
            ],
            (
                [ConvLayer(configs.d_model, rngs=rngs) for _ in range(configs.e_layers - 1)]
                if configs.distil
                else None
            ),
            norm_layer=nnx.LayerNorm(configs.d_model, rngs=rngs),
        )
        self.decoder = Decoder(
            [
                DecoderLayer(
                    AttentionLayer(
                        ProbAttention(
                            True, configs.factor,
                            attention_dropout=configs.dropout,
                            output_attention=False, rngs=rngs,
                        ),
                        configs.d_model, configs.n_heads, mix=True, rngs=rngs,
                    ),
                    AttentionLayer(
                        ProbAttention(
                            False, configs.factor,
                            attention_dropout=configs.dropout,
                            output_attention=False, rngs=rngs,
                        ),
                        configs.d_model, configs.n_heads, mix=True, rngs=rngs,
                    ),
                    configs.d_model, configs.d_ff,
                    dropout=configs.dropout, activation=configs.activation,
                    rngs=rngs,
                )
                for _ in range(configs.d_layers)
            ],
            norm_layer=nnx.LayerNorm(configs.d_model, rngs=rngs),
            projection=nnx.Linear(configs.d_model, configs.c_out, rngs=rngs),
        )

    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        """Forward: ``(B, seq_len, C) -> (B, pred_len, c_out)``."""
        b, l, _ = x.shape
        x_enc = x
        x_mark_enc = jnp.broadcast_to(
            jnp.arange(l, dtype=jnp.float32)[None, :, None], (b, l, 1)
        )

        if self.smart_decoder:
            seed = jnp.repeat(x_enc[:, -1:, :], self.pred_len, axis=1)
        else:
            seed = jnp.zeros((b, self.pred_len, x_enc.shape[-1]), dtype=x_enc.dtype)
        x_dec = jnp.concatenate([x_enc, seed], axis=1)

        x_mark_dec = jnp.broadcast_to(
            jnp.arange(l + self.pred_len, dtype=jnp.float32)[None, :, None],
            (b, l + self.pred_len, 1),
        )

        enc_out = self.enc_embedding(x_enc, x_mark_enc)
        enc_out, attns = self.encoder(enc_out)

        dec_out = self.dec_embedding(x_dec, x_mark_dec)
        dec_out = self.decoder(dec_out, enc_out)

        if self.output_attention:
            return dec_out[:, -self.pred_len :, :], attns
        return dec_out[:, -self.pred_len :, :]
