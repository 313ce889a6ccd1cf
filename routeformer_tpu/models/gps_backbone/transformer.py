"""Vanilla Transformer GPS backbone (Flax NNX).

Capability parity with reference
``routeformer/models/gps_backbone/Transformer.py:12-141``: full O(L²)
attention encoder-decoder with zero-seeded decoder input. The dense attention
runs on the fused Pallas kernel on TPU.
"""

import jax.numpy as jnp
from flax import nnx

from routeformer_tpu.models.gps_backbone.config import GPSBackboneConfig
from routeformer_tpu.models.layers import (
    AttentionLayer,
    DataEmbedding,
    Decoder,
    DecoderLayer,
    Encoder,
    EncoderLayer,
    FullAttention,
)


class Transformer(nnx.Module):
    """Vanilla Transformer with O(L²) complexity."""

    def __init__(self, configs: GPSBackboneConfig, *, rngs: nnx.Rngs):
        self.pred_len = configs.pred_len
        self.output_attention = configs.output_attention

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
                        FullAttention(
                            False, configs.factor,
                            attention_dropout=configs.dropout,
                            output_attention=configs.output_attention,
                            rngs=rngs,
                        ),
                        configs.d_model, configs.n_heads, rngs=rngs,
                    ),
                    configs.d_model, configs.d_ff,
                    dropout=configs.dropout, activation=configs.activation,
                    rngs=rngs,
                )
                for _ in range(configs.e_layers)
            ],
            norm_layer=nnx.LayerNorm(configs.d_model, rngs=rngs),
        )
        self.decoder = Decoder(
            [
                DecoderLayer(
                    AttentionLayer(
                        FullAttention(
                            True, configs.factor,
                            attention_dropout=configs.dropout,
                            output_attention=False, rngs=rngs,
                        ),
                        configs.d_model, configs.n_heads, rngs=rngs,
                    ),
                    AttentionLayer(
                        FullAttention(
                            False, configs.factor,
                            attention_dropout=configs.dropout,
                            output_attention=False, rngs=rngs,
                        ),
                        configs.d_model, configs.n_heads, rngs=rngs,
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
        x_dec = jnp.concatenate(
            [x_enc, jnp.zeros((b, self.pred_len, x_enc.shape[-1]), dtype=x_enc.dtype)],
            axis=1,
        )
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
