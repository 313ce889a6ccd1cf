"""Autoformer GPS backbone (Flax NNX).

Capability parity with reference
``routeformer/models/gps_backbone/Autoformer.py:24-176``: series-wise
decomposition (moving-average trend + seasonal residual) with
AutoCorrelation attention; the decoder seeds from the label window's
seasonal part (zeros beyond) and a trend stream initialized from the input
mean, accumulated through each decoder layer.
"""

import jax.numpy as jnp
from flax import nnx

from routeformer_tpu.models.gps_backbone.config import GPSBackboneConfig
from routeformer_tpu.models.layers.autoformer_layers import (
    AutoCorrelationLayer,
    AutoformerDecoder,
    AutoformerDecoderLayer,
    AutoformerEncoder,
    AutoformerEncoderLayer,
    SeasonalLayerNorm,
    SeriesDecomp,
)
from routeformer_tpu.models.layers.embed import DataEmbedding_wo_pos


class Autoformer(nnx.Module):
    """Series-wise transformer with O(L log L) autocorrelation attention."""

    def __init__(self, configs: GPSBackboneConfig, *, rngs: nnx.Rngs):
        self.seq_len = configs.seq_len
        self.label_len = configs.label_len
        self.pred_len = configs.pred_len
        self.output_attention = configs.output_attention

        kernel_size = configs.moving_avg
        self.decomp = SeriesDecomp(
            kernel_size[0] if isinstance(kernel_size, list) else kernel_size
        )
        self.trend_projection = nnx.Linear(configs.enc_in, configs.c_out, rngs=rngs)

        self.enc_embedding = DataEmbedding_wo_pos(
            configs.enc_in, configs.d_model, configs.embed, configs.freq,
            configs.dropout, rngs=rngs,
        )
        self.dec_embedding = DataEmbedding_wo_pos(
            configs.dec_in, configs.d_model, configs.embed, configs.freq,
            configs.dropout, rngs=rngs,
        )

        self.encoder = AutoformerEncoder(
            [
                AutoformerEncoderLayer(
                    AutoCorrelationLayer(
                        configs.d_model, configs.n_heads, factor=configs.factor,
                        rngs=rngs,
                    ),
                    configs.d_model, configs.d_ff,
                    moving_avg=configs.moving_avg,
                    dropout=configs.dropout, activation=configs.activation,
                    rngs=rngs,
                )
                for _ in range(configs.e_layers)
            ],
            norm_layer=SeasonalLayerNorm(configs.d_model, rngs=rngs),
        )
        self.decoder = AutoformerDecoder(
            [
                AutoformerDecoderLayer(
                    AutoCorrelationLayer(
                        configs.d_model, configs.n_heads, factor=configs.factor,
                        rngs=rngs,
                    ),
                    AutoCorrelationLayer(
                        configs.d_model, configs.n_heads, factor=configs.factor,
                        rngs=rngs,
                    ),
                    configs.d_model, configs.c_out, configs.d_ff,
                    moving_avg=configs.moving_avg,
                    dropout=configs.dropout, activation=configs.activation,
                    rngs=rngs,
                )
                for _ in range(configs.d_layers)
            ],
            norm_layer=SeasonalLayerNorm(configs.d_model, rngs=rngs),
            projection=nnx.Linear(configs.d_model, configs.c_out, rngs=rngs),
        )

    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        """Forward: ``(B, seq_len, C) -> (B, pred_len, c_out)``."""
        b, l, c = x.shape
        x_enc = x
        x_mark_enc = jnp.broadcast_to(
            jnp.arange(l, dtype=jnp.float32)[None, :, None], (b, l, 1)
        )
        dec_len = self.label_len + self.pred_len
        x_mark_dec = jnp.broadcast_to(
            jnp.arange(
                l - self.label_len, l + self.pred_len, dtype=jnp.float32
            )[None, :, None],
            (b, dec_len, 1),
        )

        mean = jnp.repeat(x_enc.mean(axis=1, keepdims=True), self.pred_len, axis=1)
        zeros = jnp.zeros((b, self.pred_len, c), dtype=x_enc.dtype)
        seasonal_init, trend_init = self.decomp(x_enc)
        trend_init = jnp.concatenate(
            [trend_init[:, -self.label_len :, :], mean], axis=1
        )
        seasonal_init = jnp.concatenate(
            [seasonal_init[:, -self.label_len :, :], zeros], axis=1
        )

        enc_out = self.enc_embedding(x_enc, x_mark_enc)
        enc_out, attns = self.encoder(enc_out)

        dec_out = self.dec_embedding(seasonal_init, x_mark_dec)
        trend_init = self.trend_projection(trend_init)
        seasonal_part, trend_part = self.decoder(dec_out, enc_out, trend=trend_init)

        dec_out = trend_part + seasonal_part
        if self.output_attention:
            return dec_out[:, -self.pred_len :, :], attns
        return dec_out[:, -self.pred_len :, :]
