"""FEDformer GPS backbone (Flax NNX).

Capability parity with reference
``routeformer/models/gps_backbone/FEDformer.py:23-188``: frequency-enhanced
decomposition transformer with O(N) attention. ``version="Wavelets"``
(default) uses Legendre multiwavelet blocks; ``version="Fourier"`` uses
selected-mode Fourier blocks. The decoder seeds from the last ``label_len``
of the seasonal part (zero-padded) and a trend stream from the input mean.

Reference quirk preserved: the *same* frequency-block instance is shared
across all encoder (resp. decoder) layers (FEDformer.py:66-136 constructs
one ``encoder_self_att`` and passes it to every layer) — a weight-sharing
behavior, replicated here via shared module references.
"""

import jax.numpy as jnp
from flax import nnx

from routeformer_tpu.models.gps_backbone.config import FEDFormerBackboneConfig
from routeformer_tpu.models.layers.autoformer_layers import (
    AutoCorrelationLayer,
    AutoformerDecoder,
    AutoformerDecoderLayer,
    AutoformerEncoder,
    AutoformerEncoderLayer,
    SeasonalLayerNorm,
    SeriesDecomp,
    SeriesDecompMulti,
)
from routeformer_tpu.models.layers.embed import DataEmbedding_wo_pos
from routeformer_tpu.models.layers.fourier import FourierBlock, FourierCrossAttention
from routeformer_tpu.models.layers.multiwavelet import (
    MultiWaveletCross,
    MultiWaveletTransform,
)


class FEDformer(nnx.Module):
    """Frequency-enhanced decomposition transformer, O(N)."""

    def __init__(self, configs: FEDFormerBackboneConfig, *, rngs: nnx.Rngs):
        self.version = configs.get("version", "Wavelets")
        self.mode_select = configs.get("mode_select", "random")
        self.modes = configs.get("modes", 32)
        self.seq_len = configs.seq_len
        self.label_len = configs.label_len
        self.pred_len = configs.pred_len
        self.output_attention = configs.output_attention

        kernel_size = configs.moving_avg
        if isinstance(kernel_size, list):
            self.decomp = SeriesDecompMulti(kernel_size, rngs=rngs)
        else:
            self.decomp = SeriesDecomp(kernel_size)
        # The reference FEDformer (FEDformer.py:140-188) feeds the enc_in-
        # channel trend straight into the c_out-channel trend accumulation
        # and would crash whenever enc_in != c_out (it is never instantiated
        # by the driver). We apply the same fix its Autoformer carries
        # (Autoformer.py:47): project the trend seed to c_out.
        self.trend_projection = nnx.Linear(configs.enc_in, configs.c_out, rngs=rngs)

        self.enc_embedding = DataEmbedding_wo_pos(
            configs.enc_in, configs.d_model, configs.embed, configs.freq,
            configs.dropout, rngs=rngs,
        )
        self.dec_embedding = DataEmbedding_wo_pos(
            configs.dec_in, configs.d_model, configs.embed, configs.freq,
            configs.dropout, rngs=rngs,
        )

        if self.version == "Wavelets":
            encoder_self_att = MultiWaveletTransform(
                ich=configs.d_model, L=configs.get("L", 0),
                base=configs.get("base", "legendre"), rngs=rngs,
            )
            decoder_self_att = MultiWaveletTransform(
                ich=configs.d_model, L=configs.get("L", 0),
                base=configs.get("base", "legendre"), rngs=rngs,
            )
            decoder_cross_att = MultiWaveletCross(
                in_channels=configs.d_model, out_channels=configs.d_model,
                seq_len_q=self.seq_len // 2 + self.pred_len,
                seq_len_kv=self.seq_len,
                modes=self.modes, ich=configs.d_model,
                base=configs.get("base", "legendre"),
                activation=configs.get("cross_activation", "tanh"),
                rngs=rngs,
            )
        else:
            encoder_self_att = FourierBlock(
                in_channels=configs.d_model, out_channels=configs.d_model,
                seq_len=self.seq_len, modes=self.modes,
                mode_select_method=self.mode_select, n_heads=configs.n_heads,
                rngs=rngs,
            )
            decoder_self_att = FourierBlock(
                in_channels=configs.d_model, out_channels=configs.d_model,
                seq_len=self.seq_len // 2 + self.pred_len, modes=self.modes,
                mode_select_method=self.mode_select, n_heads=configs.n_heads,
                rngs=rngs,
            )
            decoder_cross_att = FourierCrossAttention(
                in_channels=configs.d_model, out_channels=configs.d_model,
                seq_len_q=self.seq_len // 2 + self.pred_len,
                seq_len_kv=self.seq_len, modes=self.modes,
                mode_select_method=self.mode_select, n_heads=configs.n_heads,
                rngs=rngs,
            )

        self.encoder = AutoformerEncoder(
            [
                AutoformerEncoderLayer(
                    AutoCorrelationLayer(
                        configs.d_model, configs.n_heads,
                        inner=encoder_self_att, rngs=rngs,
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
                        configs.d_model, configs.n_heads,
                        inner=decoder_self_att, rngs=rngs,
                    ),
                    AutoCorrelationLayer(
                        configs.d_model, configs.n_heads,
                        inner=decoder_cross_att, rngs=rngs,
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
        """Forward: ``(B, seq_len, C) -> (B, pred_len, c_out)``.

        Note: the FEDformer decoder operates on the last ``seq_len//2``
        labels + ``pred_len`` zeros (reference FEDformer.py:163-176 slices
        ``-self.label_len:`` where the block geometry assumes seq_len//2 —
        with the driver's label_len == seq_len the reference feeds the full
        label window; preserved here).
        """
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
        seasonal_init, trend_init = self.decomp(x_enc)
        trend_init = jnp.concatenate(
            [trend_init[:, -self.label_len :, :], mean], axis=1
        )
        seasonal_init = jnp.pad(
            seasonal_init[:, -self.label_len :, :],
            ((0, 0), (0, self.pred_len), (0, 0)),
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
