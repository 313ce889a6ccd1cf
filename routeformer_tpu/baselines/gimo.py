"""Adapted GIMO baseline (Flax NNX).

Capability parity with reference ``experiments/gimo/adapted_gimo.py:36-210``
and its vendored GIMO Perceiver blocks (``experiments/gimo/
base_cross_model.py``): motion/gaze/scene encoders with bidirectional
cross-attention fusion, adapted to this data (no pointnet/3-D scene; the
shared frame encoder supplies scene features; 2-D gaze).

GIMO block conventions preserved: residual-inside attention
(``q + dropout(attn)``), pre-norm on q/kv, residual positionwise FFN,
learnable latent arrays initialized N(0, 0.02) clamped to ±2.
"""

from typing import Optional, Type

import jax
import jax.numpy as jnp
import numpy as np
from flax import nnx

from routeformer_tpu.models.cross_modal import PerceiveEncoder as BetterPerceiveEncoder
from routeformer_tpu.ops.attention import dot_product_attention
from routeformer_tpu.utils.filter import median_downsampler


def _latent_init(key, shape):
    vals = 0.02 * jax.random.normal(key, shape)
    return jnp.clip(vals, -2.0, 2.0)


class MultiHeadAttention(nnx.Module):
    """Residual MHA with distinct kv width (reference base_cross_model.py:9-43)."""

    def __init__(self, num_heads, num_q_channels, num_kv_channels, dropout=0.1,
                 *, rngs: nnx.Rngs):
        self.n_heads = num_heads
        d = num_q_channels
        self.wq = nnx.Linear(d, d, rngs=rngs)
        self.wk = nnx.Linear(num_kv_channels, d, rngs=rngs)
        self.wv = nnx.Linear(num_kv_channels, d, rngs=rngs)
        self.wo = nnx.Linear(d, d, rngs=rngs)
        self.dropout = nnx.Dropout(dropout, rngs=rngs)

    def __call__(self, q, kv):
        b, l, d = q.shape
        s = kv.shape[1]
        h = self.n_heads
        qh = self.wq(q).reshape(b, l, h, d // h)
        kh = self.wk(kv).reshape(b, s, h, d // h)
        vh = self.wv(kv).reshape(b, s, h, d // h)
        out, _ = dot_product_attention(qh, kh, vh)
        return q + self.dropout(self.wo(out.reshape(b, l, d)))


class PositionwiseFeedForward(nnx.Module):
    """Residual 2-layer GELU FFN (reference base_cross_model.py:46-61)."""

    def __init__(self, d_in, d_hid, dropout=0.1, *, rngs: nnx.Rngs):
        self.w1 = nnx.Linear(d_in, d_hid, rngs=rngs)
        self.w2 = nnx.Linear(d_hid, d_in, rngs=rngs)
        self.dropout = nnx.Dropout(dropout, rngs=rngs)

    def __call__(self, x):
        return x + self.dropout(self.w2(jax.nn.gelu(self.w1(x), approximate=False)))


class SelfAttentionLayer(nnx.Module):
    """norm -> residual self-attn -> residual FFN (reference :87-114)."""

    def __init__(self, num_heads, num_q_channels, dropout=0.1, *, rngs: nnx.Rngs):
        self.norm = nnx.LayerNorm(num_q_channels, rngs=rngs)
        self.attn = MultiHeadAttention(
            num_heads, num_q_channels, num_q_channels, dropout, rngs=rngs
        )
        self.mlp = PositionwiseFeedForward(
            num_q_channels, num_q_channels, dropout, rngs=rngs
        )

    def __call__(self, x):
        y = self.norm(x)
        return self.mlp(self.attn(y, y))


class CrossAttentionLayer(nnx.Module):
    """pre-norm cross-attn + residual FFN (reference :117-144)."""

    def __init__(self, num_heads, num_q_channels, num_kv_channels, dropout=0.1,
                 *, rngs: nnx.Rngs):
        self.q_norm = nnx.LayerNorm(num_q_channels, rngs=rngs)
        self.kv_norm = nnx.LayerNorm(num_kv_channels, rngs=rngs)
        self.attn = MultiHeadAttention(
            num_heads, num_q_channels, num_kv_channels, dropout, rngs=rngs
        )
        self.mlp = PositionwiseFeedForward(
            num_q_channels, num_q_channels, dropout, rngs=rngs
        )

    def __call__(self, q, kv):
        return self.mlp(self.attn(self.q_norm(q), self.kv_norm(kv)))


def _sinusoid_table(n_position, d_hid):
    pos = np.arange(n_position)[:, None]
    dim = np.arange(d_hid)[None, :]
    angle = pos / np.power(10000, 2 * (dim // 2) / d_hid)
    table = np.zeros((n_position, d_hid))
    table[:, 0::2] = np.sin(angle[:, 0::2])
    table[:, 1::2] = np.cos(angle[:, 1::2])
    return jnp.asarray(table, dtype=jnp.float32)


class GIMOPerceiveEncoder(nnx.Module):
    """Latent-array Perceiver encoder (reference base_cross_model.py:147-198)."""

    def __init__(
        self, n_input_channels, n_latent, n_latent_channels=512,
        n_cross_att_heads=1, n_self_att_heads=8, n_self_att_layers=6,
        dropout=0.1, n_position=400, *, rngs: nnx.Rngs,
    ):
        self.pos_table = _sinusoid_table(n_position, n_input_channels)
        self.dropout = nnx.Dropout(dropout, rngs=rngs)
        self.cross_att = CrossAttentionLayer(
            n_cross_att_heads, n_latent_channels, n_input_channels, dropout,
            rngs=rngs,
        )
        self.self_att = nnx.List(
            [
                SelfAttentionLayer(n_self_att_heads, n_latent_channels, dropout,
                                   rngs=rngs)
                for _ in range(n_self_att_layers)
            ]
        )
        self.latent = nnx.Param(
            _latent_init(rngs.params(), (n_latent, n_latent_channels))
        )

    def __call__(self, feats):
        b, l, _ = feats.shape
        enc = self.dropout(feats + self.pos_table[None, :l])
        x = jnp.broadcast_to(
            self.latent[...][None], (b,) + self.latent[...].shape
        )
        x = self.cross_att(x, enc)
        for layer in self.self_att:
            x = layer(x)
        return x


class GIMOPerceiveDecoder(nnx.Module):
    """Learnable-query cross-attention decoder (reference :201-239)."""

    def __init__(
        self, n_query, n_query_channels, n_latent_channels,
        n_cross_att_heads=1, dropout=0.1, *, rngs: nnx.Rngs,
    ):
        self.cross_att = CrossAttentionLayer(
            n_cross_att_heads, n_query_channels, n_latent_channels, dropout,
            rngs=rngs,
        )
        self.query_latent = nnx.Param(
            _latent_init(rngs.params(), (n_query, n_query_channels))
        )

    def __call__(self, query, latent):
        q = query + self.query_latent[...][None]
        return self.cross_att(q, latent)


class AdaptedGIMO(nnx.Module):
    """GIMO adapted to Routeformer data (reference adapted_gimo.py:36-210)."""

    def __init__(self, configs, video_backbone: Optional[Type] = None, *, rngs: nnx.Rngs):
        self.configs = configs
        h = configs.encoder_hidden_size
        input_len = configs.gps_backbone_config.seq_len
        output_len = configs.gps_backbone_config.pred_len

        self.video_backbone = video_backbone(
            configs=configs.video_backbone_config, rngs=rngs
        )
        feat_c = self.video_backbone.output_feature_shape[-1]
        self.frame_encoder = BetterPerceiveEncoder(
            in_channels=feat_c,
            out_len=1,
            out_channels=configs.image_embedding_size,
            n_heads=configs.encoder_heads,
            layers=configs.encoder_layers,
            dropout=configs.feature_dropout,
            d_ff=configs.encoder_d_ff,
            rngs=rngs,
        )

        self.motion_linear = nnx.Linear(2, h, rngs=rngs)
        self.motion_encoder = GIMOPerceiveEncoder(
            2 * h, output_len, h,
            n_self_att_heads=configs.encoder_heads,
            n_self_att_layers=configs.encoder_layers,
            dropout=configs.feature_dropout, rngs=rngs,
        )
        self.motion_decoder = GIMOPerceiveDecoder(
            output_len, h, h, dropout=configs.feature_dropout, rngs=rngs
        )
        self.motion_scene_decoder = GIMOPerceiveDecoder(
            input_len, h, 2 * h, dropout=configs.feature_dropout, rngs=rngs
        )
        self.gaze_scene_decoder = GIMOPerceiveDecoder(
            input_len, h, h, dropout=configs.feature_dropout, rngs=rngs
        )
        self.gaze_linear = nnx.Linear(2, h, rngs=rngs)
        self.gaze_encoder = GIMOPerceiveEncoder(
            h, output_len, h,
            n_self_att_heads=configs.encoder_heads,
            n_self_att_layers=configs.encoder_layers,
            dropout=configs.feature_dropout, rngs=rngs,
        )
        self.gaze_motion_decoder = GIMOPerceiveDecoder(
            output_len, h, h, dropout=configs.feature_dropout, rngs=rngs
        )
        self.motion_gaze_decoder = GIMOPerceiveDecoder(
            output_len, h, h, dropout=configs.feature_dropout, rngs=rngs
        )

        embedding_dim = 4 * h
        self.embedding_layer = PositionwiseFeedForward(
            embedding_dim, embedding_dim, rngs=rngs
        )
        self.output_encoder = GIMOPerceiveEncoder(
            embedding_dim, output_len, h,
            n_self_att_heads=configs.encoder_heads,
            n_self_att_layers=configs.encoder_layers,
            dropout=configs.feature_dropout, rngs=rngs,
        )
        self.outputlayer = nnx.Linear(h, 2, rngs=rngs)

    def _forward_single_video(self, video):
        """(B, T, H, W, C) -> (B, T, image_embedding_size)
        (reference adapted_gimo.py:186-210)."""
        b = video.shape[0]
        frames = video.reshape((-1,) + video.shape[2:])
        feats = self.video_backbone(frames)  # (N, H', W', C')
        n = feats.shape[0]
        tokens = feats.reshape(n, -1, feats.shape[-1])
        tokens = jnp.concatenate(
            [tokens, -jnp.ones_like(tokens[:, :1, :])], axis=1
        )
        encoded = self.frame_encoder(tokens)
        return encoded.reshape(b, -1, self.configs.image_embedding_size)

    def __call__(self, batch: dict, target_batch=None):
        gps = batch["gps"].astype(jnp.float32)
        motion_vector = gps[:, 1:, :] - gps[:, :-1, :]
        motions = jnp.pad(motion_vector, ((0, 0), (1, 0), (0, 0)))

        left = batch["left_video"]
        right = batch.get("right_video", left)
        left_feats = self._forward_single_video(left)
        right_feats = self._forward_single_video(right)
        scene_feats = jnp.concatenate([left_feats, right_feats], axis=2)
        scene_global = jnp.repeat(
            scene_feats[:, -1:, :], self.configs.gps_backbone_config.pred_len, axis=1
        )

        motion_feats = self.motion_linear(motions)
        motion_scene = self.motion_scene_decoder(motion_feats, scene_feats)
        motion_feats = jnp.concatenate([motion_feats, motion_scene], axis=2)
        motion_embedding = self.motion_encoder(motion_feats)

        front = batch["front_video"]
        raw_gaze = batch["gaze"].astype(jnp.float32)
        gazes = median_downsampler(
            raw_gaze, self.configs.gps_backbone_config.seq_len
        )
        front_feats = self._forward_single_video(front)
        gaze_embedding = self.gaze_linear(gazes)
        gaze_embedding = self.gaze_scene_decoder(gaze_embedding, front_feats)
        gaze_embedding = self.gaze_encoder(gaze_embedding)

        gaze_motion = self.gaze_motion_decoder(gaze_embedding, motion_embedding)
        motion_gaze = self.motion_gaze_decoder(motion_embedding, gaze_embedding)

        cross = jnp.concatenate([scene_global, gaze_motion, motion_gaze], axis=2)
        cross = self.embedding_layer(cross)
        cross = self.output_encoder(cross)
        output = self.outputlayer(cross)

        last_input_gps = gps[:, -1:, :]
        return last_input_gps + jnp.cumsum(output, axis=1)
