"""MultiModalTransformer baseline (Flax NNX).

Capability parity with reference
``experiments/multimodal_transformer/multimodal_transformer.py:35-154``:
naive fusion — concat motion, left/right scene, gaze-video and gaze
features into one token stream, feed a vanilla Transformer backbone (enc_in
overridden to ``5 * encoder_hidden_size``), integrate velocities by cumsum.
"""

from typing import Optional, Type

import jax.numpy as jnp
from flax import nnx

from routeformer_tpu.models.cross_modal import PerceiveEncoder
from routeformer_tpu.models.gps_backbone.transformer import Transformer
from routeformer_tpu.utils.filter import median_downsampler


class MultiModalTransformer(nnx.Module):
    """Naive concat-fusion transformer baseline."""

    def __init__(self, configs, video_backbone: Optional[Type] = None, *, rngs: nnx.Rngs):
        self.configs = configs
        h = configs.encoder_hidden_size

        self.video_backbone = video_backbone(
            configs=configs.video_backbone_config, rngs=rngs
        )
        feat_c = self.video_backbone.output_feature_shape[-1]
        self.frame_encoder = PerceiveEncoder(
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
        self.gaze_linear = nnx.Linear(2, h, rngs=rngs)

        gps_backbone_config = configs.gps_backbone_config.copy()
        gps_backbone_config._enc_in = h * 5
        gps_backbone_config._c_out = 2
        self.transformer = Transformer(configs=gps_backbone_config, rngs=rngs)

    def _forward_single_video(self, video):
        b = video.shape[0]
        frames = video.reshape((-1,) + video.shape[2:])
        feats = self.video_backbone(frames)
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
        motion_feats = self.motion_linear(motions)

        left = batch["left_video"]
        right = batch.get("right_video", left)
        left_feats = self._forward_single_video(left)
        right_feats = self._forward_single_video(right)
        scene_feats = jnp.concatenate([left_feats, right_feats], axis=2)

        gaze_video_feats = self._forward_single_video(batch["front_video"])

        raw_gaze = batch["gaze"].astype(jnp.float32)
        gazes = median_downsampler(
            raw_gaze, self.configs.gps_backbone_config.seq_len
        )
        gaze_feats = self.gaze_linear(gazes)

        feats = jnp.concatenate(
            [motion_feats, scene_feats, gaze_video_feats, gaze_feats], axis=2
        )
        output = self.transformer(feats)

        last_input_gps = gps[:, -1:, :]
        return last_input_gps + jnp.cumsum(output, axis=1)
