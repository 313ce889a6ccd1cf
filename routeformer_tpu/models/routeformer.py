"""Routeformer: multimodal ego-trajectory prediction model (Flax NNX).

Capability parity with reference ``routeformer/models/routeformer.py:20-533``.
The model fuses motion dynamics (GPS velocity + angle/speed/acceleration
features), scene video (left/right views) and driver gaze, feeds the fused
sequence to a GPS backbone (Informer by default), and integrates predicted
velocities by cumulative sum onto the last GPS fix.

Static-shape reformulations (TPU-first — each replaces a trace-breaking
pattern in the reference):

- **View/gaze dropout** (reference :404-410, :300-305): the reference
  branches in Python on ``torch.rand`` and skips the dropped side's
  computation. Here drop decisions are traced Bernoulli draws and the
  dropped features are masked with ``jnp.where`` — one compiled program for
  all outcomes.
- **Autoregressive decode** (reference :164-197 mutates
  ``gps_backbone.pred_len`` mid-eval): here the backbone is rebuilt at
  ``pred_len=step_size`` *at trace time* and the feedback loop is a
  ``lax.scan`` whose body compiles once.
- **FPS subsampling + zero-scatter alignment** (reference :414-459): the
  subsample indices are static (shape-derived), so gather/scatter compile to
  fixed XLA ops.

Layout: video tensors are channel-last ``(B, T, H, W, C)`` (TPU-native),
where the reference uses ``(B, T, C, H, W)``.
"""

from typing import Optional, Type

import jax
import jax.numpy as jnp
import numpy as np
from flax import nnx

from routeformer_tpu.models.config import RouteformerConfig
from routeformer_tpu.models.cross_modal import PerceiveDecoder, PerceiveEncoder
from routeformer_tpu.models.gps_backbone import Informer
from routeformer_tpu.utils.filter import median_downsampler
from routeformer_tpu.utils.vector import estimate_angle_and_norm, rotate


def _fps_subsample_indices(length: int, relative_fps: int) -> np.ndarray:
    """Indices keeping every ``relative_fps``-th frame counting back from the
    last (reference routeformer.py:415-421). Static given static shapes."""
    idx = np.arange(length - 1, 0, -relative_fps)[::-1]
    return np.ascontiguousarray(idx)


class Routeformer(nnx.Module):
    """Routeformer model predicting future vehicle trajectory."""

    def __init__(
        self,
        configs: RouteformerConfig,
        gps_backbone: Optional[Type] = Informer,
        video_backbone: Optional[Type] = None,
        *,
        rngs: nnx.Rngs,
    ):
        self.configs = configs.copy()
        self.rngs = rngs
        self.with_video = (
            self.configs.with_video
            if self.configs.with_video is not None
            else video_backbone is not None
        )
        self.with_scene = self.configs.with_scene
        self.with_gaze = self.configs.with_gaze
        # Toggled by nnx train()/eval().
        self.deterministic = False

        if not self.with_video and self.with_gaze:
            raise ValueError(
                "Current gaze backbone requires a video backbone, "
                "but video backbone is not provided."
            )
        if self.with_video and not (self.with_scene or self.with_gaze):
            # without this, preprocess_batch would hit an IndexError on the
            # empty visual-feature list deep in the first forward (the
            # reference crashes the same way; reject the config up front)
            raise ValueError(
                "with_video requires at least one visual stream: enable "
                "with_scene and/or with_gaze"
            )

        if self.with_video:
            self.video_backbone = video_backbone(
                configs=self.configs.video_backbone_config, rngs=rngs
            )
            feat_h, feat_w, feat_c = self.video_backbone.output_feature_shape

            self.frame_encoder = PerceiveEncoder(
                in_channels=feat_c,
                out_len=1,
                out_channels=self.configs.image_embedding_size,
                n_heads=self.configs.encoder_heads,
                layers=self.configs.encoder_layers,
                d_ff=self.configs.encoder_d_ff,
                dropout=self.configs.feature_dropout,
                compute_dtype=self.configs.compute_dtype,
                rngs=rngs,
            )

            # Per-view additive embeddings (reference routeformer.py:69-83).
            init = nnx.initializers.normal(1.0)
            emb = self.configs.image_embedding_size
            self.left_video_embedding = nnx.Param(init(rngs.params(), (1, 1, emb)))
            self.right_video_embedding = nnx.Param(init(rngs.params(), (1, 1, emb)))
            self.gaze_video_embedding = nnx.Param(init(rngs.params(), (1, 1, emb)))
            self.video_output_embedding = nnx.Param(init(rngs.params(), (1, 1, emb)))

            self.video_encoder = PerceiveEncoder(
                in_channels=emb,
                out_len=self.configs.gps_backbone_config.seq_len,
                out_channels=self.configs.encoder_hidden_size,
                n_heads=self.configs.encoder_heads,
                layers=self.configs.encoder_layers,
                d_ff=self.configs.encoder_d_ff,
                dropout=self.configs.feature_dropout,
                compute_dtype=self.configs.compute_dtype,
                rngs=rngs,
            )

            if self.with_gaze:
                self.gaze_encoder = PerceiveEncoder(
                    in_channels=2,
                    out_len=self.configs.gps_backbone_config.seq_len,
                    out_channels=self.configs.encoder_hidden_size,
                    n_heads=self.configs.encoder_heads,
                    layers=self.configs.encoder_layers,
                    d_ff=self.configs.encoder_d_ff,
                    dropout=self.configs.feature_dropout,
                    compute_dtype=self.configs.compute_dtype,
                    rngs=rngs,
                )
                self.gaze_video_decoder = PerceiveDecoder(
                    query_channels=self.configs.encoder_hidden_size,
                    value_channels=self.configs.encoder_hidden_size,
                    out_channels=self.configs.encoder_hidden_size,
                    out_len=self.configs.gps_backbone_config.seq_len,
                    dropout=self.configs.feature_dropout,
                    d_ff=self.configs.encoder_d_ff,
                    n_heads=self.configs.cross_modal_decoder_heads,
                    layers=self.configs.cross_modal_decoder_layers,
                    mix=False,
                    compute_dtype=self.configs.compute_dtype,
                    rngs=rngs,
                )

        self.gps_backbone = gps_backbone(
            configs=self.configs.gps_backbone_config, rngs=rngs
        )

        self.view_dropout = self.configs.view_dropout
        self.motion_noise = self.configs.motion_noise
        self.gaze_dropout = self.configs.gaze_dropout
        self.feature_dropout = self.configs.feature_dropout

    # ------------------------------------------------------------------ #
    # forward
    # ------------------------------------------------------------------ #

    def __call__(self, batch: dict, target_batch: Optional[dict] = None):
        """Forward pass (reference routeformer.py:124-202).

        batch keys: ``gps (B,T,2)``; optional ``left_video/right_video/
        front_video (B,T,H,W,C)``, ``gaze (B,Tg,2)``.

        Returns future GPS ``(B, pred_len, 2)``, or a tuple
        ``(gps, visual_features)`` when ``dense_prediction``.
        """
        motion_dynamics, visual_features = self.preprocess_batch(batch)

        input_gps = batch["gps"]
        last_input_gps = input_gps[:, -1:, :]
        is_eval = self.deterministic

        if not (is_eval and self.configs.autoregressive):
            output, _ = self._forward(motion_dynamics, visual_features)
            (_, future_gps_positions, future_visual_features) = self.postprocess_batch(
                last_input_gps, output
            )
        else:
            future_gps_positions, future_visual_features = (
                self._autoregressive_decode(
                    motion_dynamics, visual_features, last_input_gps
                )
            )

        if self.configs.dense_prediction:
            return (future_gps_positions, future_visual_features)
        return future_gps_positions

    def _autoregressive_decode(self, motion_dynamics, visual_features, last_input_gps):
        """Chunked feedback decode as a lax.scan (reference :164-197)."""
        step = self.configs.autoregressive_step_size
        pred_len = self.gps_backbone.pred_len
        n_steps = -(-pred_len // step)

        if self.with_video:
            assert self.configs.dense_prediction, (
                "Autoregressive decoding with video requires dense_prediction "
                "(the visual feature stream must be re-fed each step)."
            )

        # Rebind the backbone horizon statically for the scan body trace.
        self.gps_backbone.pred_len = step
        try:
            graphdef, state = nnx.split(self)

            # The module STATE rides the scan carry: merging a closure-
            # captured live state inside the body would make rng-count /
            # batch-stat mutations cross trace levels (TraceContextError
            # under MC eval, where ProbSparse sampling stays stochastic).
            # Carried state keeps each step's mutations trace-local and
            # threads rng counts step to step, like the reference's
            # sequential loop (reference routeformer.py:164-197).
            if self.with_video:
                def body(carry, _):
                    md, last_gps, vf, mstate = carry
                    model = nnx.merge(graphdef, mstate)
                    output, _ = model._forward(md, vf)
                    fmv, fgps, fvf = model.postprocess_batch(last_gps, output)
                    # explicit carry-dtype casts (reference .to(data_dtype),
                    # routeformer.py:181-187): lax.scan requires exact carry
                    # dtypes, which must not depend on which interfaces
                    # happen to emit f32 under compute_dtype=bfloat16
                    md = jnp.concatenate(
                        [md[:, step:], fmv.astype(md.dtype)], axis=1
                    )
                    vf = jnp.concatenate(
                        [vf[:, step:], fvf.astype(vf.dtype)], axis=1
                    )
                    mstate = nnx.state(model)
                    return (md, fgps[:, -1:, :], vf, mstate), (fgps, fvf)

                carry = (motion_dynamics, last_input_gps, visual_features, state)
                (_, _, _, state), (gps_steps, feat_steps) = jax.lax.scan(
                    body, carry, None, length=n_steps
                )
                # (n_steps, B, step, C) -> (B, n_steps*step, C)
                future_visual = jnp.concatenate(
                    [feat_steps[i] for i in range(n_steps)], axis=1
                )[:, :pred_len]
            else:
                def body(carry, _):
                    md, last_gps, mstate = carry
                    model = nnx.merge(graphdef, mstate)
                    output, _ = model._forward(md, None)
                    fmv, fgps, _ = model.postprocess_batch(last_gps, output)
                    md = jnp.concatenate(
                        [md[:, step:], fmv.astype(md.dtype)], axis=1
                    )
                    mstate = nnx.state(model)
                    return (md, fgps[:, -1:, :], mstate), fgps

                carry = (motion_dynamics, last_input_gps, state)
                (_, _, state), gps_steps = jax.lax.scan(
                    body, carry, None, length=n_steps
                )
                future_visual = None

            # Propagate the scan's state mutations (rng counts, batch stats)
            # back onto the live module.
            nnx.update(self, state)

            future_gps = jnp.concatenate(
                [gps_steps[i] for i in range(n_steps)], axis=1
            )[:, :pred_len]
        finally:
            self.gps_backbone.pred_len = pred_len

        return future_gps, future_visual

    def _forward(self, motion_dynamics, visual_features):
        """Feature enrichment + GPS backbone (reference routeformer.py:204-252)."""
        angle, norm = estimate_angle_and_norm(motion_dynamics)
        if self.configs.rotate_motion:
            origin_angles = angle[:, -1:, :]
        else:
            origin_angles = angle[:, :1, :]
        normalized_angles = (angle - origin_angles) / jnp.pi
        acceleration = norm[:, 1:, :] - norm[:, :-1, :]
        acceleration = jnp.pad(acceleration, ((0, 0), (1, 0), (0, 0)))
        if self.configs.rotate_motion:
            motion_dynamics = rotate(motion_dynamics, -origin_angles)

        motion_dynamics = jnp.concatenate(
            [motion_dynamics, normalized_angles, norm, acceleration], axis=-1
        )

        inputs = [motion_dynamics]
        if self.with_video:
            inputs.append(visual_features)
        if self.configs._only_motion:
            inputs[-1] = jnp.zeros_like(inputs[-1])

        x = jnp.concatenate(inputs, axis=-1)

        attention = None
        if self.configs.output_attention:
            output, attention = self.gps_backbone(x)
        else:
            output = self.gps_backbone(x)

        if self.configs.decoder_mode == "recursive":
            if self.configs.dense_prediction:
                output = output + x[:, -1:, :]
            else:
                output = output + x[:, -1:, :2]

        if self.configs.rotate_motion:
            rotated = rotate(output[:, :, :2], origin_angles)
            output = jnp.concatenate([rotated, output[:, :, 2:]], axis=-1)

        return output, attention

    # ------------------------------------------------------------------ #
    # pre/post-processing
    # ------------------------------------------------------------------ #

    def preprocess_batch(self, batch: dict, training: Optional[bool] = None):
        """Batch -> (motion_dynamics, fused_visual_features)
        (reference routeformer.py:254-348)."""
        if training is None:
            training = not self.deterministic

        gps = batch["gps"].astype(jnp.float32)

        if self.motion_noise > 0.0 and training:
            gps = gps + (
                jax.random.normal(self.rngs.dropout(), gps.shape, gps.dtype)
                * self.motion_noise
            )

        motion_vector = gps[:, 1:, :] - gps[:, :-1, :]
        if self.configs.normalize_motion:
            motion_vector = (
                motion_vector - self.configs.motion_mean
            ) / self.configs.motion_std
        # Zero-pad front so video features align with the dynamics.
        motion_dynamics = jnp.pad(motion_vector, ((0, 0), (1, 0), (0, 0)))

        visual_features = []
        # All video streams (left/right scene + front gaze camera) ride ONE
        # backbone-encode and ONE frame-encoder call — the fusion encoder is
        # latency-bound, so call count is the measured lever (docs/PERF.md).
        scene = front = None
        if self.with_video and self.with_scene:
            scene = self._prepare_scene(batch, training)
        if self.with_gaze:
            front = self._prepare_front(batch)
        streams = []
        if scene is not None:
            streams += [
                (scene["left"], scene["precomputed"]),
                (scene["right"], scene["precomputed"]),
            ]
        if front is not None:
            streams.append((front["video"], front["precomputed"]))
        encoded = self._encode_frame_streams(streams) if streams else []

        if scene is not None:
            left_features, right_features = self._finish_scene(
                scene, encoded[0], encoded[1], training
            )
            visual_features.extend([left_features, right_features])

        if self.with_gaze:
            gaze_positions = batch["gaze"].astype(jnp.float32)
            gaze_video_features = self._scatter_timeline(
                encoded[-1], front["batch_size"], front["length"],
                front["indices"],
            )
            input_sequence_length = gaze_video_features.shape[1]
            gaze_positions = median_downsampler(
                gaze_positions, self.configs.gps_backbone_config.seq_len
            )
            gaze_positions = self.gaze_encoder(gaze_positions)
            gaze_features = self.gaze_video_decoder(
                gaze_video_features, gaze_positions
            )
            gaze_features = gaze_features[:, :input_sequence_length]

            if self.gaze_dropout > 0.0 and training:
                drop_gaze = jax.random.bernoulli(
                    self.rngs.dropout(), self.gaze_dropout
                )
                gaze_features = jnp.where(drop_gaze, 0.0, gaze_features)
            visual_features.append(gaze_features)

        if self.with_video:
            if self.with_scene:
                visual_features[0] = visual_features[0] + self.left_video_embedding[...]
                visual_features[1] = (
                    visual_features[1] + self.right_video_embedding[...]
                )
            if self.with_gaze:
                visual_features[-1] = (
                    visual_features[-1] + self.gaze_video_embedding[...]
                )
            visual_features = jnp.concatenate(
                [
                    *visual_features,
                    jnp.zeros_like(visual_features[-1])
                    + self.video_output_embedding[...],
                ],
                axis=1,
            )
            visual_features = self.video_encoder(visual_features)
        else:
            visual_features = None

        return motion_dynamics, visual_features

    def postprocess_batch(self, last_input_gps, output):
        """Integrate velocities onto the last fix (reference routeformer.py:350-395)."""
        future_motion_vector = output[:, :, :2]
        if self.configs.normalize_motion:
            future_motion_vector = (
                future_motion_vector * self.configs.motion_std
            ) + self.configs.motion_mean
        future_gps_positions = last_input_gps + jnp.cumsum(future_motion_vector, axis=1)
        future_gps_positions = future_gps_positions.astype(last_input_gps.dtype)
        rest = output[:, :, 2:]

        future_visual_features = None
        if self.with_video and self.configs.dense_prediction:
            emb = self.configs.image_embedding_size
            assert rest.shape[-1] >= emb, (
                f"Output shape for left/right vid. must be at least {emb}, "
                f"but is {rest.shape}."
            )
            future_visual_features = rest[:, :, :emb]
            rest = rest[:, :, emb:]

        assert rest.shape[-1] == 0, (
            f"Output should be empty at this point, but is {rest.shape}."
        )

        return future_motion_vector, future_gps_positions, future_visual_features

    # ------------------------------------------------------------------ #
    # video / gaze paths
    # ------------------------------------------------------------------ #

    def _prepare_scene(self, batch: dict, training: bool):
        """Scene-view data prep (reference routeformer.py:397-461): pixel or
        precomputed-feature streams, subsampled and flattened, plus the
        view-drop decisions — no compute yet.

        Accepts either pixel streams (``left_video``/``right_video``) or
        precomputed frozen-backbone feature maps
        (``left_video_features``/``right_video_features``, full timeline —
        see ``video_backbone.cache.VideoFeaturePrecomputer``), the
        torchcache role: cache hits keep the backbone out of the compiled
        step entirely.
        """
        precomputed = "left_video_features" in batch
        if precomputed:
            left = batch["left_video_features"]
            right = batch.get("right_video_features", left)
            has_right = "right_video_features" in batch
        else:
            left = batch["left_video"]
            right = batch.get("right_video", left)
            has_right = "right_video" in batch

        # View dropout (traced decisions; features masked, not skipped).
        if self.view_dropout > 0.0 and training:
            key = self.rngs.dropout()
            k1, k2 = jax.random.split(key)
            drop_one_view = jax.random.bernoulli(k1, self.view_dropout)
            coin = jax.random.bernoulli(k2, 0.5)
            drop_left = jnp.logical_and(drop_one_view, coin)
            drop_right = jnp.logical_or(
                jnp.logical_and(drop_one_view, jnp.logical_not(drop_left)),
                not has_right,
            )
        else:
            drop_left = jnp.asarray(False)
            drop_right = jnp.asarray(not has_right)

        relative_fps = self.configs.output_fps // self.configs.video_fps
        # enforce what the message says (the reference only checks > 0, so
        # a non-divisor config would silently misalign the frame timeline)
        assert (
            relative_fps > 0
            and self.configs.output_fps % self.configs.video_fps == 0
        ), "Video FPS must be a divisor of the output FPS"
        original_video_length = left.shape[1]
        video_indices = _fps_subsample_indices(original_video_length, relative_fps)
        left = left[:, video_indices]
        right = right[:, video_indices]

        batch_size = left.shape[0]
        return dict(
            left=left.reshape((-1,) + left.shape[2:]),
            right=right.reshape((-1,) + right.shape[2:]),
            precomputed=precomputed,
            drop_left=drop_left,
            drop_right=drop_right,
            batch_size=batch_size,
            length=original_video_length,
            indices=video_indices,
        )

    def _prepare_front(self, batch: dict):
        """Front (gaze-camera) stream prep (reference routeformer.py:493-533)."""
        precomputed = "front_video_features" in batch
        video = batch["front_video_features"] if precomputed else batch["front_video"]
        relative_fps = self.configs.output_fps // self.configs.gaze_fps
        assert (
            relative_fps > 0
            and self.configs.output_fps % self.configs.gaze_fps == 0
        ), "Gaze FPS must be a divisor of the output FPS"
        original_video_length = video.shape[1]
        video_indices = _fps_subsample_indices(original_video_length, relative_fps)
        video = video[:, video_indices]
        batch_size = video.shape[0]
        return dict(
            video=video.reshape((-1,) + video.shape[2:]),
            precomputed=precomputed,
            batch_size=batch_size,
            length=original_video_length,
            indices=video_indices,
        )

    def _encode_frame_streams(self, streams):
        """Per-frame embeddings for several streams in ONE fusion call
        (reference's per-view loop, routeformer.py:463-491).

        streams: list of (array, precomputed) where array is flattened
        frames (Ni, H, W, C) — resolutions may differ per stream — or the
        backbone's feature maps (Ni, H', W', C'). The tiny-dim fusion
        encoder is latency-bound, so all streams share one backbone encode
        (when the backbone exposes the preprocess/encode split) and one
        frame-encoder call; per-frame math is unchanged (same parameters).
        Returns a list of (Ni, image_embedding_size).
        """
        sizes = [s.shape[0] for s, _ in streams]

        feature_maps = [None] * len(streams)
        pixel_ix = [i for i, (_, pre) in enumerate(streams) if not pre]
        for i, (s, pre) in enumerate(streams):
            if pre:
                feature_maps[i] = s.astype(jnp.float32)
        if pixel_ix:
            bb = self.video_backbone
            if hasattr(bb, "preprocess_frames") and hasattr(bb, "encode_frames"):
                # Merge: per-stream resize/normalize to the backbone-native
                # resolution, then one encoder pass over all frames.
                pre_all = jnp.concatenate(
                    [bb.preprocess_frames(streams[i][0]) for i in pixel_ix], axis=0
                )
                enc_all = bb.encode_frames(pre_all)
                offsets = np.cumsum([sizes[i] for i in pixel_ix])[:-1]
                for i, part in zip(pixel_ix, jnp.split(enc_all, offsets, axis=0)):
                    feature_maps[i] = part
            else:
                # Backbones without a canonical input size (InverseForm)
                # run per stream.
                for i in pixel_ix:
                    feature_maps[i] = bb(streams[i][0])

        # Feature-map spatial shapes can differ across streams (mixed
        # precomputed dtypes are unified above); tokens per frame must match
        # for one fused call — they do whenever one backbone serves all
        # streams, which is the model's invariant.
        tokens = jnp.concatenate(
            [f.reshape(f.shape[0], -1, f.shape[-1]) for f in feature_maps], axis=0
        )
        tokens = jnp.concatenate(
            [tokens, -jnp.ones_like(tokens[:, :1, :])], axis=1
        )
        encoded = self.frame_encoder(tokens)  # (sum N, 1, emb)
        encoded = encoded.reshape(-1, self.configs.image_embedding_size)
        return jnp.split(encoded, np.cumsum(sizes)[:-1], axis=0)

    @staticmethod
    def _scatter_timeline(feats, batch_size, length, indices):
        """(B*T', emb) -> (B, T, emb), zeros where no frame was sampled."""
        feats = feats.reshape(batch_size, -1, feats.shape[-1])
        full = jnp.zeros((batch_size, length, feats.shape[-1]), feats.dtype)
        return full.at[:, indices].set(feats)

    def _forward_video(self, batch: dict, training: bool):
        """Left/right scene features on the output-fps timeline (standalone
        path; preprocess_batch uses the merged-stream path)."""
        scene = self._prepare_scene(batch, training)
        left_features, right_features = self._encode_frame_streams(
            [(scene["left"], scene["precomputed"]),
             (scene["right"], scene["precomputed"])]
        )
        return self._finish_scene(scene, left_features, right_features, training)

    def _finish_scene(self, scene, left_features, right_features, training):
        if training:
            left_features = jnp.where(
                scene["drop_left"], jnp.zeros_like(left_features), left_features
            )
            right_features = jnp.where(
                scene["drop_right"], jnp.zeros_like(right_features), right_features
            )
        args = (scene["batch_size"], scene["length"], scene["indices"])
        return (
            self._scatter_timeline(left_features, *args),
            self._scatter_timeline(right_features, *args),
        )

    def _forward_gaze_video(self, batch: dict, training: bool):
        """Front video features (standalone path; preprocess_batch uses the
        merged-stream path)."""
        front = self._prepare_front(batch)
        (features,) = self._encode_frame_streams(
            [(front["video"], front["precomputed"])]
        )
        return self._scatter_timeline(
            features, front["batch_size"], front["length"], front["indices"]
        )
