"""Tests for PerceiveEncoder/Decoder and the full Routeformer model."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest
from flax import nnx

from routeformer_tpu.models import PerceiveDecoder, PerceiveEncoder, RouteformerConfig
from routeformer_tpu.models.gps_backbone import GPSBackboneConfig, Informer
from routeformer_tpu.models.routeformer import Routeformer
from routeformer_tpu.models.video_backbone import SwinV2, TimmBackboneConfig

SEQ_LEN, PRED_LEN = 40, 30


def gps_config(**kwargs):
    defaults = dict(
        seq_len=SEQ_LEN, label_len=SEQ_LEN, pred_len=PRED_LEN,
        d_model=32, n_heads=4, e_layers=2, d_layers=1, d_ff=64,
        factor=4, dropout=0.0, activation="relu", distil=True,
    )
    defaults.update(kwargs)
    return GPSBackboneConfig(**defaults)


def video_config():
    return TimmBackboneConfig(model_type="vit_tiny_test", cache_enabled=False)


def full_config(**kwargs):
    defaults = dict(
        gps_backbone_config=gps_config(),
        decoder_mode="smart",
        encoder_hidden_size=16,
        encoder_heads=4,
        encoder_layers=2,
        encoder_d_ff=32,
        cross_modal_decoder_heads=4,
        cross_modal_decoder_layers=1,
        image_embedding_size=16,
        output_fps=5,
        video_fps=1,
        gaze_fps=1,
    )
    defaults.update(kwargs)
    return RouteformerConfig(**defaults)


def make_batch(rng, with_video=False, with_gaze=False, B=2):
    batch = {"gps": jnp.asarray(rng.normal(size=(B, SEQ_LEN, 2)).astype(np.float32))}
    if with_video:
        vid = lambda: jnp.asarray(
            rng.uniform(size=(B, SEQ_LEN, 24, 32, 3)).astype(np.float32)
        )
        batch["left_video"] = vid()
        batch["right_video"] = vid()
    if with_gaze:
        batch["front_video"] = jnp.asarray(
            rng.uniform(size=(B, SEQ_LEN, 24, 32, 3)).astype(np.float32)
        )
        batch["gaze"] = jnp.asarray(
            rng.normal(size=(B, 200, 2)).astype(np.float32)
        )
    return batch


class TestPerceiver:
    def test_encoder_truncates_to_out_len(self, rng):
        enc = PerceiveEncoder(
            in_channels=8, out_channels=4, out_len=5, d_model=16, n_heads=4,
            layers=2, d_ff=32, dropout=0.0, rngs=nnx.Rngs(0, dropout=1),
        )
        enc.eval()
        x = jnp.asarray(rng.normal(size=(2, 20, 8)).astype(np.float32))
        out = enc(x)
        assert out.shape == (2, 5, 4)

    def test_decoder_shapes(self, rng):
        dec = PerceiveDecoder(
            query_channels=6, value_channels=16, out_channels=4, out_len=10,
            n_heads=4, layers=1, d_ff=32, dropout=0.0,
            rngs=nnx.Rngs(0, dropout=1),
        )
        dec.eval()
        queries = jnp.asarray(rng.normal(size=(2, 12, 6)).astype(np.float32))
        values = jnp.asarray(rng.normal(size=(2, 20, 16)).astype(np.float32))
        out = dec(values, queries)
        assert out.shape == (2, 10, 4)


class TestRouteformerGPSOnly:
    def test_forward_shape(self, rng):
        model = Routeformer(full_config(), rngs=nnx.Rngs(0, dropout=1))
        model.eval()
        out = model(make_batch(rng))
        assert out.shape == (2, PRED_LEN, 2)
        assert np.isfinite(np.asarray(out)).all()

    def test_cumsum_integration(self, rng):
        """Predictions start from the last input fix: pred[0] = last + v[0]."""
        model = Routeformer(full_config(), rngs=nnx.Rngs(0, dropout=1))
        model.eval()
        batch = make_batch(rng)
        motion, visual = model.preprocess_batch(batch)
        output, _ = model._forward(motion, visual)
        _, gps_pred, _ = model.postprocess_batch(batch["gps"][:, -1:, :], output)
        manual = np.asarray(batch["gps"][:, -1:, :]) + np.cumsum(
            np.asarray(output[:, :, :2]), axis=1
        )
        np.testing.assert_allclose(np.asarray(gps_pred), manual, atol=1e-5)

    def test_rotate_motion_roundtrip(self, rng):
        cfg = full_config(rotate_motion=True)
        model = Routeformer(cfg, rngs=nnx.Rngs(0, dropout=1))
        model.eval()
        out = model(make_batch(rng))
        assert out.shape == (2, PRED_LEN, 2)
        assert np.isfinite(np.asarray(out)).all()

    def test_autoregressive_matches_shape(self, rng):
        cfg = full_config(autoregressive=True, autoregressive_step_size=10)
        model = Routeformer(cfg, rngs=nnx.Rngs(0, dropout=1))
        model.eval()
        out = model(make_batch(rng))
        assert out.shape == (2, PRED_LEN, 2)
        assert np.isfinite(np.asarray(out)).all()
        # pred_len restored after AR decode
        assert model.gps_backbone.pred_len == PRED_LEN

    def test_jit_forward(self, rng):
        model = Routeformer(full_config(), rngs=nnx.Rngs(0, dropout=1))
        model.eval()
        batch = make_batch(rng)

        @nnx.jit
        def fwd(model, batch):
            return model(batch)

        out = fwd(model, batch)
        assert out.shape == (2, PRED_LEN, 2)


class TestRouteformerFull:
    def test_video_forward(self, rng):
        cfg = full_config(
            video_backbone_config=video_config(), with_video=True,
        )
        model = Routeformer(cfg, video_backbone=SwinV2, rngs=nnx.Rngs(0, dropout=1))
        model.eval()
        out = model(make_batch(rng, with_video=True))
        assert out.shape == (2, PRED_LEN, 2)
        assert np.isfinite(np.asarray(out)).all()

    def test_video_gaze_dense_forward(self, rng):
        cfg = full_config(
            video_backbone_config=video_config(), with_video=True,
            with_gaze=True, dense_prediction=True,
        )
        model = Routeformer(cfg, video_backbone=SwinV2, rngs=nnx.Rngs(0, dropout=1))
        model.eval()
        gps_pred, feat_pred = model(make_batch(rng, with_video=True, with_gaze=True))
        assert gps_pred.shape == (2, PRED_LEN, 2)
        assert feat_pred.shape == (2, PRED_LEN, cfg.image_embedding_size)

    def test_view_dropout_train_changes_output(self, rng):
        cfg = full_config(
            video_backbone_config=video_config(), with_video=True,
            view_dropout=0.9,
        )
        model = Routeformer(cfg, video_backbone=SwinV2, rngs=nnx.Rngs(0, dropout=1))
        model.train()
        batch = make_batch(rng, with_video=True)
        a = np.asarray(model(batch))
        b = np.asarray(model(batch))
        assert not np.array_equal(a, b)

    def test_missing_right_video_falls_back_to_left(self, rng):
        cfg = full_config(video_backbone_config=video_config(), with_video=True)
        model = Routeformer(cfg, video_backbone=SwinV2, rngs=nnx.Rngs(0, dropout=1))
        model.eval()
        batch = make_batch(rng, with_video=True)
        del batch["right_video"]
        out = model(batch)
        assert out.shape == (2, PRED_LEN, 2)

    def test_gradients_flow_but_not_into_frozen_backbone(self, rng):
        cfg = full_config(video_backbone_config=video_config(), with_video=True)
        model = Routeformer(cfg, video_backbone=SwinV2, rngs=nnx.Rngs(0, dropout=1))
        model.eval()
        batch = make_batch(rng, with_video=True)

        def loss_fn(model):
            return (model(batch) ** 2).mean()

        grads = nnx.grad(loss_fn)(model)
        # backbone grads must be zero (frozen via stop_gradient)
        backbone_leaves = jax.tree.leaves(grads.video_backbone)
        assert all(float(jnp.abs(g).max()) == 0.0 for g in backbone_leaves)
        # fusion encoder grads must be nonzero
        fusion_leaves = jax.tree.leaves(grads.video_encoder)
        assert any(float(jnp.abs(g).max()) > 0.0 for g in fusion_leaves)


class TestPrecomputedFeatures:
    """The embedding-cache steady state: pixels swapped for backbone features."""

    def _model(self, tmp_path):
        cfg = full_config(
            video_backbone_config=TimmBackboneConfig(
                model_type="vit_tiny_test", cache_enabled=True,
                cache_dir=str(tmp_path), cache_dtype="float32",
                compute_dtype="float32",
            ),
            with_video=True, with_gaze=True,
        )
        return Routeformer(cfg, video_backbone=SwinV2, rngs=nnx.Rngs(0, dropout=1))

    def test_matches_pixel_path(self, rng, tmp_path):
        from routeformer_tpu.models.video_backbone.cache import (
            VideoFeaturePrecomputer,
        )

        model = self._model(tmp_path)
        model.eval()
        batch = make_batch(rng, with_video=True, with_gaze=True)
        pre = VideoFeaturePrecomputer(model)
        feature_batch = pre(batch)
        assert "left_video" not in feature_batch
        assert "left_video_features" in feature_batch

        out_pixels = np.asarray(model(batch))
        out_features = np.asarray(model(feature_batch))
        np.testing.assert_allclose(out_features, out_pixels, atol=1e-5)

    def test_second_pass_hits_cache(self, rng, tmp_path):
        from routeformer_tpu.models.video_backbone.cache import (
            VideoFeaturePrecomputer,
        )

        model = self._model(tmp_path)
        model.eval()
        batch = make_batch(rng, with_video=True, with_gaze=True)
        pre = VideoFeaturePrecomputer(model)
        first = pre(batch)

        calls = []
        original = pre.backbone._fwd
        pre.backbone._fwd = lambda s, f: (calls.append(f.shape), original(s, f))[1]
        second = pre(batch)
        assert calls == []  # every frame served from cache
        np.testing.assert_allclose(
            second["left_video_features"], first["left_video_features"]
        )

    def test_device_precomputer_matches_host(self, rng, tmp_path):
        from routeformer_tpu.models.video_backbone.cache import (
            DeviceVideoFeaturePrecomputer,
            VideoFeaturePrecomputer,
        )

        model = self._model(tmp_path)
        model.eval()
        batch = make_batch(rng, with_video=True, with_gaze=True)
        host = VideoFeaturePrecomputer(model)
        dev = DeviceVideoFeaturePrecomputer(model, capacity_bytes=50e6)

        host_out = host(batch)
        dev_out = dev(batch)
        assert set(host_out) == set(dev_out)
        for k in host_out:
            if k.endswith("_features"):
                np.testing.assert_allclose(
                    np.asarray(dev_out[k]), np.asarray(host_out[k]),
                    atol=1e-5, err_msg=k,
                )
        stats = dev.stats()
        assert stats["encoded"] > 0

        # a warm pass encodes nothing and returns identical features
        before = dev.stats()["encoded"]
        dev_out2 = dev(batch)
        assert dev.stats()["encoded"] == before
        for k in dev_out:
            if k.endswith("_features"):
                np.testing.assert_array_equal(
                    np.asarray(dev_out2[k]), np.asarray(dev_out[k]),
                )
        # the model consumes the device features identically
        np.testing.assert_allclose(
            np.asarray(model(dev_out)), np.asarray(model(host_out)), atol=1e-5
        )

    def test_device_memo_eviction_stays_exact(self, rng, tmp_path):
        from routeformer_tpu.models.video_backbone.cache import (
            DeviceCachedBackbone,
        )

        model = self._model(tmp_path)
        model.eval()
        backbone = model.video_backbone
        feat_bytes = int(
            np.prod(backbone.output_feature_shape)
        ) * np.dtype(backbone.configs.cache_dtype).itemsize
        frames = rng.random((12, 8, 10, 3)).astype(np.float16)

        big = DeviceCachedBackbone(
            backbone, backbone.configs, capacity_bytes=1000 * feat_bytes
        )
        # capacity floor is 256 slots; stream > capacity unique frames
        small = DeviceCachedBackbone(
            backbone, backbone.configs, capacity_bytes=1 * feat_bytes
        )
        assert small.capacity == 256
        reference = np.asarray(big(frames))
        for start in (0, 4, 8):
            out = np.asarray(small(frames[start : start + 4]))
            np.testing.assert_allclose(
                out, reference[start : start + 4], atol=1e-6
            )

    def test_device_memo_concurrent_calls_stay_exact(self, rng, tmp_path):
        # loader producers (DataLoader(batch_transform=..., producers>1))
        # call the memo concurrently; the per-call lock keeps ring state
        # and the donated feature-store swap consistent
        from multiprocessing.pool import ThreadPool

        from routeformer_tpu.models.video_backbone.cache import (
            DeviceCachedBackbone,
        )

        model = self._model(tmp_path)
        model.eval()
        backbone = model.video_backbone
        frames = rng.random((24, 8, 10, 3)).astype(np.float16)
        serial = DeviceCachedBackbone(backbone, backbone.configs)
        reference = np.asarray(serial(frames))

        memo = DeviceCachedBackbone(backbone, backbone.configs)
        chunks = [(s, frames[s : s + 4]) for s in range(0, 24, 4)]
        with ThreadPool(4) as pool:
            outs = pool.map(lambda c: (c[0], np.asarray(memo(c[1]))), chunks)
        for start, out in outs:
            np.testing.assert_allclose(
                out, reference[start : start + 4], atol=1e-6,
            )
        # warm concurrent pass: no new encodes, identical features
        encoded = memo.frames_encoded
        with ThreadPool(4) as pool:
            outs = pool.map(lambda c: (c[0], np.asarray(memo(c[1]))), chunks)
        assert memo.frames_encoded == encoded
        for start, out in outs:
            np.testing.assert_allclose(
                out, reference[start : start + 4], atol=1e-6,
            )

    def test_device_memo_mixed_call_sizes(self, rng, tmp_path):
        # calls pad to one encode signature per geometry (chunk adoption):
        # smaller calls pad, a larger call adopts a new chunk — features
        # stay exact throughout
        from routeformer_tpu.models.video_backbone.cache import (
            DeviceCachedBackbone,
        )

        model = self._model(tmp_path)
        model.eval()
        backbone = model.video_backbone
        frames = rng.random((16, 8, 10, 3)).astype(np.float16)
        memo = DeviceCachedBackbone(backbone, backbone.configs)
        reference = np.asarray(memo(frames))  # chunk = 16
        fresh = DeviceCachedBackbone(backbone, backbone.configs)
        np.testing.assert_allclose(
            np.asarray(fresh(frames[:5])), reference[:5], atol=1e-6
        )
        assert fresh._chunks[(8, 10, 3)] == 5
        np.testing.assert_allclose(  # pads 3 -> 5, same signature
            np.asarray(fresh(frames[5:8])), reference[5:8], atol=1e-6
        )
        assert fresh._chunks[(8, 10, 3)] == 5
        np.testing.assert_allclose(  # 8 > 5: adopts chunk 8
            np.asarray(fresh(frames[8:16])), reference[8:16], atol=1e-6
        )
        assert fresh._chunks[(8, 10, 3)] == 8


class TestFusionBf16:
    def test_perceive_encoder_bf16_close_to_f32(self, rng):
        x = jnp.asarray(rng.normal(size=(2, 33, 8)).astype(np.float32))
        kw = dict(
            in_channels=8, out_len=16, out_channels=8, n_heads=4,
            layers=2, d_ff=32, dropout=0.0,
        )
        f32 = PerceiveEncoder(**kw, rngs=nnx.Rngs(0, dropout=1))
        bf16 = PerceiveEncoder(**kw, compute_dtype="bfloat16",
                               rngs=nnx.Rngs(0, dropout=1))
        f32.eval(), bf16.eval()
        a, b = np.asarray(f32(x)), np.asarray(bf16(x))
        diff = np.abs(a - b.astype(np.float32))
        scale = max(1.0, float(np.abs(a).max()))
        # bf16 rounding can flip ProbSparse top-u picks (discrete outliers),
        # so bound the mean tightly and the max loosely.
        assert diff.mean() / scale < 0.01
        assert diff.max() / scale < 0.25

    def test_routeformer_bf16_fusion_trains(self, rng):
        cfg = full_config(
            video_backbone_config=video_config(),
            with_video=True, with_gaze=True, compute_dtype="bfloat16",
        )
        model = Routeformer(cfg, video_backbone=SwinV2,
                            rngs=nnx.Rngs(0, dropout=1))
        batch = make_batch(rng, with_video=True, with_gaze=True, B=1)
        model.train()

        def loss_fn(m):
            out = m(batch)
            out = out[0] if isinstance(out, tuple) else out
            return (out.astype(jnp.float32) ** 2).mean()

        loss, grads = nnx.value_and_grad(loss_fn)(model)
        assert np.isfinite(float(loss))
        gmax = max(
            float(jnp.abs(g).max()) for g in jax.tree.leaves(grads)
        )
        assert np.isfinite(gmax)
