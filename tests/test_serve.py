"""Tests for the StableHLO serving export (routeformer_tpu/serve.py)."""

import numpy as np
import jax.numpy as jnp
import pytest
from flax import nnx

from routeformer_tpu.models import RouteformerConfig
from routeformer_tpu.models.gps_backbone import GPSBackboneConfig, Informer
from routeformer_tpu.models.routeformer import Routeformer
from routeformer_tpu.serve import (
    ExportedModel,
    export_model,
    load_serving_bundle,
    save_serving_bundle,
)

SEQ_LEN, PRED_LEN = 40, 30


def make_model(seed=0):
    gps_cfg = GPSBackboneConfig(
        seq_len=SEQ_LEN, label_len=SEQ_LEN, pred_len=PRED_LEN,
        d_model=16, n_heads=4, e_layers=1, d_layers=1, d_ff=32,
        factor=4, dropout=0.1, activation="relu",
    )
    cfg = RouteformerConfig(
        gps_backbone_config=gps_cfg, discount_factor={0: 0.97}, epsilon=1.0
    )
    return Routeformer(
        cfg, gps_backbone=Informer, rngs=nnx.Rngs(seed, dropout=seed + 1)
    )


def make_batch(rng, B=2):
    return {"gps": jnp.asarray(rng.normal(size=(B, SEQ_LEN, 2)).astype(np.float32))}


class TestExport:
    def test_export_matches_live_model(self, rng):
        model = make_model()
        batch = make_batch(rng)
        model.eval()
        expected = np.asarray(model(batch))

        import jax
        from routeformer_tpu.serve import _eval_forward

        data = export_model(make_model(), batch)
        assert isinstance(data, bytes) and len(data) > 1000
        _, leaves = _eval_forward(make_model())
        served = ExportedModel(data, leaves)
        np.testing.assert_allclose(
            np.asarray(served(batch)), expected, atol=1e-5
        )

    def test_bundle_roundtrip(self, rng, tmp_path):
        model = make_model(seed=3)
        batch = make_batch(rng)
        model.eval()
        expected = np.asarray(model(batch))

        save_serving_bundle(tmp_path / "bundle", model, batch)
        served = load_serving_bundle(tmp_path / "bundle", make_model(seed=99))
        np.testing.assert_allclose(
            np.asarray(served(batch)), expected, atol=1e-5
        )

    def test_exported_rejects_wrong_shape(self, rng, tmp_path):
        model = make_model()
        batch = make_batch(rng, B=2)
        save_serving_bundle(tmp_path / "b", model, batch)
        served = load_serving_bundle(tmp_path / "b", make_model())
        bad = {"gps": jnp.zeros((3, SEQ_LEN, 2), jnp.float32)}
        with pytest.raises(Exception):
            served(bad)


class TestUint8Serving:
    def test_export_with_uint8_video_batch(self, rng, tmp_path):
        """The uint8 wire format serves: the exported program captures the
        u8 signature and dequantizes on-device (backbone preprocess)."""
        from routeformer_tpu.models.video_backbone import (
            TimmBackbone,
            TimmBackboneConfig,
        )

        gps_cfg = GPSBackboneConfig(
            seq_len=SEQ_LEN, label_len=SEQ_LEN, pred_len=PRED_LEN,
            d_model=16, n_heads=4, e_layers=1, d_layers=1, d_ff=32,
            factor=4, dropout=0.0, activation="relu",
        )
        cfg = RouteformerConfig(
            gps_backbone_config=gps_cfg,
            video_backbone_config=TimmBackboneConfig(
                model_type="vit_tiny_test", cache_enabled=False,
                compute_dtype="float32",
            ),
            decoder_mode="smart", with_video=True, with_gaze=False,
            discount_factor={0: 0.97}, epsilon=1.0,
            image_embedding_size=16, encoder_hidden_size=16,
            encoder_heads=4, encoder_layers=1, encoder_d_ff=32,
            cross_modal_decoder_heads=4, cross_modal_decoder_layers=1,
            output_fps=5, video_fps=1, gaze_fps=1,
        )
        model = Routeformer(
            cfg, gps_backbone=Informer, video_backbone=TimmBackbone,
            rngs=nnx.Rngs(0, dropout=1),
        )
        model.eval()

        u8 = rng.integers(0, 256, (2, SEQ_LEN, 8, 12, 3)).astype(np.uint8)
        batch_u8 = {
            "gps": jnp.asarray(rng.normal(size=(2, SEQ_LEN, 2)).astype(np.float32)),
            "left_video": jnp.asarray(u8),
        }
        batch_f16 = dict(batch_u8, left_video=jnp.asarray(
            u8.astype(np.float16) / 255.0
        ))
        expected = np.asarray(model(batch_f16))
        # distinct compiled programs (u8 vs f16 signature) fuse
        # differently; divergence is fusion-level f32 rounding only
        np.testing.assert_allclose(
            np.asarray(model(batch_u8)), expected, atol=1e-3, rtol=1e-4
        )

        save_serving_bundle(tmp_path / "bundle", model, batch_u8)
        served = load_serving_bundle(
            tmp_path / "bundle",
            Routeformer(cfg, gps_backbone=Informer,
                        video_backbone=TimmBackbone,
                        rngs=nnx.Rngs(9, dropout=10)),
        )
        np.testing.assert_allclose(
            np.asarray(served(batch_u8)), expected, atol=1e-3, rtol=1e-4
        )
