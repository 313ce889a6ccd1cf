"""Tests for the baseline zoo: AutoBot, AdaptedGIMO, MultiModalTransformer."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest
from flax import nnx

from routeformer_tpu.baselines import (
    AdaptedGIMO,
    AutoBotAdapted,
    MultiModalTransformer,
)
from routeformer_tpu.io.synthetic import synthetic_batch
from routeformer_tpu.models import RouteformerConfig
from routeformer_tpu.models.gps_backbone import GPSBackboneConfig
from routeformer_tpu.models.video_backbone import SwinV2, TimmBackboneConfig

SEQ, PRED = 40, 30


@pytest.fixture(scope="module")
def config():
    gps_cfg = GPSBackboneConfig(
        seq_len=SEQ, label_len=SEQ, pred_len=PRED,
        d_model=32, n_heads=4, e_layers=1, d_layers=1, d_ff=64,
        factor=4, dropout=0.0, activation="relu",
    )
    return RouteformerConfig(
        gps_backbone_config=gps_cfg,
        video_backbone_config=TimmBackboneConfig(
            model_type="vit_tiny_test", cache_enabled=False
        ),
        with_video=True,
        with_gaze=True,
        encoder_hidden_size=16,
        image_embedding_size=16,
        encoder_heads=4,
        encoder_layers=1,
        encoder_d_ff=32,
        feature_dropout=0.0,
    )


@pytest.fixture(scope="module")
def batch():
    data = synthetic_batch(
        0, batch_size=2, seq_len=SEQ, pred_len=PRED,
        with_video=True, with_gaze=True, frame_hw=(24, 32),
    )
    return jax.tree.map(jnp.asarray, data["train"])


class TestAutoBot:
    def test_forward_shape_and_cumsum(self, config, batch):
        model = AutoBotAdapted(config, rngs=nnx.Rngs(0, dropout=1))
        model.eval()
        out = model({"gps": batch["gps"]})
        assert out.shape == (2, PRED, 2)
        assert np.isfinite(np.asarray(out)).all()

    def test_mode_probs_sum_to_one(self, config, batch):
        model = AutoBotAdapted(config, rngs=nnx.Rngs(0, dropout=1))
        model.eval()
        gps = batch["gps"].astype(jnp.float32)
        motions = jnp.pad(gps[:, 1:] - gps[:, :-1], ((0, 0), (1, 0), (0, 0)))
        motions = jnp.concatenate([motions, jnp.ones_like(motions[:, :, :1])], axis=2)
        dists, probs = model.model(motions)
        assert dists.shape == (5, PRED, 2, 5)
        np.testing.assert_allclose(np.asarray(probs.sum(-1)), 1.0, atol=1e-5)
        # sigmas positive, rho within (-0.9, 0.9)
        assert (np.asarray(dists[..., 2:4]) > 0).all()
        assert (np.abs(np.asarray(dists[..., 4])) <= 0.9).all()

    def test_grads(self, config, batch):
        model = AutoBotAdapted(config, rngs=nnx.Rngs(0, dropout=1))
        model.eval()
        gps = {"gps": batch["gps"]}

        grads = nnx.grad(lambda m: (m(gps) ** 2).mean())(model)
        leaves = jax.tree.leaves(grads)
        assert all(np.isfinite(np.asarray(g)).all() for g in leaves)


class TestGIMO:
    def test_forward_shape(self, config, batch):
        model = AdaptedGIMO(config, video_backbone=SwinV2, rngs=nnx.Rngs(0, dropout=1))
        model.eval()
        out = model(batch)
        assert out.shape == (2, PRED, 2)
        assert np.isfinite(np.asarray(out)).all()

    def test_prediction_starts_near_last_fix(self, config, batch):
        """cumsum integration: first prediction = last fix + one velocity."""
        model = AdaptedGIMO(config, video_backbone=SwinV2, rngs=nnx.Rngs(0, dropout=1))
        model.eval()
        out = np.asarray(model(batch))
        last = np.asarray(batch["gps"][:, -1])
        # untrained velocities are small-ish; prediction anchored to last fix
        assert np.abs(out[:, 0] - last).max() < 50.0


class TestMultiModalTransformer:
    def test_forward_shape(self, config, batch):
        model = MultiModalTransformer(
            config, video_backbone=SwinV2, rngs=nnx.Rngs(0, dropout=1)
        )
        model.eval()
        out = model(batch)
        assert out.shape == (2, PRED, 2)
        assert np.isfinite(np.asarray(out)).all()

    def test_missing_right_video(self, config, batch):
        model = MultiModalTransformer(
            config, video_backbone=SwinV2, rngs=nnx.Rngs(0, dropout=1)
        )
        model.eval()
        b = dict(batch)
        del b["right_video"]
        assert model(b).shape == (2, PRED, 2)
