"""Tests for the photometric train-time augmentation ops."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest
from flax import nnx

from routeformer_tpu.ops.augment import (
    adjust_brightness,
    adjust_contrast,
    adjust_hue,
    adjust_saturation,
    adjust_sharpness,
    autocontrast,
    hsv_to_rgb,
    photometric_augment,
    random_erase,
    rgb_to_hsv,
)


@pytest.fixture
def img(rng):
    return jnp.asarray(rng.uniform(size=(16, 20, 3)).astype(np.float32))


class TestPointOps:
    def test_factor_one_is_identity(self, img):
        for op in (adjust_brightness, adjust_contrast, adjust_saturation,
                   adjust_sharpness):
            np.testing.assert_allclose(np.asarray(op(img, 1.0)), np.asarray(img),
                                       atol=1e-6)

    def test_brightness_zero_blacks_out(self, img):
        assert float(adjust_brightness(img, 0.0).max()) == 0.0

    def test_contrast_zero_is_constant_gray(self, img):
        out = adjust_contrast(img, 0.0)
        assert float(jnp.std(out)) < 1e-5

    def test_saturation_zero_is_grayscale(self, img):
        out = adjust_saturation(img, 0.0)
        np.testing.assert_allclose(
            np.asarray(out[..., 0]), np.asarray(out[..., 1]), atol=1e-6
        )

    def test_hue_zero_is_identity_and_roundtrip(self, img):
        np.testing.assert_allclose(
            np.asarray(adjust_hue(img, 0.0)), np.asarray(img), atol=1e-5
        )
        np.testing.assert_allclose(
            np.asarray(hsv_to_rgb(rgb_to_hsv(img))), np.asarray(img), atol=1e-5
        )

    def test_hue_full_cycle_is_identity(self, img):
        np.testing.assert_allclose(
            np.asarray(adjust_hue(img, 1.0)), np.asarray(img), atol=1e-5
        )

    def test_autocontrast_spans_unit_range(self, img):
        out = autocontrast(img)
        for c in range(3):
            assert float(out[..., c].min()) == pytest.approx(0.0, abs=1e-6)
            assert float(out[..., c].max()) == pytest.approx(1.0, abs=1e-6)

    def test_autocontrast_constant_channel_unchanged(self):
        img = jnp.full((8, 8, 3), 0.25)
        np.testing.assert_allclose(np.asarray(autocontrast(img)), 0.25, atol=1e-6)

    def test_sharpness_preserves_border(self, img):
        out = adjust_sharpness(img, 2.0)
        np.testing.assert_allclose(np.asarray(out[0]), np.asarray(img[0]), atol=1e-6)
        np.testing.assert_allclose(np.asarray(out[-1]), np.asarray(img[-1]), atol=1e-6)
        np.testing.assert_allclose(np.asarray(out[:, 0]), np.asarray(img[:, 0]),
                                   atol=1e-6)
        # interior actually changes for a non-smooth image
        assert float(jnp.abs(out[1:-1, 1:-1] - img[1:-1, 1:-1]).max()) > 1e-4


class TestRandomErase:
    def test_erases_one_rectangle_within_scale(self, img):
        h, w = img.shape[:2]
        base = img + 0.05  # strictly positive so zeros are unambiguous
        out = np.asarray(random_erase(base, jax.random.key(0)))
        zeros = (out == 0.0).all(axis=-1)
        n = int(zeros.sum())
        assert 1 <= n  # something was erased
        # erased area is a full rectangle: bounding box area == count
        rows = np.where(zeros.any(axis=1))[0]
        cols = np.where(zeros.any(axis=0))[0]
        assert n == len(rows) * len(cols)
        assert n <= 0.5 * h * w  # clamped, never the whole frame


class TestPipeline:
    def test_shapes_range_and_determinism(self, rng):
        imgs = jnp.asarray(rng.uniform(size=(4, 16, 20, 3)).astype(np.float32))
        out1 = photometric_augment(imgs, jax.random.key(1))
        out2 = photometric_augment(imgs, jax.random.key(1))
        out3 = photometric_augment(imgs, jax.random.key(2))
        assert out1.shape == imgs.shape
        assert float(out1.min()) >= 0.0 and float(out1.max()) <= 1.0
        np.testing.assert_array_equal(np.asarray(out1), np.asarray(out2))
        assert float(jnp.abs(out1 - out3).max()) > 1e-4

    def test_per_frame_randomness(self, rng):
        # identical frames get different augmentations (per-frame keys)
        frame = rng.uniform(size=(16, 20, 3)).astype(np.float32)
        imgs = jnp.asarray(np.stack([frame, frame]))
        out = photometric_augment(imgs, jax.random.key(3))
        assert float(jnp.abs(out[0] - out[1]).max()) > 1e-4


class TestBackboneIntegration:
    def _backbone(self, train_backbone):
        from routeformer_tpu.models.video_backbone import (
            TimmBackbone,
            TimmBackboneConfig,
        )

        cfg = TimmBackboneConfig(
            model_type="vit_tiny_test", cache_enabled=False,
            compute_dtype="float32", train_backbone=train_backbone,
        )
        return TimmBackbone(cfg, rngs=nnx.Rngs(0, dropout=7))

    def test_train_mode_augments(self, rng):
        x = jnp.asarray(rng.uniform(size=(2, 32, 32, 3)).astype(np.float32))
        model = self._backbone(train_backbone=True)
        model.train()
        out_a = np.asarray(model(x))
        out_b = np.asarray(model(x))  # rng advances -> different augs
        assert np.abs(out_a - out_b).max() > 1e-6

    def test_eval_and_frozen_do_not_augment(self, rng):
        x = jnp.asarray(rng.uniform(size=(2, 32, 32, 3)).astype(np.float32))
        trained = self._backbone(train_backbone=True)
        trained.eval()
        np.testing.assert_array_equal(
            np.asarray(trained(x)), np.asarray(trained(x))
        )
        frozen = self._backbone(train_backbone=False)
        frozen.train()
        np.testing.assert_array_equal(
            np.asarray(frozen(x)), np.asarray(frozen(x))
        )
