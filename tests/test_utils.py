"""Tests for the utility layer: vector ops, median downsampler, config base.

Parity oracles are computed with torch (same ops the reference uses) or
closed-form numpy — never by importing the reference package.
"""

import numpy as np
import jax.numpy as jnp
import pytest
import torch

from routeformer_tpu.utils import (
    BaseConfig,
    estimate_angle,
    estimate_angle_and_norm,
    median_downsampler,
    rotate,
)


class TestRotate:
    def test_rotate_90_degrees(self):
        v = jnp.array([[[1.0, 0.0]]])  # (1, 1, 2)
        out = rotate(v, jnp.array([[np.pi / 2]]))
        np.testing.assert_allclose(np.asarray(out), [[[0.0, 1.0]]], atol=1e-6)

    def test_rotate_roundtrip(self, rng):
        v = jnp.asarray(rng.normal(size=(4, 10, 2)).astype(np.float32))
        a = jnp.asarray(rng.normal(size=(4, 1)).astype(np.float32))
        back = rotate(rotate(v, a), -a)
        np.testing.assert_allclose(np.asarray(back), np.asarray(v), atol=1e-5)

    def test_rotate_preserves_dtype(self, rng):
        v = jnp.asarray(rng.normal(size=(2, 5, 2)).astype(np.float16))
        out = rotate(v, jnp.zeros((2, 1)))
        assert out.dtype == jnp.float16

    def test_rotate_matches_torch_matmul_layout(self, rng):
        """Reference builds R=[[c,-s],[s,c]] and does R @ v^T (vector.py:6-54)."""
        v = rng.normal(size=(3, 7, 2)).astype(np.float32)
        a = rng.normal(size=(3, 1)).astype(np.float32)
        tv = torch.tensor(v).permute(0, 2, 1)
        c, s = torch.cos(torch.tensor(a)).squeeze(-1), torch.sin(torch.tensor(a)).squeeze(-1)
        rot = torch.stack([c, -s, s, c], dim=1).reshape(3, 2, 2)
        expected = torch.matmul(rot, tv).permute(0, 2, 1).numpy()
        out = np.asarray(rotate(jnp.asarray(v), jnp.asarray(a)))
        np.testing.assert_allclose(out, expected, atol=1e-5)


class TestAngleNorm:
    def test_angle(self):
        out = estimate_angle(jnp.array([[0.0, 1.0], [1.0, 0.0], [-1.0, 0.0]]))
        np.testing.assert_allclose(
            np.asarray(out).squeeze(-1), [np.pi / 2, 0.0, np.pi], atol=1e-6
        )

    def test_angle_and_norm_shapes(self, rng):
        v = jnp.asarray(rng.normal(size=(4, 6, 2)).astype(np.float32))
        angle, norm = estimate_angle_and_norm(v)
        assert angle.shape == (4, 6, 1)
        assert norm.shape == (4, 6, 1)
        np.testing.assert_allclose(
            np.asarray(norm).squeeze(-1),
            np.linalg.norm(np.asarray(v), axis=-1),
            atol=1e-6,
        )


class TestMedianDownsampler:
    def test_matches_torch_median(self, rng):
        """torch.median uses the lower median for even windows."""
        x = rng.normal(size=(2, 12, 3)).astype(np.float32)
        target = 5  # stride = 2, drops trailing 2 steps — uneven case
        out = np.asarray(median_downsampler(jnp.asarray(x), target))

        tx = torch.tensor(x)
        stride = 12 // target
        expected = torch.stack(
            [
                tx[:, i * stride : i * stride + stride, :].median(dim=1).values
                for i in range(target)
            ],
            dim=1,
        ).numpy()
        np.testing.assert_allclose(out, expected, atol=1e-7)

    def test_rejects_upsampling(self):
        with pytest.raises(ValueError):
            median_downsampler(jnp.zeros((1, 4, 1)), 4)


class TestBaseConfig:
    def test_override_reruns_post_init(self):
        import dataclasses

        @dataclasses.dataclass
        class C(BaseConfig):
            a: int = 1
            b: int = 0

            def __post_init__(self):
                self.b = self.a * 2

        c = C()
        assert c.b == 2
        c2 = c.override(a=5)
        assert c2.b == 10
        assert c.a == 1  # original untouched

    def test_dict_access_and_get(self):
        cfg = BaseConfig(x=3)
        assert cfg["x"] == 3
        assert cfg.get("missing", 7) == 7
