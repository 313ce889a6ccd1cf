"""Tests for InverseForm, the embedding cache, and the torch->flax converter."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest
from flax import nnx

from routeformer_tpu.models.video_backbone import (
    InverseForm,
    InverseFormBackboneConfig,
    TimmBackboneConfig,
)
from routeformer_tpu.models.video_backbone.cache import (
    CachedBackbone,
    EmbeddingCache,
    module_content_hash,
)
from routeformer_tpu.models.video_backbone.convert import load_torch_state_dict
from routeformer_tpu.models.video_backbone.vit import TimmBackbone


class TestInverseForm:
    def test_feature_shape(self, rng):
        model = InverseForm(InverseFormBackboneConfig(cache_enabled=False), rngs=nnx.Rngs(0))
        model.eval()
        x = jnp.asarray(rng.uniform(size=(2, 48, 64, 3)).astype(np.float32))
        out = model(x)
        assert out.shape == (2, *model.output_feature_shape)
        assert np.isfinite(np.asarray(out)).all()

    def test_frozen_by_default(self, rng):
        model = InverseForm(InverseFormBackboneConfig(cache_enabled=False), rngs=nnx.Rngs(0))
        model.eval()
        x = jnp.asarray(rng.uniform(size=(1, 32, 32, 3)).astype(np.float32))
        grads = nnx.grad(lambda m: (m(x) ** 2).mean())(model)
        assert all(float(jnp.abs(g).max()) == 0.0 for g in jax.tree.leaves(grads))

    def test_works_in_routeformer(self, rng):
        from routeformer_tpu.models import RouteformerConfig
        from routeformer_tpu.models.gps_backbone import GPSBackboneConfig
        from routeformer_tpu.models.routeformer import Routeformer

        gps_cfg = GPSBackboneConfig(
            seq_len=40, label_len=40, pred_len=30, d_model=16, n_heads=4,
            e_layers=1, d_layers=1, d_ff=32, factor=4, dropout=0.0,
        )
        cfg = RouteformerConfig(
            gps_backbone_config=gps_cfg,
            video_backbone_config=InverseFormBackboneConfig(cache_enabled=False),
            with_video=True, encoder_hidden_size=16, image_embedding_size=16,
            encoder_heads=4, encoder_layers=1, encoder_d_ff=32,
        )
        model = Routeformer(cfg, video_backbone=InverseForm, rngs=nnx.Rngs(0, dropout=1))
        model.eval()
        batch = {
            "gps": jnp.asarray(rng.normal(size=(1, 40, 2)).astype(np.float32)),
            "left_video": jnp.asarray(
                rng.uniform(size=(1, 40, 24, 32, 3)).astype(np.float32)
            ),
        }
        out = model(batch)
        assert out.shape == (1, 30, 2)


class TestEmbeddingCache:
    def test_hit_avoids_recompute(self, rng):
        cache = EmbeddingCache(module_hash="m1", max_memory_bytes=1e9)
        frames = rng.uniform(size=(4, 8, 8, 3)).astype(np.float32)
        calls = []

        def compute(missing):
            calls.append(missing.shape[0])
            return missing.mean(axis=(1, 2))

        out1 = cache.get_or_compute(frames, compute)
        out2 = cache.get_or_compute(frames, compute)
        np.testing.assert_allclose(out1, out2)
        assert calls == [4]  # second call fully cached

    def test_partial_miss(self, rng):
        cache = EmbeddingCache(module_hash="m1")
        a = rng.uniform(size=(2, 4, 4, 3)).astype(np.float32)
        b = rng.uniform(size=(2, 4, 4, 3)).astype(np.float32)
        calls = []

        def compute(missing):
            calls.append(missing.shape[0])
            return missing.mean(axis=(1, 2))

        cache.get_or_compute(a, compute)
        cache.get_or_compute(np.concatenate([a, b]), compute)
        assert calls == [2, 2]  # only b recomputed

    def test_disk_tier(self, tmp_path, rng):
        frames = rng.uniform(size=(2, 4, 4, 3)).astype(np.float32)

        def compute(missing):
            return missing.mean(axis=(1, 2))

        c1 = EmbeddingCache(cache_dir=tmp_path, module_hash="mh")
        out1 = c1.get_or_compute(frames, compute)
        # new instance, cold RAM, warm disk
        c2 = EmbeddingCache(cache_dir=tmp_path, module_hash="mh")
        calls = []
        out2 = c2.get_or_compute(frames, lambda m: calls.append(1) or compute(m))
        np.testing.assert_allclose(out1, np.asarray(out2, dtype=np.float32), atol=1e-2)
        assert not calls

    def test_concurrent_producers_consistent(self, rng):
        """Pipelined loader producers (io/loader.py producers>1) hit the
        host cache from multiple threads: results must stay correct and
        the RAM-tier byte accounting exact (it drives eviction)."""
        import threading

        cache = EmbeddingCache(module_hash="m1", max_memory_bytes=1e9)
        pool = rng.uniform(size=(16, 4, 4, 3)).astype(np.float32)

        def compute(missing):
            return missing.mean(axis=(1, 2))

        expected = pool.mean(axis=(1, 2)).astype(np.dtype("bfloat16"))
        errors = []

        def worker(seed):
            r = np.random.default_rng(seed)
            for _ in range(20):
                idx = r.integers(0, 16, size=4)
                out = cache.get_or_compute(pool[idx], compute)
                if not np.allclose(
                    np.asarray(out, np.float32),
                    np.asarray(expected[idx], np.float32),
                    atol=1e-2,
                ):
                    errors.append(idx)

        threads = [threading.Thread(target=worker, args=(s,)) for s in range(4)]
        for t in threads:
            t.start()
        for t in threads:
            t.join()
        assert not errors
        # exactly 16 unique frames cached; accounting matches contents
        assert len(cache._memory) == 16
        assert cache.memory_bytes == sum(
            v.nbytes for v in cache._memory.values()
        )

    def test_cached_backbone_wrapper(self, rng):
        cfg = TimmBackboneConfig(model_type="vit_tiny_test", cache_enabled=True)
        backbone = TimmBackbone(cfg, rngs=nnx.Rngs(0))
        backbone.eval()
        wrapped = CachedBackbone(backbone, cfg)
        frames = rng.uniform(size=(2, 32, 32, 3)).astype(np.float32)
        out1 = wrapped(frames)
        out2 = wrapped(frames)
        assert out1.shape == (2, *backbone.output_feature_shape)
        np.testing.assert_allclose(out1, out2)


class TestConverter:
    def test_linear_and_conv_transposition(self, rng):
        class Tiny(nnx.Module):
            def __init__(self, *, rngs):
                self.dense = nnx.Linear(4, 8, rngs=rngs)
                self.conv = nnx.Conv(3, 6, kernel_size=(3, 3), rngs=rngs)

        m = Tiny(rngs=nnx.Rngs(0))
        sd = {
            "dense.weight": rng.normal(size=(8, 4)).astype(np.float32),
            "dense.bias": rng.normal(size=(8,)).astype(np.float32),
            "conv.weight": rng.normal(size=(6, 3, 3, 3)).astype(np.float32),
            "conv.bias": rng.normal(size=(6,)).astype(np.float32),
        }
        loaded, total = load_torch_state_dict(m, sd)
        assert loaded == total == 4
        np.testing.assert_allclose(np.asarray(m.dense.kernel[...]), sd["dense.weight"].T)
        np.testing.assert_allclose(
            np.asarray(m.conv.kernel[...]), sd["conv.weight"].transpose(2, 3, 1, 0)
        )

    def test_fuzzy_prefix_match(self, rng):
        class Tiny(nnx.Module):
            def __init__(self, *, rngs):
                self.dense = nnx.Linear(4, 8, rngs=rngs)

        m = Tiny(rngs=nnx.Rngs(0))
        sd = {"model.backbone.dense.weight": rng.normal(size=(8, 4)).astype(np.float32)}
        loaded, _ = load_torch_state_dict(m, sd, fuzzy=True)
        assert loaded == 1
