"""Device frame store: content-dedup H2D with on-device window gather."""

import numpy as np
import pytest

from routeformer_tpu.io.frame_store import DeviceFrameStore, FrameStoreRouter
from routeformer_tpu.io.loader import DataLoader


def windows_from_frames(frames: np.ndarray, starts, length):
    """Overlapping (B, T, ...) windows over a (N, ...) frame sequence."""
    return np.stack([frames[s : s + length] for s in starts])


class TestDeviceFrameStore:
    @pytest.mark.parametrize("dtype", [np.uint8, np.float16])
    def test_roundtrip_exact(self, dtype, rng):
        if dtype == np.uint8:
            frames = rng.integers(0, 256, (20, 8, 6, 3)).astype(np.uint8)
        else:
            frames = rng.random((20, 8, 6, 3)).astype(np.float16)
        win = windows_from_frames(frames, [0, 2, 4, 6], 10)
        store = DeviceFrameStore(frames.shape[1:], dtype, capacity=64)
        out = np.asarray(store.put_windows(win))
        np.testing.assert_array_equal(out, win)
        assert out.dtype == dtype

    def test_overlap_ships_each_frame_once(self, rng):
        frames = rng.integers(0, 256, (30, 8, 6, 3)).astype(np.uint8)
        win = windows_from_frames(frames, [0, 2, 4, 6, 8], 10)
        store = DeviceFrameStore(frames.shape[1:], np.uint8, capacity=64)
        out = np.asarray(store.put_windows(win))
        np.testing.assert_array_equal(out, win)
        assert store.frames_seen == 50
        assert store.frames_shipped == 18  # frames 0..17, each once

        # the next step's windows extend the sequence: only the tail ships
        win2 = windows_from_frames(frames, [10, 12], 10)
        out2 = np.asarray(store.put_windows(win2))
        np.testing.assert_array_equal(out2, win2)
        assert store.frames_shipped == 22  # +frames 18..21

        # a repeat epoch ships nothing
        before = store.frames_shipped
        out3 = np.asarray(store.put_windows(win))
        np.testing.assert_array_equal(out3, win)
        assert store.frames_shipped == before

    def test_duplicate_frames_within_batch(self, rng):
        frame = rng.integers(0, 256, (4, 4, 3)).astype(np.uint8)
        win = np.stack([np.stack([frame, frame, frame])] * 2)  # (2, 3, ...)
        store = DeviceFrameStore(frame.shape, np.uint8, capacity=8)
        out = np.asarray(store.put_windows(win))
        np.testing.assert_array_equal(out, win)
        assert store.frames_shipped == 1

    def test_eviction_ring_stays_exact(self, rng):
        frames = rng.integers(0, 256, (40, 4, 4, 3)).astype(np.uint8)
        store = DeviceFrameStore(frames.shape[1:], np.uint8, capacity=12)
        # stream far more unique frames than capacity, repeatedly
        for start in range(0, 36, 2):
            win = windows_from_frames(frames, [start], 4)
            out = np.asarray(store.put_windows(win))
            np.testing.assert_array_equal(out, win)
        # revisiting evicted frames re-ships but stays exact
        win = windows_from_frames(frames, [0, 1], 4)
        out = np.asarray(store.put_windows(win))
        np.testing.assert_array_equal(out, win)

    def test_batch_larger_than_capacity_raises(self, rng):
        frames = rng.integers(0, 256, (10, 4, 4, 3)).astype(np.uint8)
        store = DeviceFrameStore(frames.shape[1:], np.uint8, capacity=4)
        win = windows_from_frames(frames, [0], 10)
        with pytest.raises(RuntimeError, match="capacity"):
            store.put_windows(win)


class TestFrameStoreRouter:
    def test_streams_isolated_but_phases_shared(self, rng):
        router = FrameStoreRouter(budget_bytes=10e6)
        a = rng.integers(0, 256, (2, 5, 6, 6, 3)).astype(np.uint8)
        b = rng.integers(0, 256, (2, 3, 6, 6, 3)).astype(np.uint8)
        np.testing.assert_array_equal(np.asarray(router.put("left_video", a)), a)
        # same stream name, different T: shares the store (frame shape key)
        np.testing.assert_array_equal(np.asarray(router.put("left_video", b)), b)
        assert len(router._stores) == 1
        # different geometry gets its own store
        c = rng.integers(0, 256, (2, 3, 4, 4, 3)).astype(np.uint8)
        np.testing.assert_array_equal(np.asarray(router.put("front_video", c)), c)
        assert len(router._stores) == 2
        assert set(router.stats()) == {
            "left_video(6, 6, 3)", "front_video(4, 4, 3)"
        }

    def test_min_capacity_override(self, rng):
        # a tiny budget still holds two batches' worth of frames
        router = FrameStoreRouter(budget_bytes=1)
        v = rng.integers(0, 256, (2, 4, 6, 6, 3)).astype(np.uint8)
        np.testing.assert_array_equal(np.asarray(router.put("left_video", v)), v)
        (store,) = router._stores.values()
        assert store.capacity == 2 * 2 * 4


class _WindowedSamples:
    """Per-sample dataset of overlapping windows over one frame sequence —
    the GEM access pattern the store is built for."""

    def __init__(self, n=6, t_in=8, t_tgt=4, hw=(8, 12), seed=3):
        rng = np.random.default_rng(seed)
        h, w = hw
        n_frames = 2 * n + t_in + t_tgt
        self.frames = rng.integers(0, 256, (n_frames, h, w, 3)).astype(np.uint8)
        self.t_in, self.t_tgt, self.n = t_in, t_tgt, n

    def __len__(self):
        return self.n

    def __getitem__(self, i):
        s = 2 * i
        win = self.frames[s : s + self.t_in + self.t_tgt]
        return {
            "train": {
                "left_video": win[: self.t_in],
                "gps": np.linspace(i, i + 1, self.t_in * 2)
                .reshape(self.t_in, 2).astype(np.float32),
            },
            "target": {
                "left_video": win[self.t_in :],
                "gps": np.zeros((self.t_tgt, 2), np.float32),
            },
            "pci": np.float32(i),
        }


class TestLoaderDedup:
    def _loaders(self, **kw):
        ds = _WindowedSamples()
        return (
            DataLoader(ds, batch_size=2, shuffle=False, **kw),
            DataLoader(ds, batch_size=2, shuffle=False),
        )

    def test_matches_plain_loader_two_epochs(self):
        dedup, plain = self._loaders(
            to_device=True, h2d_dedup=True, dedup_budget_bytes=50e6
        )
        for epoch in range(2):
            dedup.set_epoch(epoch)
            plain.set_epoch(epoch)
            for db, pb in zip(dedup, plain):
                for phase in ("train", "target"):
                    for k in pb[phase]:
                        np.testing.assert_array_equal(
                            np.asarray(db[phase][k]), pb[phase][k],
                            err_msg=f"epoch{epoch} {phase}/{k}",
                        )
        # epoch 2 re-served everything from the device store
        stats = dedup._frame_router.stats()
        assert stats
        for name, s in stats.items():
            assert s["shipped"] <= s["seen"] // 2, (name, s)

    def test_dedup_requires_to_device(self):
        loader, _ = self._loaders(h2d_dedup=True)  # to_device defaults False
        assert loader._frame_router is None


class TestTrainerIntegration:
    def test_training_step_on_store_gathered_batch(self):
        """A trainer step on frame-store-assembled device batches matches
        the same step on plain host batches (the dedup DataLoader path)."""
        import jax.numpy as jnp

        from tests.test_trainer import TestUint8WireFormat

        u8_batch, _ = TestUint8WireFormat._batch_pair()
        router = FrameStoreRouter(budget_bytes=100e6)

        def place(d):
            return {
                k: (
                    router.put(k, v)
                    if "video" in k and getattr(v, "ndim", 0) == 5
                    else jnp.asarray(v)
                )
                for k, v in d.items()
            }

        stored_batch = {
            "train": place(u8_batch["train"]),
            "target": place(u8_batch["target"]),
        }

        t_plain = TestUint8WireFormat._make_trainer()
        t_store = TestUint8WireFormat._make_trainer()
        m_plain = t_plain.training_step(u8_batch)
        m_store = t_store.training_step(stored_batch)
        np.testing.assert_allclose(
            float(m_store["train_total_loss"]),
            float(m_plain["train_total_loss"]), rtol=1e-6,
        )
