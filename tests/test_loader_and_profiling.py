"""Tests for the prefetching DataLoader, profiling utils, and video split."""

import time

import numpy as np
import pytest

from routeformer_tpu.io.loader import DataLoader, default_collate
from routeformer_tpu.train.trainer import maybe_split_video
from routeformer_tpu.utils.profiling import TimeIt, reset_timing, time_it, timing_summary


class ListDataset:
    def __init__(self, n, delay=0.0):
        self.n = n
        self.delay = delay

    def __len__(self):
        return self.n

    def __getitem__(self, i):
        if self.delay:
            time.sleep(self.delay)
        return {
            "train": {"gps": np.full((4, 2), float(i), dtype=np.float32)},
            "pci": np.float32(i),
        }


class TestDataLoader:
    def test_batching_and_collation(self):
        loader = DataLoader(ListDataset(10), batch_size=4, shuffle=False)
        batches = list(loader)
        assert len(batches) == 2  # drop_last
        assert batches[0]["train"]["gps"].shape == (4, 4, 2)
        np.testing.assert_allclose(batches[0]["pci"], [0, 1, 2, 3])

    def test_shuffle_reproducible_per_epoch(self):
        loader = DataLoader(ListDataset(16), batch_size=4, shuffle=True, seed=7)
        e0_a = [b["pci"].tolist() for b in loader]
        e0_b = [b["pci"].tolist() for b in loader]
        assert e0_a == e0_b
        loader.set_epoch(1)
        e1 = [b["pci"].tolist() for b in loader]
        assert e1 != e0_a

    def test_process_sharding(self):
        seen = set()
        for rank in range(2):
            loader = DataLoader(
                ListDataset(8), batch_size=2, process_index=rank, process_count=2
            )
            for b in loader:
                seen.update(b["pci"].tolist())
        assert seen == set(range(8))

    def test_prefetch_overlaps(self):
        """With prefetch, consuming slowly should not serialize production."""
        loader = DataLoader(
            ListDataset(8, delay=0.02), batch_size=2, num_threads=4, prefetch=2
        )
        t0 = time.time()
        for _ in loader:
            time.sleep(0.03)
        elapsed = time.time() - t0
        # fully serialized would be ~4*(2*0.02/4thr + 0.03) + ...; just check
        # it terminates and is reasonably fast
        assert elapsed < 1.0

    def test_to_device_batches(self):
        import jax

        from routeformer_tpu.io.loader import DataLoader

        loader = DataLoader(
            ListDataset(8), batch_size=4, to_device=True, num_threads=2
        )
        batches = list(loader)
        assert len(batches) == 2
        for b in batches:
            for leaf in jax.tree.leaves(b):
                assert isinstance(leaf, jax.Array)

    def test_error_propagation(self):
        class Bad(ListDataset):
            def __getitem__(self, i):
                raise RuntimeError("boom")

        loader = DataLoader(Bad(4), batch_size=2)
        with pytest.raises(RuntimeError, match="boom"):
            list(loader)

    def test_batch_transform_runs_in_pipeline(self):
        calls = []

        def tf(batch):
            calls.append(float(batch["pci"][0]))
            out = dict(batch)
            out["doubled"] = batch["pci"] * 2
            return out

        loader = DataLoader(
            ListDataset(8), batch_size=2, batch_transform=tf
        )
        batches = list(loader)
        assert len(batches) == 4 == len(calls)
        np.testing.assert_allclose(batches[1]["doubled"], [4.0, 6.0])

    def test_multi_producer_order_and_bytes_match_serial(self):
        def tf(batch):
            time.sleep(0.01)  # make pipelining observable / racy if broken
            out = dict(batch)
            out["sum"] = batch["train"]["gps"].sum()
            return out

        serial = list(
            DataLoader(ListDataset(12), batch_size=2, batch_transform=tf)
        )
        piped = list(
            DataLoader(
                ListDataset(12), batch_size=2, batch_transform=tf,
                producers=3, prefetch=3,
            )
        )
        assert len(serial) == len(piped)
        for a, b in zip(serial, piped):
            np.testing.assert_array_equal(a["pci"], b["pci"])
            np.testing.assert_array_equal(a["sum"], b["sum"])
            np.testing.assert_array_equal(
                a["train"]["gps"], b["train"]["gps"]
            )

    def test_multi_producer_bounded_runahead(self):
        """Pipelined producers must not run arbitrarily far ahead of the
        consumer: in-flight prepared batches are bounded by
        producers + 2*prefetch + 1 (apply_async submission bound + out_q
        + the batch being consumed). The earlier imap-based stage prepared
        the WHOLE epoch ahead of a slow consumer."""
        import threading

        prepared = 0
        lock = threading.Lock()

        def tf(b):
            nonlocal prepared
            with lock:
                prepared += 1
            return b

        n_producers, prefetch = 2, 2
        loader = DataLoader(
            ListDataset(64),
            batch_size=2,
            batch_transform=tf,
            producers=n_producers,
            prefetch=prefetch,
        )
        consumed = 0
        max_ahead = 0
        for _ in loader:
            time.sleep(0.005)  # slow consumer: producers race ahead
            consumed += 1
            max_ahead = max(max_ahead, prepared - consumed)
        assert consumed == 32
        assert max_ahead <= n_producers + 2 * prefetch + 1

    def test_multi_producer_ok_with_inert_dedup(self):
        """h2d_dedup without to_device is inert (no frame router exists);
        the constructor must validate against the EFFECTIVE flag and
        accept pipelined producers."""
        loader = DataLoader(
            ListDataset(8),
            batch_size=2,
            producers=2,
            h2d_dedup=True,
            to_device=False,
        )
        assert len(list(loader)) == 4

    def test_multi_producer_transform_error_propagates(self):
        def tf(batch):
            if float(batch["pci"][0]) >= 4:
                raise ValueError("stage boom")
            return batch

        loader = DataLoader(
            ListDataset(8), batch_size=2, batch_transform=tf, producers=2
        )
        with pytest.raises(ValueError, match="stage boom"):
            list(loader)

    def test_multi_producer_rejects_h2d_dedup(self):
        with pytest.raises(ValueError, match="producers"):
            DataLoader(
                ListDataset(8), batch_size=2, producers=2,
                to_device=True, h2d_dedup=True,
            )

    def test_set_batch_stage_post_construction(self):
        # the driver attaches the prepare stage after loaders are built
        loader = DataLoader(ListDataset(8), batch_size=2)

        def tf(batch):
            out = dict(batch)
            out["tagged"] = batch["pci"] + 100
            return out

        loader.set_batch_stage(tf, producers=2)
        batches = list(loader)
        assert all("tagged" in b for b in batches)
        np.testing.assert_allclose(batches[0]["tagged"], [100.0, 101.0])
        # re-validation applies to the configured loader state too
        dedup = DataLoader(
            ListDataset(8), batch_size=2, to_device=True, h2d_dedup=True
        )
        with pytest.raises(ValueError, match="producers"):
            dedup.set_batch_stage(tf, producers=2)
        dedup.set_batch_stage(tf, producers=1)  # one producer is fine


class TestSampleCacheThreadSafety:
    def test_concurrent_fetch_no_selfheal(self, tmp_path):
        """zstd contexts must be thread-local: sharing one decompressor
        across the DataLoader's thread pool corrupted streams, which the
        self-heal path silently turned into full recomputes (and
        occasionally segfaults)."""
        from multiprocessing.pool import ThreadPool

        from routeformer_tpu.io.cache import SampleCache

        cache = SampleCache(tmp_path / "c")
        payloads = {
            f"item{i}": np.arange(i, i + 50000, dtype=np.float32)
            for i in range(32)
        }
        for k, v in payloads.items():
            assert cache.push(k, v)

        def fetch(k):
            out = cache.fetch(k)
            assert out is not None, f"cache miss (self-heal) for {k}"
            return k, out

        for _ in range(3):  # repeat: corruption was probabilistic
            with ThreadPool(8) as pool:
                results = pool.map(fetch, list(payloads) * 4)
            for k, out in results:
                np.testing.assert_array_equal(out, payloads[k])


class TestProfiling:
    def test_time_it_and_summary(self):
        reset_timing()

        @time_it
        def slow():
            time.sleep(0.01)

        slow()
        slow()
        with TimeIt("manual"):
            time.sleep(0.005)
        summary = timing_summary()
        assert summary["TestProfiling.test_time_it_and_summary.<locals>.slow"]["count"] == 2
        assert summary["manual"]["count"] == 1
        assert summary["manual"]["mean"] >= 0.005


class TestMaybeSplitVideo:
    def test_splits_left_into_halves(self, rng):
        batch = {
            "train": {
                "left_video": rng.uniform(size=(2, 4, 8, 10, 3)).astype(np.float32)
            },
            "target": {
                "left_video": rng.uniform(size=(2, 3, 8, 10, 3)).astype(np.float32)
            },
        }
        full = batch["train"]["left_video"].copy()
        out = maybe_split_video(batch)
        assert out["train"]["left_video"].shape[3] == 5
        assert out["train"]["right_video"].shape[3] == 5
        np.testing.assert_array_equal(out["train"]["right_video"], full[:, :, :, 5:])

    def test_noop_when_right_exists(self, rng):
        v = rng.uniform(size=(1, 2, 4, 6, 3)).astype(np.float32)
        batch = {"train": {"left_video": v, "right_video": v}}
        out = maybe_split_video(batch)
        assert out["train"]["left_video"].shape[3] == 6
