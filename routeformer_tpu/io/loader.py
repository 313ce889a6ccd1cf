"""Streaming batch loader with background prefetch.

Replaces the reference's ``torch.utils.data.DataLoader`` wiring
(``experiments/full_comparison.py:761-770``: worker processes,
persistent workers, per-rank partitioning) with a TPU-appropriate design:

- sample assembly happens in a thread pool (the heavy lifting — decode,
  undistort, resize — already releases the GIL inside cv2/XLA);
- assembled batches are prefetched into a bounded queue so host IO overlaps
  device compute;
- per-host sharding for multi-process SPMD: each process reads its
  ``process_index``-strided subset (the DataLoader-worker-per-rank
  equivalent over jax process indices).
"""

import queue
import threading
from typing import Callable, Iterator, Optional, Sequence

import numpy as np

from routeformer_tpu.utils.logging import get_logger

logger = get_logger("io.loader")


def _mesh_put(mesh, x: np.ndarray):
    """Leaf -> global array sharded on the leading dim over the mesh's
    ``data`` axis (replicated when 0-D) — the trainer's batch layout
    (single rule source: parallel.mesh.place_batch_leaf)."""
    from routeformer_tpu.parallel.mesh import place_batch_leaf

    return place_batch_leaf(x, mesh)


def default_collate(samples: Sequence[dict]) -> dict:
    """Stack a list of sample dicts into one batch dict (nested)."""
    first = samples[0]
    out = {}
    for key, value in first.items():
        if isinstance(value, dict):
            out[key] = default_collate([s[key] for s in samples])
        elif isinstance(value, np.ndarray):
            out[key] = np.stack([s[key] for s in samples])
        else:
            out[key] = np.asarray([s[key] for s in samples])
    return out


class DataLoader:
    """Prefetching batch iterator over an indexable dataset."""

    def __init__(
        self,
        dataset,
        batch_size: int = 16,
        shuffle: bool = False,
        seed: int = 0,
        drop_last: bool = True,
        num_threads: int = 8,
        prefetch: int = 2,
        collate_fn: Optional[Callable] = None,
        batch_transform: Optional[Callable] = None,
        producers: int = 1,
        process_index: int = 0,
        process_count: int = 1,
        to_device: bool = False,
        h2d_dedup: bool = False,
        dedup_budget_bytes: float = 512e6,
        mesh=None,
    ):
        self.dataset = dataset
        self.batch_size = batch_size
        self.shuffle = shuffle
        self.seed = seed
        self.drop_last = drop_last
        self.num_threads = num_threads
        self.prefetch = prefetch
        self.collate = collate_fn or default_collate
        # Host-side batch stage run INSIDE the prefetch pipeline (the
        # tf.data-map role): feature-memo lookups, device placement, any
        # per-batch host work overlaps the consumer's step instead of
        # serializing with it. With ``producers > 1``, that stage is
        # pipelined across batches (ordered — batch order is unchanged);
        # the transform must then be thread-safe
        # (DeviceVideoFeaturePrecomputer and the CachedBackbone family
        # are).
        self.batch_transform = None
        self.producers = 1
        # validate against the EFFECTIVE dedup flag (dedup is inert without
        # to_device — see self.h2d_dedup below), so the constructor and a
        # later set_batch_stage() agree about the same configuration
        self.set_batch_stage(
            batch_transform, producers, _h2d_dedup=h2d_dedup and to_device
        )
        self.process_index = process_index
        self.process_count = process_count
        # Issue the host->device transfer from the producer thread so it
        # overlaps the consumer's step (on tunnel-attached chips the H2D
        # copy is seconds per epoch — see tools/bench_e2e.py).
        self.to_device = to_device
        # Content-hash dedup of video transfers (io/frame_store.py):
        # overlapping sample windows re-ship ~6/7 of their bytes, and
        # epoch 2+ re-ships everything; the store keeps frames
        # device-resident and assembles windows by an on-device gather —
        # bit-identical batches, a fraction of the wire traffic.
        self.h2d_dedup = h2d_dedup and to_device
        # Mesh runs shard the batch dim over the `data` axis from the
        # producer thread (the reference's per-rank DataLoader partitioning,
        # full_comparison.py:766-768): video streams go through the sharded
        # frame-store tier (per-device rings, io/frame_store.py
        # MeshFrameStoreRouter), other leaves are device_put with the same
        # P('data') layout the trainer would apply — so trainer._place_batch
        # sees already-placed global arrays and its device_put is a no-op.
        self.mesh = mesh
        self._frame_router = None
        if self.h2d_dedup:
            if mesh is not None:
                from routeformer_tpu.io.frame_store import MeshFrameStoreRouter

                self._frame_router = MeshFrameStoreRouter(
                    mesh, budget_bytes=dedup_budget_bytes
                )
            else:
                from routeformer_tpu.io.frame_store import FrameStoreRouter

                self._frame_router = FrameStoreRouter(
                    budget_bytes=dedup_budget_bytes
                )
        self._epoch = 0

    def set_batch_stage(
        self,
        transform: Optional[Callable],
        producers: int = 1,
        _h2d_dedup: Optional[bool] = None,
    ):
        """(Re)configure the producer-side batch stage after construction.

        Lets a driver attach the per-batch host stage (feature-memo lookup,
        video split, …) to loaders built earlier — the stage then runs
        inside the prefetch pipeline instead of serializing with the
        consumer's step. Validates the same invariants as ``__init__``."""
        dedup = self.h2d_dedup if _h2d_dedup is None else _h2d_dedup
        producers = max(int(producers), 1)
        if producers > 1 and dedup:
            # the frame-store rings admit/evict per call — concurrent
            # producer-side placement would interleave ring mutations
            raise ValueError(
                "producers > 1 is not supported with h2d_dedup (the "
                "frame-store ring is a sequential structure); run the "
                "dedup tier with one producer or drop h2d_dedup"
            )
        self.batch_transform = transform
        self.producers = producers

    def _place(self, batch: dict) -> dict:
        """Producer-side device placement, optionally frame-deduplicated."""
        import jax.numpy as jnp

        out = {}
        for k, v in batch.items():
            if isinstance(v, dict):
                out[k] = self._place(v)
            elif (
                self._frame_router is not None
                and "video" in k
                and getattr(v, "ndim", 0) == 5
            ):
                # keyed by stream name only (not train/target): overlapping
                # samples put the same source frame in one sample's train
                # window and a neighbor's target window — one store serves
                # both
                out[k] = self._frame_router.put(k, np.asarray(v))
            elif self.mesh is not None:
                out[k] = _mesh_put(self.mesh, np.asarray(v))
            else:
                out[k] = jnp.asarray(v)
        return out

    def set_epoch(self, epoch: int, start_batch: int = 0):
        """Reshuffle seed per epoch (DistributedSampler role).

        ``start_batch`` resumes mid-epoch: the first ``start_batch``
        batches of this epoch's (deterministic) order are skipped without
        being assembled."""
        self._epoch = epoch
        self._start_batch = start_batch
        if self._frame_router is not None and epoch > 0:
            for name, s in self._frame_router.stats().items():
                ratio = s["shipped"] / max(s["seen"], 1)
                msg = (
                    "frame store %s: %d/%d frames shipped (%.1f%%), "
                    "capacity %d"
                )
                if ratio > 0.5:
                    # steady-state epochs should mostly hit; persistent
                    # re-shipping means the ring is smaller than the
                    # dataset's unique frames on this host
                    logger.warning(
                        msg + " — raise dedup_budget_bytes",
                        name, s["shipped"], s["seen"], 100 * ratio,
                        s["capacity"],
                    )
                else:
                    logger.info(
                        msg, name, s["shipped"], s["seen"], 100 * ratio,
                        s["capacity"],
                    )

    def _indices(self) -> np.ndarray:
        idx = np.arange(len(self.dataset))
        if self.mesh is not None and self._frame_router is not None:
            # fixed per-host subset (stride before shuffling, so the host's
            # pool — and the per-shard pools below — are epoch-stable)
            host = idx[self.process_index :: self.process_count]
            # Shard-stable batch composition (DistributedSampler semantics,
            # reference full_comparison.py:766-768): each sample belongs to
            # ONE data shard permanently (position in the host subset mod
            # n_data), and every batch is assembled as n_data contiguous
            # per-shard row blocks. Shuffling permutes within each shard's
            # pool only — so the per-device frame-store rings stay disjoint
            # and a shuffled epoch never re-ships a frame to a different
            # device (without this, row->shard assignment followed batch
            # position and warm epochs re-shipped on reassignment).
            n_data = self._frame_router.n_data
            rows = self.batch_size // n_data
            if rows == 0:
                raise ValueError(
                    f"batch_size {self.batch_size} < data-parallel degree "
                    f"{n_data}"
                )
            parts = [host[d::n_data].copy() for d in range(n_data)]
            if self.shuffle:
                rng = np.random.default_rng(self.seed + self._epoch)
                for p in parts:
                    rng.shuffle(p)
            n_batches = min(len(p) for p in parts) // rows
            out = np.empty((n_batches, n_data, rows), idx.dtype)
            for d, p in enumerate(parts):
                out[:, d] = p[: n_batches * rows].reshape(n_batches, rows)
            return out.reshape(-1)
        if self.shuffle:
            rng = np.random.default_rng(self.seed + self._epoch)
            rng.shuffle(idx)
        # per-host strided shard
        return idx[self.process_index :: self.process_count]

    def __len__(self) -> int:
        n = len(self._indices())
        return n // self.batch_size if self.drop_last else -(-n // self.batch_size)

    def __iter__(self) -> Iterator[dict]:
        indices = self._indices()
        n_batches = len(self)
        batches = [
            indices[i * self.batch_size : (i + 1) * self.batch_size]
            for i in range(n_batches)
        ]
        start = getattr(self, "_start_batch", 0)
        if start:
            batches = batches[start:]
            self._start_batch = 0  # one-shot: later epochs start at 0

        # maxsize=0 would make the queue UNBOUNDED (queue.Queue semantics),
        # silently removing the run-ahead bound prefetch exists to enforce —
        # clamp so prefetch=0 means "no read-ahead beyond the in-flight batch".
        out_q: queue.Queue = queue.Queue(maxsize=max(self.prefetch, 1))
        stop = threading.Event()

        def produce():
            from multiprocessing.pool import ThreadPool

            try:
                with ThreadPool(self.num_threads) as pool:

                    def make(batch_idx):
                        # sample assembly fans out on the shared inner
                        # pool; collate/transform/placement run on the
                        # calling producer thread
                        samples = pool.map(
                            self.dataset.__getitem__,
                            [int(i) for i in batch_idx],
                        )
                        batch = self.collate(samples)
                        if self.batch_transform is not None:
                            batch = self.batch_transform(batch)
                        if self.to_device:
                            batch = self._place(batch)
                        return batch

                    if self.producers == 1:
                        for batch_idx in batches:
                            if stop.is_set():
                                return
                            out_q.put(make(batch_idx))
                    else:
                        # Ordered pipeline across batches: producer k
                        # transforms batch n+k while the consumer steps
                        # batch n. Submission is bounded (apply_async with
                        # at most producers+prefetch tasks in flight) —
                        # imap would enqueue the WHOLE epoch up front and
                        # buffer finished batches unboundedly, defeating
                        # the prefetch bound and running device placement
                        # arbitrarily far ahead of the consumer.
                        from collections import deque

                        with ThreadPool(self.producers) as stage:
                            pending: deque = deque()
                            max_inflight = self.producers + self.prefetch
                            todo = iter(batches)
                            exhausted = False
                            while True:
                                while (
                                    not exhausted
                                    and len(pending) < max_inflight
                                ):
                                    nxt = next(todo, None)
                                    if nxt is None:
                                        exhausted = True
                                    else:
                                        pending.append(
                                            stage.apply_async(make, (nxt,))
                                        )
                                if not pending:
                                    break
                                batch = pending.popleft().get()
                                if stop.is_set():
                                    return
                                out_q.put(batch)
            except Exception as e:  # noqa: BLE001 — surface on the consumer side
                out_q.put(e)
            finally:
                out_q.put(None)

        worker = threading.Thread(target=produce, daemon=True)
        worker.start()
        try:
            while True:
                item = out_q.get()
                if item is None:
                    break
                if isinstance(item, Exception):
                    raise item
                yield item
        finally:
            stop.set()
            # drain so the producer can exit
            while worker.is_alive():
                try:
                    out_q.get_nowait()
                except queue.Empty:
                    break
