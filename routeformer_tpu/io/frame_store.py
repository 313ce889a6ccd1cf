"""Device-resident frame store: content-hash dedup of video H2D transfers.

GEM/DR(eye)VE samples are overlapping windows (14 s span at 2 s steps —
reference ``io/dataset.py:967-1033``), so consecutive batches re-ship
~6/7 of their video bytes; across epochs, ALL of them. On a
bandwidth-limited host->device link (the tunnel rig measures ~16 MB/s;
PCIe hosts are faster but video still dominates the wire), that transfer
is the end-to-end wall. The reference leans on its embedding cache to
shrink repeat traffic (``torchcache`` role); this store is the same idea
one level down, applied at the transfer layer with no model involvement:

- each decimated frame is keyed by a blake2b content hash (host side),
- novel frames are shipped once and scattered into a fixed device-resident
  ring buffer (donated, in-place),
- the batch tensor the training step consumes is assembled ON DEVICE by a
  gather — bit-identical to shipping the full windows, whatever the access
  order (sequential, shuffled, cross-epoch).

Static-shape discipline: the gather program is one compile per batch
geometry; scatter programs are bucketed to power-of-two novel counts with
out-of-range padding slots dropped via ``.at[].set(mode="drop")`` — a
handful of programs total, no per-batch recompiles.

Not thread-safe by itself: one store belongs to one producer thread (the
``DataLoader`` prefetch thread). Slot assignment never evicts a slot that
the current batch references.
"""

from typing import Dict, Tuple

import numpy as np

from routeformer_tpu.utils.logging import get_logger

logger = get_logger("io.frame_store")


def hash_frames(flat: np.ndarray) -> list:
    """blake2b-16 content key per leading-axis element (C-contiguous)."""
    import hashlib

    keys = []
    for i in range(flat.shape[0]):
        h = hashlib.blake2b(digest_size=16)
        h.update(flat[i])  # buffer protocol, no copy
        keys.append(h.digest())
    return keys


class ContentRing:
    """Host-side index for a device-resident ring buffer.

    Maps content keys to slots in a fixed-capacity ring; eviction is
    write-order, never evicting a slot the current call references.
    Shared by the pixel frame store (below) and the device feature memo
    (``models/video_backbone/cache.py``)."""

    def __init__(self, capacity: int, owner: str = "ContentRing"):
        if capacity < 1:
            raise ValueError(f"capacity must be >= 1, got {capacity}")
        self.capacity = int(capacity)
        self.owner = owner
        self._slot_of: Dict[bytes, int] = {}
        self._key_at = [None] * self.capacity
        self._cursor = 0

    def resolve(self, keys):
        """-> (idx int32 with -1 at unresolved, novel {key: first_pos},
        needed resident slots). ``idx`` entries for novel keys stay -1
        until ``admit`` + ``fill``."""
        n = len(keys)
        idx = np.full((n,), -1, np.int32)
        needed: set = set()
        novel: Dict[bytes, int] = {}
        for i, key in enumerate(keys):
            slot = self._slot_of.get(key)
            if slot is not None:
                idx[i] = slot
                needed.add(slot)
            elif key not in novel:
                novel[key] = i
        return idx, novel, needed

    def admit(self, novel_keys, needed: set) -> np.ndarray:
        """Assign (evicting) slots for the novel keys, in order."""
        slots = np.empty((len(novel_keys),), np.int32)
        for j, key in enumerate(novel_keys):
            for _ in range(self.capacity):
                slot = self._cursor
                self._cursor = (self._cursor + 1) % self.capacity
                if slot not in needed:
                    break
            else:
                raise RuntimeError(
                    f"{self.owner} capacity {self.capacity} cannot hold "
                    "one call's unique frames; raise the byte budget"
                )
            old = self._key_at[slot]
            if old is not None:
                del self._slot_of[old]
            self._slot_of[key] = slot
            self._key_at[slot] = key
            slots[j] = slot
            needed.add(slot)
        return slots

    def fill(self, keys, idx: np.ndarray):
        """Resolve the remaining -1 entries after ``admit``."""
        for i, key in enumerate(keys):
            if idx[i] < 0:
                idx[i] = self._slot_of[key]
        return idx


class DeviceFrameStore:
    """Ring buffer of frames on the device + host-side content index."""

    def __init__(
        self,
        frame_shape: Tuple[int, ...],
        dtype,
        capacity: int,
        device=None,
    ):
        import jax
        import jax.numpy as jnp

        self.frame_shape = tuple(frame_shape)
        self.dtype = np.dtype(dtype)
        self.device = device  # None: default device; else pinned (mesh tier)
        self._ring = ContentRing(capacity, owner="DeviceFrameStore")
        self._store = self._put(
            np.zeros((self._ring.capacity, *self.frame_shape), dtype=self.dtype)
        )
        # observability
        self.frames_seen = 0
        self.frames_shipped = 0

        @jax.jit
        def gather(store, idx):
            return jnp.take(store, idx, axis=0)

        def scatter(store, slots, frames):
            # OOB padding slots are dropped — fixed shapes per bucket
            return store.at[slots].set(frames, mode="drop")

        self._gather = gather
        self._scatter = jax.jit(scatter, donate_argnums=0)

    def _put(self, x):
        """Host array -> device array, pinned to this store's device when
        one was given (committed inputs keep the jitted gather/scatter on
        that device)."""
        import jax
        import jax.numpy as jnp

        if self.device is None:
            return jnp.asarray(x)
        return jax.device_put(x, self.device)

    @property
    def capacity(self) -> int:
        return self._ring.capacity

    def put_windows(self, windows: np.ndarray, keys=None):
        """(B, T, *frame_shape) host windows -> device array, deduplicated.

        Ships only frames whose content hash is not already resident; the
        returned device tensor equals ``jnp.asarray(windows)`` exactly.
        ``keys`` are the precomputed content hashes of the flattened frames
        (the mesh router hashes each shard once for all model replicas).
        """
        windows = np.ascontiguousarray(windows)
        b, t = windows.shape[:2]
        flat = windows.reshape((-1, *windows.shape[2:]))
        self.frames_seen += flat.shape[0]

        if keys is None:
            keys = hash_frames(flat)
        idx, novel, needed = self._ring.resolve(keys)

        if novel:
            slots = self._ring.admit(list(novel), needed)
            idx = self._ring.fill(keys, idx)
            frames = flat[list(novel.values())]
            self.frames_shipped += len(novel)
            # pad to the next power-of-two bucket; padding slots are OOB
            # (== capacity) and dropped by the scatter — a bounded program
            # count instead of one compile per novel-count
            bucket = 1 << (len(novel) - 1).bit_length()
            if bucket > len(novel):
                pad = bucket - len(novel)
                frames = np.concatenate(
                    [frames, np.zeros((pad, *frames.shape[1:]), frames.dtype)]
                )
                slots = np.concatenate(
                    [slots, np.full((pad,), self.capacity, np.int32)]
                )
            self._store = self._scatter(
                self._store, self._put(slots), self._put(frames)
            )

        out = self._gather(self._store, self._put(idx))
        return out.reshape((b, t, *self.frame_shape))


def _store_capacity(
    windows: np.ndarray, budget_bytes: float, n_streams_hint: int, label: str
) -> int:
    """Ring capacity for one stream's store under a per-device byte budget
    split across the expected streams — never below two batches' worth of
    frames (shared by both routers so their sizing cannot diverge)."""
    frame_bytes = int(np.prod(windows.shape[2:]) * windows.dtype.itemsize)
    per_stream = budget_bytes / n_streams_hint
    capacity = int(per_stream // max(frame_bytes, 1))
    min_cap = 2 * windows.shape[0] * windows.shape[1]
    if capacity < min_cap:
        logger.info(
            "frame store %s: budget %.0f MB < 2 batches; raising capacity "
            "to %d frames", label, per_stream / 1e6, min_cap,
        )
        capacity = min_cap
    return capacity


class FrameStoreRouter:
    """Per-(key, shape, dtype) stores under one byte budget.

    The DataLoader hands every 5-D video tensor here; streams with
    different geometry (GoPro pair vs front camera) get separate stores.
    The budget is split evenly across streams as they appear (late
    arrivals rebuild is NOT attempted — geometry is known after one
    batch, and all reference pipelines have fixed stream sets).
    """

    def __init__(self, budget_bytes: float = 512e6, n_streams_hint: int = 3):
        self.budget_bytes = float(budget_bytes)
        self.n_streams_hint = max(1, int(n_streams_hint))
        self._stores: Dict[tuple, DeviceFrameStore] = {}

    def put(self, name: str, windows: np.ndarray):
        key = (name, windows.shape[2:], np.dtype(windows.dtype).str)
        store = self._stores.get(key)
        if store is None:
            capacity = _store_capacity(
                windows, self.budget_bytes, self.n_streams_hint, name
            )
            store = DeviceFrameStore(
                windows.shape[2:], windows.dtype, capacity
            )
            self._stores[key] = store
        return store.put_windows(windows)

    def stats(self) -> Dict[str, Dict[str, int]]:
        return {
            k[0] + str(k[1]): {
                "seen": s.frames_seen,
                "shipped": s.frames_shipped,
                "capacity": s.capacity,
            }
            for k, s in self._stores.items()
        }


class MeshFrameStoreRouter:
    """Sharded transfer tier: the frame-store dedup for mesh runs.

    The data-parallel input split assigns batch rows to mesh data shards
    deterministically (row ``r`` -> shard ``r // (B / n_data)`` — the
    reference's per-rank DataLoader partitioning,
    ``experiments/full_comparison.py:766-768``). Each (stream, data-shard,
    model-replica) triple gets its own device-pinned :class:`DeviceFrameStore`
    whose ring lives on that mesh device; ``put`` dedups each shard's rows
    against its own ring and assembles the global batch-sharded array from
    the per-device gathers via ``jax.make_array_from_single_device_arrays``
    — bit-identical to ``device_put(windows, NamedSharding(mesh,
    P('data')))`` at a fraction of the wire bytes.

    This is the per-host ContentRing design mapped onto a single-host
    multi-device mesh: on a real multi-host pod each host runs one router
    over its addressable mesh column, so dedup stays host-local and novel
    frames cross the wire once per host (x ``n_model`` for model-axis
    replicas; ``n_model`` is 1 in the bench topology).
    """

    def __init__(self, mesh, budget_bytes: float = 512e6, n_streams_hint: int = 3):
        from routeformer_tpu.parallel.mesh import DATA_AXIS, MODEL_AXIS

        self.mesh = mesh
        self.n_data = mesh.shape[DATA_AXIS]
        self.n_model = mesh.shape.get(MODEL_AXIS, 1)
        # (n_data, n_model) grid of this process's devices
        self.device_grid = np.asarray(mesh.devices).reshape(
            self.n_data, self.n_model
        )
        # budget is per-device: each ring only holds its shard's frames
        self.budget_bytes = float(budget_bytes)
        self.n_streams_hint = max(1, int(n_streams_hint))
        self._stores: Dict[tuple, DeviceFrameStore] = {}

    def _store_for(self, name: str, chunk: np.ndarray, d: int, m: int):
        key = (name, chunk.shape[2:], np.dtype(chunk.dtype).str, d, m)
        store = self._stores.get(key)
        if store is None:
            capacity = _store_capacity(
                chunk, self.budget_bytes, self.n_streams_hint,
                f"{name}[d{d},m{m}]",
            )
            store = DeviceFrameStore(
                chunk.shape[2:], chunk.dtype, capacity,
                device=self.device_grid[d, m],
            )
            self._stores[key] = store
        return store

    def put(self, name: str, windows: np.ndarray):
        """(B, T, *frame) host windows -> GLOBAL jax.Array sharded
        ``P('data')`` over the mesh, video bytes deduplicated per shard."""
        import jax
        from jax.sharding import NamedSharding, PartitionSpec as P

        from routeformer_tpu.parallel.mesh import DATA_AXIS

        windows = np.ascontiguousarray(windows)
        b = windows.shape[0]
        if b % self.n_data != 0:
            raise ValueError(
                f"batch {b} not divisible by data-parallel degree "
                f"{self.n_data}"
            )
        rows = b // self.n_data
        spec = P(DATA_AXIS, *([None] * (windows.ndim - 1)))
        sharding = NamedSharding(self.mesh, spec)

        shard_by_device = {}
        for d in range(self.n_data):
            chunk = np.ascontiguousarray(windows[d * rows : (d + 1) * rows])
            keys = hash_frames(chunk.reshape((-1, *chunk.shape[2:])))
            for m in range(self.n_model):
                store = self._store_for(name, chunk, d, m)
                shard_by_device[self.device_grid[d, m]] = store.put_windows(
                    chunk, keys=keys
                )
        dmap = sharding.devices_indices_map(windows.shape)
        return jax.make_array_from_single_device_arrays(
            windows.shape, sharding, [shard_by_device[dev] for dev in dmap]
        )

    def stats(self) -> Dict[str, Dict[str, int]]:
        out: Dict[str, Dict[str, int]] = {}
        for (name, shape, _, d, m), s in self._stores.items():
            entry = out.setdefault(
                name + str(shape),
                {"seen": 0, "shipped": 0, "capacity": 0},
            )
            entry["seen"] += s.frames_seen
            entry["shipped"] += s.frames_shipped
            entry["capacity"] += s.capacity
        return out
