"""Content-addressed, size-bounded sample cache (zstd + pickle).

Capability parity with the reference's sample-cache tier
(``routeformer/io/dataset.py:1138-1190`` and
``io/dataset_dreyeve.py:953-1003``): per-item zstd-compressed pickles keyed
by a blake2b hash of the item identity + the parameters that affect its
content, a bounded total size, corrupt-file self-healing (delete +
recompute), and a version string for cache busting.
"""

import hashlib
import os
import pickle
import queue
import threading
from pathlib import Path
from typing import Any, Callable, Optional

import zstandard

from routeformer_tpu.utils.logging import get_logger

logger = get_logger("io.cache")

CACHE_VERSION = "1"


class SampleCache:
    """Disk cache of dataset samples.

    Thread-safe: the DataLoader fetches samples from a thread pool, and
    zstandard (de)compressor objects must NOT be shared across threads —
    concurrent use of one instance corrupts streams (observed as mass
    cache self-healing, i.e. silent full recomputes, and segfaults). The
    contexts are therefore thread-local.

    ``async_writes=True`` moves compression + file IO off the caller's
    thread onto one background writer (the cold-pipeline profile showed
    the zstd write as ~40% of a sample's critical path). The sample is
    snapshotted by pickling *synchronously* at ``push`` time, so later
    caller-side mutation cannot corrupt the cache; only the compress and
    write are deferred. Writes are best-effort (like the cache itself):
    ``flush()`` drains the queue when determinism is needed (tests,
    clean shutdown).
    """

    def __init__(
        self,
        cache_dir,
        params_repr: str = "",
        max_size_bytes: float = 200e9,
        version: str = CACHE_VERSION,
        compression_level: int = 3,
        async_writes: bool = False,
    ):
        self.cache_dir = Path(cache_dir)
        self.cache_dir.mkdir(parents=True, exist_ok=True)
        self.params_repr = params_repr
        self.max_size_bytes = max_size_bytes
        self.version = version
        self._compression_level = compression_level
        self._local = threading.local()
        # running size counter: scanning the directory per push is O(n)
        # in cache entries (initialized lazily by one scan, then updated)
        self._size_lock = threading.Lock()
        self._size: Optional[int] = None
        self._queue: Optional[queue.Queue] = None
        if async_writes:
            self._queue = queue.Queue(maxsize=8)
            self._writer = threading.Thread(
                target=self._writer_loop, daemon=True,
                name="SampleCache-writer",
            )
            self._writer.start()

    @property
    def _cctx(self) -> "zstandard.ZstdCompressor":
        ctx = getattr(self._local, "cctx", None)
        if ctx is None:
            ctx = zstandard.ZstdCompressor(level=self._compression_level)
            self._local.cctx = ctx
        return ctx

    @property
    def _dctx(self) -> "zstandard.ZstdDecompressor":
        ctx = getattr(self._local, "dctx", None)
        if ctx is None:
            ctx = zstandard.ZstdDecompressor()
            self._local.dctx = ctx
        return ctx

    def key(self, item_repr: str) -> str:
        """blake2b key of item identity + relevant params (reference
        ``_hash_item`` dataset.py:1171-1190)."""
        h = hashlib.blake2b(digest_size=20)
        h.update(self.version.encode())
        h.update(item_repr.encode())
        h.update(self.params_repr.encode())
        return h.hexdigest()

    def _path(self, key: str) -> Path:
        return self.cache_dir / f"{key}.zst"

    def fetch(self, item_repr: str) -> Optional[Any]:
        """Read a cached sample; corrupt entries self-heal (delete, miss)."""
        path = self._path(self.key(item_repr))
        if not path.exists():
            return None
        try:
            with open(path, "rb") as fh:
                return pickle.loads(self._dctx.decompress(fh.read()))
        except Exception as e:  # noqa: BLE001 — any corruption heals the same way
            logger.warning("corrupt cache entry %s (%s); removing", path.name, e)
            try:
                freed = path.stat().st_size
            except OSError:
                freed = 0
            path.unlink(missing_ok=True)
            with self._size_lock:
                if self._size is not None:
                    self._size = max(0, self._size - freed)
            return None

    def push(self, item_repr: str, sample: Any) -> bool:
        """Write a sample unless the cache exceeds its size bound."""
        if self.size_bytes() >= self.max_size_bytes:
            logger.info("cache full (%d bytes); skipping write", self.size_bytes())
            return False
        path = self._path(self.key(item_repr))
        raw = pickle.dumps(sample, protocol=pickle.HIGHEST_PROTOCOL)
        if self._queue is not None:
            self._queue.put((path, raw))
            return True
        self._write(path, self._cctx.compress(raw))
        return True

    def _write(self, path: Path, payload: bytes):
        tmp = path.with_suffix(".tmp")
        with open(tmp, "wb") as fh:
            fh.write(payload)
        os.replace(tmp, path)
        with self._size_lock:
            if self._size is not None:
                self._size += len(payload)

    def _writer_loop(self):
        while True:
            path, raw = self._queue.get()
            try:
                self._write(path, self._cctx.compress(raw))
            except Exception as e:  # noqa: BLE001 — cache writes are best-effort
                logger.warning("async cache write failed for %s: %s", path.name, e)
            finally:
                self._queue.task_done()

    def flush(self):
        """Block until all queued async writes are durable."""
        if self._queue is not None:
            self._queue.join()

    def get_or_compute(self, item_repr: str, compute: Callable[[], Any]) -> Any:
        sample = self.fetch(item_repr)
        if sample is not None:
            return sample
        sample = compute()
        self.push(item_repr, sample)
        return sample

    def size_bytes(self) -> int:
        with self._size_lock:
            if self._size is None:
                self._size = sum(
                    p.stat().st_size for p in self.cache_dir.glob("*.zst")
                )
            return self._size

    def clear(self):
        self.flush()
        for p in self.cache_dir.glob("*.zst"):
            p.unlink()
        with self._size_lock:
            self._size = 0
