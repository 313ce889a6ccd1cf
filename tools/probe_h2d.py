"""Probe: why does the overlapped e2e collapse while its components are fast?

bench_e2e measures pipeline_warm ~32 clips/s (includes producer-side H2D)
and step_only ~22.7 clips/s, yet the overlapped epoch runs at 4-6 clips/s.
This times, on the real chip:

  1. pure H2D of one batch's arrays (uint8 vs float16), per-key and packed
  2. steps alone
  3. steps with concurrent producer-thread H2D (the loader's architecture)

to attribute the loss: tunnel bandwidth, per-transfer round trips, GIL
serialization, or stream contention.

Usage: python tools/probe_h2d.py
"""

import sys
import threading
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

BATCH = 16
FRAMES = 71  # 8 s train + 6 s target + 1 frame @ 5 Hz
HW = (54, 96)


def batch_arrays(dtype):
    rng = np.random.default_rng(0)
    h, w = HW
    if dtype == "uint8":
        vid = lambda: rng.integers(0, 256, (BATCH, FRAMES, h, w, 3), np.uint8)
    else:
        vid = lambda: rng.random((BATCH, FRAMES, h, w, 3)).astype(np.float16)
    return {
        "left_video": vid(),
        "right_video": vid(),
        "front_video": vid(),
        "gps": rng.random((BATCH, 71, 2)).astype(np.float32),
        "gaze": rng.random((BATCH, 2810, 2)),
    }


def time_h2d(arrays, reps=5):
    # warm up allocator
    for v in arrays.values():
        jax.block_until_ready(jnp.asarray(v))
    t0 = time.perf_counter()
    for _ in range(reps):
        out = [jnp.asarray(v) for v in arrays.values()]
        jax.block_until_ready(out)
    return (time.perf_counter() - t0) / reps


def main():
    nbytes = {k: v.nbytes for k, v in batch_arrays("uint8").items()}
    total_u8 = sum(nbytes.values())
    print(f"batch payload uint8: {total_u8/1e6:.1f} MB", flush=True)

    for dtype in ("uint8", "float16"):
        arrays = batch_arrays(dtype)
        total = sum(v.nbytes for v in arrays.values())
        per_key = time_h2d(arrays)
        packed = {"all": np.concatenate([v.reshape(BATCH, -1).view(np.uint8)
                                         for v in arrays.values()], axis=1)}
        packed_t = time_h2d(packed)
        print(
            f"{dtype}: {total/1e6:.1f} MB  per-key H2D {per_key*1e3:.0f} ms "
            f"({total/per_key/1e6:.0f} MB/s)  packed {packed_t*1e3:.0f} ms "
            f"({total/packed_t/1e6:.0f} MB/s)", flush=True,
        )

    # a steady matmul "step" stand-in sized to ~30 ms on-chip
    x = jnp.asarray(np.random.default_rng(1).random((4096, 4096), np.float32))

    @jax.jit
    def stepish(a):
        for _ in range(24):
            a = jnp.tanh(a @ a) * 0.5
        return a

    jax.block_until_ready(stepish(x))
    t0 = time.perf_counter()
    for _ in range(10):
        x = stepish(x)
    jax.block_until_ready(x)
    step_t = (time.perf_counter() - t0) / 10
    print(f"stepish alone: {step_t*1e3:.0f} ms", flush=True)

    # concurrent: producer thread doing H2D while main thread steps
    arrays = batch_arrays("uint8")
    stop = threading.Event()
    h2d_done = [0]

    def producer():
        while not stop.is_set():
            out = [jnp.asarray(v) for v in arrays.values()]
            jax.block_until_ready(out)
            h2d_done[0] += 1

    th = threading.Thread(target=producer, daemon=True)
    th.start()
    t0 = time.perf_counter()
    n_steps = 10
    for _ in range(n_steps):
        x = stepish(x)
    jax.block_until_ready(x)
    wall = time.perf_counter() - t0
    stop.set()
    th.join(timeout=30)
    print(
        f"concurrent: {n_steps} steps in {wall:.2f} s "
        f"({wall/n_steps*1e3:.0f} ms/step vs {step_t*1e3:.0f} alone); "
        f"{h2d_done[0]} H2D batches alongside", flush=True,
    )


if __name__ == "__main__":
    main()
