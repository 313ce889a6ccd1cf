"""Minimal repro: flagship train step on a synthetic batch of size N.

The e2e phase (tools/bench_e2e.py) crashes the TPU worker at its first
step_fn call (batch 8) while bench.py's identical step at batch 16 runs
fine. This isolates the step from the pipeline: same flagship config, same
frame geometry, synthetic data, configurable batch size.

Usage: STEP_BATCH=8 python tools/step_at_batch.py

NOTE: this is a FAULT-validation tool, not a throughput benchmark — each
step ships freshly generated host arrays through the ~16 MB/s tunnel, so
its ms/step is transfer-dominated and far below bench.py's numbers (which
keep data device-resident). Read only rc/crash-or-not from it.
"""

import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax  # noqa: E402

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import jax.numpy as jnp  # noqa: E402

BATCH = int(os.getenv("STEP_BATCH", "8"))
FRAME_HW = (54, 96)


def main():
    from __graft_entry__ import _synthetic
    from bench_core import _build_step

    cfg, _, step_fn, params, state, opt_state = _build_step()
    batch = _synthetic(cfg, batch_size=BATCH, frame_hw=FRAME_HW, seed=7)
    inp = {k: jnp.asarray(v) for k, v in batch["train"].items()}
    tgt = {k: jnp.asarray(v) for k, v in batch["target"].items()}
    epoch_idx = jnp.asarray(0)
    print(f"batch={BATCH} compiling...", flush=True)
    t0 = time.perf_counter()
    params, state, opt_state, metrics = step_fn(
        params, state, opt_state, inp, tgt, epoch_idx
    )
    jax.block_until_ready(metrics)
    print(f"compile+first step: {time.perf_counter() - t0:.1f}s", flush=True)
    t0 = time.perf_counter()
    for _ in range(3):
        params, state, opt_state, metrics = step_fn(
            params, state, opt_state, inp, tgt, epoch_idx
        )
    jax.block_until_ready(metrics)
    dt = (time.perf_counter() - t0) / 3
    loss = float(metrics["total_loss"])
    assert loss == loss, "nan loss"
    print(f"OK batch={BATCH}: {dt*1000:.1f} ms/step, "
          f"{BATCH/dt:.2f} clips/s, loss={loss:.4f}", flush=True)


if __name__ == "__main__":
    main()
