"""Bisect the overlapped-e2e collapse (bench_e2e: 22.7 clips/s step,
32 clips/s warm pipeline, but 4-6 clips/s overlapped).

Same fixture + flagship step as tools/bench_e2e.py (compile cache warm),
then times, separately:

  A. steps on a resident batch (baseline, = step_only)
  B. steps on successive loader batches, loader FULLY drained first
     (no producer concurrency; arrays already on device)
  C. steps on successive loader batches streamed with to_device=True
     (producer thread doing H2D while stepping — bench_e2e's run_epoch)
  D. as C but to_device=False (H2D on the consumer thread, sync)

Usage: python tools/probe_overlap.py
"""

import sys
import tempfile
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))
sys.path.insert(0, str(Path(__file__).resolve().parent.parent / "tests"))

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from tools.bench_e2e import BATCH, make_dataset  # noqa: E402


def main():
    import shutil

    from gem_fixture import build_gem_fixture

    from __graft_entry__ import _build_model, _flagship_config
    from routeformer_tpu.io.loader import DataLoader
    from routeformer_tpu.optimizers import build_optimizer
    from routeformer_tpu.parallel import make_train_step
    from routeformer_tpu.train import TrainingLosses, routeformer_training_loss

    workdir = Path(tempfile.mkdtemp(prefix="probe_overlap_"))
    try:
        build_gem_fixture(workdir / "gem", duration_s=240.0, hw=(270, 480))
        dataset = make_dataset(workdir / "gem", workdir / "cache")

        cfg = _flagship_config()
        model = _build_model(cfg)
        tx = build_optimizer(
            learning_rate=1e-5, weight_decay=1e-4, video_backbone_lr=1e-6,
            warmup_epochs=2, max_epochs=200, gradient_clip_val=2.5,
        )
        losses = TrainingLosses.from_config(cfg)

        def loss_fn(m, inp, tgt, epoch):
            return routeformer_training_loss(m, inp, tgt, epoch, losses)

        step_fn, params, state, opt_state = make_train_step(model, tx, loss_fn)
        epoch_idx = jnp.asarray(0)

        def dev(batch):
            inp = {k: jnp.asarray(v) for k, v in batch["train"].items()}
            tgt = {k: jnp.asarray(v) for k, v in batch["target"].items()}
            return inp, tgt

        def run(batches, label):
            nonlocal params, state, opt_state
            t0 = time.perf_counter()
            n = 0
            metrics = None
            for batch in batches:
                inp, tgt = dev(batch)
                params, state, opt_state, metrics = step_fn(
                    params, state, opt_state, inp, tgt, epoch_idx
                )
                n += int(inp["gps"].shape[0])
            jax.block_until_ready(metrics)
            wall = time.perf_counter() - t0
            print(
                f"{label}: {n} clips in {wall:.2f} s = {n/wall:.2f} clips/s "
                f"({wall/max(n//BATCH,1)*1e3:.0f} ms/batch)", flush=True,
            )

        loader = DataLoader(
            dataset, batch_size=BATCH, shuffle=False, num_threads=8,
            prefetch=2, to_device=True,
        )
        # warm the sample cache + compile
        drained = list(loader)
        if dataset._sample_cache is not None:
            dataset._sample_cache.flush()
        first = drained[0]
        inp, tgt = dev(first)
        for _ in range(2):
            params, state, opt_state, m = step_fn(
                params, state, opt_state, inp, tgt, epoch_idx
            )
        jax.block_until_ready(m)

        run([first] * len(drained), "A resident batch x7")
        drained = list(loader)  # re-materialized device arrays, no concurrency
        run(drained, "B drained loader batches")
        run(loader, "C streamed, producer H2D")
        loader_host = DataLoader(
            dataset, batch_size=BATCH, shuffle=False, num_threads=8,
            prefetch=2, to_device=False,
        )
        run(loader_host, "D streamed, consumer H2D")
    finally:
        shutil.rmtree(workdir, ignore_errors=True)


if __name__ == "__main__":
    main()
