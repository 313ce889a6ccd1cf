"""Steady-state throughput: flagship train step with precomputed embeddings.

The torchcache steady state (reference video_backbone/__init__.py:14-31):
after the first epoch every frame's frozen-backbone feature map is cached,
so steps consume ``*_video_features`` batches and the compiled program
contains no backbone at all (``VideoFeaturePrecomputer`` +
``USE_EMBEDDING_CACHE=1`` in the driver). This tool measures that rate on
the attached chip; ``bench.py`` stays the honest cold-path number.

Usage: python tools/bench_cached.py
"""

import json
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax  # noqa: E402

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

BATCH = 16
N_WARMUP = 2
N_TIMED = 10


def main():
    import jax.numpy as jnp

    from __graft_entry__ import _build_model, _flagship_config, _synthetic
    from routeformer_tpu.models.video_backbone.cache import VideoFeaturePrecomputer
    from routeformer_tpu.optimizers import build_optimizer
    from routeformer_tpu.parallel import make_train_step
    from routeformer_tpu.train import TrainingLosses, routeformer_training_loss

    cfg = _flagship_config()
    model = _build_model(cfg)
    losses = TrainingLosses.from_config(cfg)
    tx = build_optimizer(
        learning_rate=1e-5, weight_decay=1e-4, video_backbone_lr=1e-6,
        warmup_epochs=2, max_epochs=200, gradient_clip_val=2.5,
    )

    precompute = VideoFeaturePrecomputer(model)
    batch = _synthetic(cfg, batch_size=BATCH, frame_hw=(54, 96), seed=7)
    t0 = time.perf_counter()
    inp_np = precompute(batch["train"])
    tgt_np = precompute(batch["target"])
    precompute_s = time.perf_counter() - t0

    def loss_fn(m, inp, tgt, epoch):
        return routeformer_training_loss(m, inp, tgt, epoch, losses)

    step_fn, params, state, opt_state = make_train_step(model, tx, loss_fn)
    inp = {k: jnp.asarray(v) for k, v in inp_np.items()}
    tgt = {k: jnp.asarray(v) for k, v in tgt_np.items()}
    epoch = jnp.asarray(20)

    for _ in range(N_WARMUP):
        params, state, opt_state, metrics = step_fn(
            params, state, opt_state, inp, tgt, epoch
        )
    jax.block_until_ready(metrics)
    t0 = time.perf_counter()
    for _ in range(N_TIMED):
        params, state, opt_state, metrics = step_fn(
            params, state, opt_state, inp, tgt, epoch
        )
    jax.block_until_ready(metrics)
    dt = (time.perf_counter() - t0) / N_TIMED
    assert np.isfinite(float(metrics["total_loss"]))
    print(
        json.dumps(
            {
                "metric": "flagship_train_step_cached_clips_per_sec_per_chip",
                "value": round(BATCH / dt, 3),
                "unit": "clips/sec/chip",
                "precompute_cold_s": round(precompute_s, 2),
            }
        )
    )


if __name__ == "__main__":
    main()
