"""Interleaved A/B of the fused Perceive-stack kernel on the steady step.

Steady-state (cached-embedding) step timings through the axon tunnel vary
up to 2x run-to-run (official 233.2 clips/s vs 106-155 in adjacent runs of
the *identical* cached program — see docs/PERF.md round-4 notes), so a
cross-run A/B cannot resolve a kernel win. This tool builds BOTH step
variants in one process (ROUTEFORMER_FUSION_KERNEL consulted at trace
time), warms both, then alternates timing blocks A/B/A/B; per-variant
medians share whatever the tunnel is doing that minute.

Also times the cold step (backbone in the loop) for both variants.

Usage: python tools/bench_fused_ab.py   (TPU)
"""

import json
import os
import statistics
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax  # noqa: E402

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

BATCH = int(os.getenv("BENCH_BATCH", "16"))
BLOCKS = int(os.getenv("AB_BLOCKS", "4"))
STEPS_PER_BLOCK = int(os.getenv("AB_STEPS", "10"))


def _build(mode: str, cached: bool):
    import jax.numpy as jnp

    os.environ["ROUTEFORMER_FUSION_KERNEL"] = mode
    from __graft_entry__ import _build_model, _flagship_config, _synthetic
    from routeformer_tpu.models.video_backbone.cache import (
        VideoFeaturePrecomputer,
    )
    from routeformer_tpu.optimizers import build_optimizer
    from routeformer_tpu.parallel import make_train_step
    from routeformer_tpu.train import TrainingLosses, routeformer_training_loss

    cfg = _flagship_config()
    model = _build_model(cfg)
    tx = build_optimizer(
        learning_rate=1e-5, weight_decay=1e-4, video_backbone_lr=1e-6,
        warmup_epochs=2, max_epochs=200, gradient_clip_val=2.5,
    )
    losses = TrainingLosses.from_config(cfg)

    def loss_fn(m, inp, tgt, epoch):
        return routeformer_training_loss(m, inp, tgt, epoch, losses)

    batch = _synthetic(cfg, batch_size=BATCH, frame_hw=(54, 96), seed=7)
    if cached:
        precompute = VideoFeaturePrecomputer(model)
        inp_np = precompute(batch["train"])
        tgt_np = precompute(batch["target"])
    else:
        inp_np, tgt_np = batch["train"], batch["target"]
    step_fn, params, state, opt_state = make_train_step(model, tx, loss_fn)
    inp = {k: jnp.asarray(v) for k, v in inp_np.items()}
    tgt = {k: jnp.asarray(v) for k, v in tgt_np.items()}
    slot = [step_fn, params, state, opt_state, inp, tgt]
    # Trace/compile NOW, while this variant's env var is still set —
    # ROUTEFORMER_FUSION_KERNEL is consulted at trace time.
    _run_block(slot, 2)
    return slot


def _run_block(slot, n):
    import jax.numpy as jnp
    import numpy as np

    step_fn, params, state, opt_state, inp, tgt = slot
    epoch = jnp.asarray(20)
    t0 = time.perf_counter()
    for _ in range(n):
        params, state, opt_state, metrics = step_fn(
            params, state, opt_state, inp, tgt, epoch
        )
    jax.block_until_ready(metrics)
    dt = (time.perf_counter() - t0) / n
    assert np.isfinite(float(metrics["total_loss"]))
    slot[1], slot[2], slot[3] = params, state, opt_state
    return dt


_LABELS = {"0": "scan", "1": "fused", "hybrid": "hybrid"}
# Default A/B: the hybrid (Mosaic fwd + XLA bwd — the only kernel variant
# whose backward compiles on the axon helper, see docs/PERF.md) vs the
# scan formulation. AB_VARIANTS=1,0 re-runs the full-kernel A/B.
VARIANTS = [
    v.strip() for v in os.getenv("AB_VARIANTS", "hybrid,0").split(",")
]


def ab(name, cached):
    keys = [_LABELS.get(v, v) for v in VARIANTS]
    slots = {
        k: _build(v, cached) for k, v in zip(keys, VARIANTS)
    }
    times = {k: [] for k in keys}
    for _ in range(BLOCKS):
        for key in keys:
            times[key].append(_run_block(slots[key], STEPS_PER_BLOCK))
    out = {}
    for key, ts in times.items():
        med = statistics.median(ts)
        out[f"{name}_{key}_clips_s"] = round(BATCH / med, 2)
        out[f"{name}_{key}_ms"] = round(med * 1e3, 2)
        out[f"{name}_{key}_ms_blocks"] = [round(t * 1e3, 1) for t in ts]
    return out


def main():
    result = {"metric": "fused_stack_ab", "batch": BATCH}
    result.update(ab("steady", cached=True))
    print(json.dumps(result), flush=True)
    if os.getenv("ROUTEFORMER_BENCH_AB_COLD", "1") != "0":
        result.update(ab("cold", cached=False))
        print(json.dumps(result), flush=True)


if __name__ == "__main__":
    main()
