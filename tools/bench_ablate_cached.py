"""Steady-state (cached-embedding) step ablation: where the remaining wall
is after the round-3 masked ProbSparse formulation.

Same subtractive methodology as ``bench_ablate.py`` (component timings are
unreliable here; ablate inside a real train step), but on the
precomputed-embedding step that governs epochs 2..N. Variants cover the
three 8-layer d128 Perceive stacks (depth 8->1), the gaze stream, and the
dense-prediction head — the round-2 walls.

Usage: python tools/bench_ablate_cached.py  (TPU)
"""

import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from __graft_entry__ import _build_model, _flagship_config, _synthetic
from routeformer_tpu.models.video_backbone.cache import VideoFeaturePrecomputer
from routeformer_tpu.optimizers import build_optimizer
from routeformer_tpu.parallel import make_train_step
from routeformer_tpu.train import TrainingLosses, routeformer_training_loss

B = 16


def run_variant(name, **overrides):
    cfg = _flagship_config()
    if overrides:
        cfg = cfg.override(**overrides)
    model = _build_model(cfg)
    tx = build_optimizer(
        learning_rate=1e-5, weight_decay=1e-4, video_backbone_lr=1e-6,
        warmup_epochs=2, max_epochs=200, gradient_clip_val=2.5,
    )
    losses = TrainingLosses.from_config(cfg)

    def loss_fn(m, inp, tgt, epoch):
        return routeformer_training_loss(m, inp, tgt, epoch, losses)

    precompute = VideoFeaturePrecomputer(model)
    batch = _synthetic(cfg, batch_size=B, frame_hw=(54, 96), seed=7)
    inp_np = precompute(batch["train"])
    tgt_np = precompute(batch["target"])

    keys = {"gps"}
    if cfg.with_video and cfg.with_scene:
        keys |= {k for k in inp_np if "video_features" in k and "front" not in k}
    if cfg.with_gaze:
        keys |= {"gaze"} | {k for k in inp_np if k.startswith("front")}
    inp = {k: jnp.asarray(v) for k, v in inp_np.items() if k in keys}
    tgt = {k: jnp.asarray(v) for k, v in tgt_np.items() if k in keys}

    step_fn, params, st, opt = make_train_step(model, tx, loss_fn)
    epoch = jnp.asarray(20)

    for _ in range(2):
        params, st, opt, metrics = step_fn(params, st, opt, inp, tgt, epoch)
    jax.block_until_ready(metrics)
    t0 = time.perf_counter()
    n = 10
    for _ in range(n):
        params, st, opt, metrics = step_fn(params, st, opt, inp, tgt, epoch)
    jax.block_until_ready(metrics)
    dt = (time.perf_counter() - t0) / n
    assert np.isfinite(float(metrics["total_loss"]))
    print(f"{name}: {dt*1000:.1f} ms/step -> {B/dt:.1f} clips/s", flush=True)


if __name__ == "__main__":
    run_variant("full cached (video+gaze+dense)")
    run_variant("encoder_layers 8->1", encoder_layers=1)
    run_variant("decoder too 8->1", encoder_layers=1, cross_modal_decoder_layers=1)
    run_variant("no-dense", dense_prediction=False, dense_loss_ratio=0.0)
    run_variant("no-gaze", with_gaze=False, dense_prediction=False)
