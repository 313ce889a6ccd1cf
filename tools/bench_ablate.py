"""Subtractive step-time analysis: full flagship step vs modality-ablated
variants. Component-level timings are unreliable on this platform
(independent repeat executions appear memoized); the donated-params chain in
a real train step serializes honestly, so we ablate there."""

import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")

from __graft_entry__ import _build_model, _flagship_config, _synthetic
from routeformer_tpu.optimizers import build_optimizer
from routeformer_tpu.parallel import make_train_step
from routeformer_tpu.train import TrainingLosses, routeformer_training_loss

B = 16


def run_variant(name, **overrides):
    cfg = _flagship_config()
    if overrides:
        cfg = cfg.override(**overrides)
    model = _build_model(cfg) if cfg.with_video else None
    if model is None:
        from flax import nnx

        from routeformer_tpu.models.gps_backbone import Informer
        from routeformer_tpu.models.routeformer import Routeformer

        model = Routeformer(cfg, gps_backbone=Informer, rngs=nnx.Rngs(0, dropout=1))

    tx = build_optimizer(
        learning_rate=1e-5, video_backbone_lr=1e-6 if cfg.with_video else None,
        warmup_epochs=2, max_epochs=200, gradient_clip_val=2.5,
    )
    losses = TrainingLosses.from_config(cfg)

    def loss_fn(m, inp, tgt, epoch):
        return routeformer_training_loss(m, inp, tgt, epoch, losses)

    step_fn, params, st, opt = make_train_step(model, tx, loss_fn)
    batch = _synthetic(cfg, batch_size=B, frame_hw=(54, 96), seed=7)
    keys = {"gps"}
    if cfg.with_video and cfg.with_scene:
        keys |= {"left_video", "right_video"}
    if cfg.with_gaze:
        keys |= {"front_video", "gaze"}
    inp = {k: jnp.asarray(v) for k, v in batch["train"].items() if k in keys}
    tgt = {k: jnp.asarray(v) for k, v in batch["target"].items() if k in keys}
    epoch = jnp.asarray(20)

    params, st, opt, metrics = step_fn(params, st, opt, inp, tgt, epoch)
    jax.block_until_ready(metrics)
    t0 = time.perf_counter()
    n = 3
    for _ in range(n):
        params, st, opt, metrics = step_fn(params, st, opt, inp, tgt, epoch)
    jax.block_until_ready(metrics)
    dt = (time.perf_counter() - t0) / n
    print(f"{name}: {dt*1000:.0f} ms/step -> {B/dt:.1f} clips/s", flush=True)


if __name__ == "__main__":
    run_variant("full (video+gaze+dense)")
    run_variant("no-dense", dense_prediction=False, dense_loss_ratio=0.0)
    run_variant("no-gaze", with_gaze=False, dense_prediction=False)
    run_variant("gps-only", with_video=False, with_gaze=False,
                dense_prediction=False, video_backbone_config=None)
