"""Component-level timing of the flagship step on the real chip.

Times each stage in isolation to locate the bottleneck:
  backbone fwd | frame_encoder | video_encoder | gaze path | informer f+b
"""

import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np
from flax import nnx

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")

from __graft_entry__ import _build_model, _flagship_config, _synthetic

B = 16


def timeit(fn, *args, n=5):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / n


def main():
    cfg = _flagship_config()
    model = _build_model(cfg)
    # eval mode for the isolated parts: rng draws inside jitted closures over
    # concrete state would violate trace levels; timings are mode-agnostic
    model.eval()
    rng = np.random.default_rng(0)

    n_frames = B * 8  # fps-subsampled frames per view
    frames = jnp.asarray(
        rng.uniform(size=(n_frames, 54, 96, 3)).astype(np.float32)
    )

    graphdef, state = nnx.split(model)

    @jax.jit
    def backbone_fwd(state, frames):
        m = nnx.merge(graphdef, state)
        return m.video_backbone(frames)

    t = timeit(backbone_fwd, state, frames)
    print(f"backbone fwd ({n_frames} frames): {t*1000:.1f} ms")

    feat_h, feat_w, feat_c = model.video_backbone.output_feature_shape
    tokens = jnp.asarray(
        rng.normal(size=(n_frames, feat_h * feat_w + 1, feat_c)).astype(np.float32)
    )

    @jax.jit
    def frame_enc(state, tokens):
        m = nnx.merge(graphdef, state)
        return m.frame_encoder(tokens)

    t = timeit(frame_enc, state, tokens)
    print(f"frame_encoder ({n_frames} x {tokens.shape[1]} tokens): {t*1000:.1f} ms")

    fused_tokens = jnp.asarray(
        rng.normal(size=(B, 160, cfg.image_embedding_size)).astype(np.float32)
    )

    @jax.jit
    def video_enc(state, x):
        m = nnx.merge(graphdef, state)
        return m.video_encoder(x)

    t = timeit(video_enc, state, fused_tokens)
    print(f"video_encoder (B={B} x 160 tokens): {t*1000:.1f} ms")

    gps_in = jnp.asarray(
        rng.normal(size=(B, 40, cfg.gps_backbone_config.enc_in)).astype(np.float32)
    )

    @jax.jit
    def informer_fwd_bwd(state, x):
        m = nnx.merge(graphdef, state)

        def loss(x):
            return (m.gps_backbone(x) ** 2).mean()

        return jax.value_and_grad(loss)(x)

    t = timeit(informer_fwd_bwd, state, gps_in)
    print(f"informer fwd+bwd (B={B}): {t*1000:.1f} ms")

    # full train step for reference
    from routeformer_tpu.optimizers import build_optimizer
    from routeformer_tpu.parallel import make_train_step
    from routeformer_tpu.train import TrainingLosses, routeformer_training_loss

    model = _build_model(cfg)  # fresh train-mode model for the full step
    tx = build_optimizer(learning_rate=1e-5, video_backbone_lr=1e-6,
                         warmup_epochs=2, max_epochs=200, gradient_clip_val=2.5)
    losses = TrainingLosses.from_config(cfg)

    def loss_fn(m, inp, tgt, epoch):
        return routeformer_training_loss(m, inp, tgt, epoch, losses)

    step_fn, params, st, opt_state = make_train_step(model, tx, loss_fn)
    batch = _synthetic(cfg, batch_size=B, frame_hw=(54, 96), seed=7)
    inp = {k: jnp.asarray(v) for k, v in batch["train"].items()}
    tgt = {k: jnp.asarray(v) for k, v in batch["target"].items()}
    epoch = jnp.asarray(20)

    params, st, opt_state, metrics = step_fn(params, st, opt_state, inp, tgt, epoch)
    jax.block_until_ready(metrics)
    t0 = time.perf_counter()
    for _ in range(3):
        params, st, opt_state, metrics = step_fn(params, st, opt_state, inp, tgt, epoch)
    jax.block_until_ready(metrics)
    t = (time.perf_counter() - t0) / 3
    print(f"full train step (B={B}): {t*1000:.1f} ms -> {B/t:.1f} clips/s")


if __name__ == "__main__":
    main()
