"""End-to-end benchmark: flagship Routeformer train-step clips/sec/chip.

Prints ONE JSON line:
  {"metric": "...", "value": N, "unit": "clips/sec/chip", "vs_baseline": N}

- value: clips/sec for the FULL flagship training step (video + gaze + GPS
  fusion forward, loss, backward, AdamW update) on the attached TPU chip,
  with the frozen video backbone in the step (no embedding cache), batch 16,
  GEM task geometry (40-in/30-out @5 Hz, video_fps=1 -> 8 frames per view).
- vs_baseline: ratio against a FLOP-matched PyTorch implementation of the
  same step measured on this host's CPU (the reference repo publishes no
  numbers and no CUDA device exists here — see BASELINE.md). The proxy uses
  identical geometry: ViT-B/16@256 backbone under no_grad (frozen), Informer
  -sized transformer trained. If torch measurement fails, vs_baseline is 0.
"""

import json
import sys
import time

import numpy as np


def _enable_compilation_cache():
    """Persist compiled programs across runs (first flagship compile is
    minutes on the tunnel; subsequent runs hit the disk cache)."""
    try:
        import jax

        jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception as e:  # noqa: BLE001
        print(f"compilation cache unavailable: {e}", file=sys.stderr)


_enable_compilation_cache()

BATCH = 16
FRAME_HW = (54, 96)  # synthetic frames; backbone resizes to 256x256 anyway
N_WARMUP = 2
N_TIMED = 5


def bench_jax() -> float:
    import jax
    import jax.numpy as jnp

    from __graft_entry__ import _build_model, _flagship_config, _synthetic
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

    step_fn, params, state, opt_state = make_train_step(model, tx, loss_fn)

    batch = _synthetic(cfg, batch_size=BATCH, frame_hw=FRAME_HW, seed=7)
    inp = {k: jnp.asarray(v) for k, v in batch["train"].items()}
    tgt = {k: jnp.asarray(v) for k, v in batch["target"].items()}
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
    return BATCH / dt


def bench_torch_proxy() -> float:
    """FLOP-matched torch step on one clip, CPU. Returns clips/sec."""
    import torch

    torch.set_num_threads(max(1, torch.get_num_threads()))

    class Block(torch.nn.Module):
        def __init__(self, d, h):
            super().__init__()
            self.n1 = torch.nn.LayerNorm(d)
            self.n2 = torch.nn.LayerNorm(d)
            self.attn = torch.nn.MultiheadAttention(d, h, batch_first=True)
            self.fc1 = torch.nn.Linear(d, 4 * d)
            self.fc2 = torch.nn.Linear(4 * d, d)

        def forward(self, x):
            y = self.n1(x)
            x = x + self.attn(y, y, y, need_weights=False)[0]
            return x + self.fc2(torch.nn.functional.gelu(self.fc1(self.n2(x))))

    class ViTProxy(torch.nn.Module):
        def __init__(self):
            super().__init__()
            self.patch = torch.nn.Conv2d(3, 768, 16, 16)
            self.blocks = torch.nn.ModuleList([Block(768, 12) for _ in range(12)])

        def forward(self, x):
            x = self.patch(x).flatten(2).transpose(1, 2)
            for b in self.blocks:
                x = b(x)
            return x

    # 8 frames x (left + right + front) views per clip, resized to 256.
    frames = torch.randn(24, 3, 256, 256)
    backbone = ViTProxy().eval()

    # Informer-sized trainable stack: 6 enc layers d832 on 40 tokens + 1 dec
    # layer on 70, plus the 8-layer d64 fusion encoder on 121 frame tokens.
    informer = torch.nn.ModuleList(
        [Block(832, 8) for _ in range(7)] + [Block(64, 8) for _ in range(8)]
    )
    proj_in = torch.nn.Linear(69, 832)
    proj_out = torch.nn.Linear(832, 66)
    params = (
        list(informer.parameters())
        + list(proj_in.parameters())
        + list(proj_out.parameters())
    )
    opt = torch.optim.AdamW(params, lr=1e-5, weight_decay=1e-4)

    def one_clip():
        with torch.no_grad():
            feats = backbone(frames)  # frozen backbone, like the reference
        fusion_tokens = feats.mean(1).reshape(1, 24, 768)[..., :64]
        x = fusion_tokens
        for b in informer[7:]:
            x = b(x)
        seq = torch.randn(1, 70, 69)
        y = proj_in(seq)
        for b in informer[:7]:
            y = b(y)
        out = proj_out(y)
        loss = (out**2).mean() + (x**2).mean()
        opt.zero_grad()
        loss.backward()
        opt.step()

    one_clip()  # warmup
    t0 = time.perf_counter()
    one_clip()
    dt = time.perf_counter() - t0
    return 1.0 / dt


def main():
    value = bench_jax()
    try:
        torch_clips = bench_torch_proxy()
    except Exception as e:  # noqa: BLE001
        print(f"torch proxy failed: {e}", file=sys.stderr)
        torch_clips = 0.0
    vs_baseline = value / torch_clips if torch_clips > 0 else 0.0
    print(
        json.dumps(
            {
                "metric": "flagship_train_step_clips_per_sec_per_chip",
                "value": round(value, 3),
                "unit": "clips/sec/chip",
                "vs_baseline": round(vs_baseline, 3),
            }
        )
    )


if __name__ == "__main__":
    main()
