"""Fixture-data accuracy proxy for the cold-step ablation levers.

The 192-px geometry and head-dim repacking levers (docs/PERF.md) change
the SwinV2 architecture, so perf wins need accuracy evidence. Full-scale
training needs real GEM data (unavailable here); this proxy trains the
flagship model SHAPE (Routeformer + SwinV2 + gaze fusion + Informer) at
tiny-preset scale on the correlated synthetic generator
(`io/synthetic.py` — video phase tracks future heading, so the visual
stream carries predictive signal) and compares learning dynamics across
lever variants:

- ``baseline``: tiny preset as-is (heads (2,4), d=8; 32 px).
- ``heads``: ``ROUTEFORMER_SWIN_HEADS=16`` — the tiny analog of the
  d32->d64 repack (heads (1,2), d=16; same widths/FLOPs).
- ``geometry``: the 64-px parity preset — the tiny analog of training at
  a different pre-training geometry (256 -> 192).
- ``bf16``: ``RouteformerConfig(compute_dtype="bfloat16")`` — the
  COMPUTE_DTYPE=bfloat16 driver lever (fusion stack in bf16, params/
  norms/softmax f32; +11%% measured on the flagship step).

A lever "passes" the proxy when its train-loss curve and held-out ADE
land in the same band as the baseline (same data, same seeds, same
step count). Run: ``python tools/ablate_accuracy_proxy.py [steps]``.
CPU-safe (forces the cpu platform first; coexists with a TPU job).
"""

import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402
from flax import nnx  # noqa: E402


def build_model(variant: str):
    from routeformer_tpu.models import Routeformer, RouteformerConfig
    from routeformer_tpu.models.gps_backbone import GPSBackboneConfig, Informer
    from routeformer_tpu.models.video_backbone import (
        SwinV2Backbone,
        TimmBackboneConfig,
    )

    os.environ.pop("ROUTEFORMER_SWIN_HEADS", None)
    model_type = "swinv2_tiny_test"
    if variant == "heads":
        os.environ["ROUTEFORMER_SWIN_HEADS"] = "16"
    elif variant == "geometry":
        model_type = "swinv2_parity_test"
    # "bf16": COMPUTE_DTYPE=bfloat16 — the fusion-stack bf16 compute lever
    # (driver default gate, VERDICT round-4 weak #5). Params/norms/softmax
    # stay f32; only the Perceive/attention matmuls run bf16.

    cfg = RouteformerConfig(
        gps_backbone_config=GPSBackboneConfig(
            seq_len=40, label_len=40, pred_len=30, d_model=32, n_heads=4,
            e_layers=2, d_layers=1, d_ff=64, factor=4, dropout=0.05,
            activation="gelu",
        ),
        video_backbone_config=TimmBackboneConfig(
            model_type=model_type, cache_enabled=False,
            compute_dtype="float32",
        ),
        with_video=True, with_gaze=True,
        discount_factor={0: 0.97}, epsilon=1.0,
        compute_dtype="bfloat16" if variant == "bf16" else "float32",
        encoder_hidden_size=32, encoder_heads=4, encoder_layers=2,
        encoder_d_ff=64, cross_modal_decoder_heads=4,
        cross_modal_decoder_layers=1, image_embedding_size=32,
        output_fps=5, video_fps=1, gaze_fps=5,
    )
    model = Routeformer(
        cfg, gps_backbone=Informer, video_backbone=SwinV2Backbone,
        rngs=nnx.Rngs(0, dropout=1),
    )
    return cfg, model


def batches(n, batch_size, seed0):
    from routeformer_tpu.io.synthetic import synthetic_batch

    out = []
    for i in range(n):
        b = synthetic_batch(
            seed=seed0 + i, batch_size=batch_size, seq_len=40, pred_len=30,
            with_video=True, with_gaze=True, frame_hw=(24, 32),
        )
        # video at 1 fps on the 5 Hz grid: the model subsamples internally;
        # gaze stream consumes the front video at gaze_fps=5 (full grid)
        out.append(
            (
                {k: jnp.asarray(v) for k, v in b["train"].items()},
                {k: jnp.asarray(v) for k, v in b["target"].items()},
            )
        )
    return out


def run_variant(variant: str, steps: int, batch_size: int = 4):
    from routeformer_tpu.optimizers import build_optimizer
    from routeformer_tpu.parallel import make_train_step
    from routeformer_tpu.score.error import ade, fde
    from routeformer_tpu.train import (
        TrainingLosses,
        routeformer_training_loss,
    )

    cfg, model = build_model(variant)
    # graphdef captured BEFORE the first (donating) step — the live
    # model's buffers are donated by step_fn (CLAUDE.md)
    graphdef, _, _ = nnx.split(model, nnx.Param, ...)
    tx = build_optimizer(
        learning_rate=1e-4, video_backbone_lr=1e-6, warmup_epochs=0,
        max_epochs=10, gradient_clip_val=2.5,
    )
    losses = TrainingLosses.from_config(cfg)

    def loss_fn(m, inp, tgt, epoch):
        return routeformer_training_loss(m, inp, tgt, epoch, losses)

    step_fn, params, state, opt_state = make_train_step(model, tx, loss_fn)

    train_batches = batches(8, batch_size, seed0=1000)
    val_inp, val_tgt = batches(1, batch_size, seed0=9000)[0]

    curve = []
    for s in range(steps):
        inp, tgt = train_batches[s % len(train_batches)]
        params, state, opt_state, metrics = step_fn(
            params, state, opt_state, inp, tgt, jnp.asarray(0)
        )
        loss = float(metrics["total_loss"])
        curve.append(round(loss, 4))

    m_eval = nnx.merge(graphdef, params, state)
    m_eval.eval()
    pred = m_eval(val_inp)
    gps = pred["gps"] if isinstance(pred, dict) else pred
    n_tb = 8  # batches() count below — one "epoch" = one pass over them
    epoch_curve = [
        round(float(np.mean(curve[i : i + n_tb])), 4)
        for i in range(0, len(curve) - n_tb + 1, n_tb)
    ]
    return {
        "variant": variant,
        "epoch_loss_curve": epoch_curve,
        "loss_last_epoch": epoch_curve[-1] if epoch_curve else None,
        "val_ade": round(float(ade(gps, val_tgt["gps"])), 4),
        "val_fde": round(float(fde(gps, val_tgt["gps"])), 4),
        "curve": curve,
    }


def main():
    steps = int(sys.argv[1]) if len(sys.argv) > 1 else 64
    variants = sys.argv[2:] or ["baseline", "heads", "geometry", "bf16"]
    results = []
    for v in variants:
        r = run_variant(v, steps)
        results.append(r)
        print(json.dumps(r), flush=True)
    if len(results) > 1:
        base = results[0]
        for r in results[1:]:
            ratio = (
                r["loss_last_epoch"] / base["loss_last_epoch"]
                if base["loss_last_epoch"]
                else float("nan")
            )
            print(
                json.dumps(
                    {
                        "compare": f"{r['variant']}/{base['variant']}",
                        "loss_ratio": round(ratio, 3),
                        "ade_delta": round(
                            r["val_ade"] - base["val_ade"], 4
                        ),
                    }
                ),
                flush=True,
            )


if __name__ == "__main__":
    main()
