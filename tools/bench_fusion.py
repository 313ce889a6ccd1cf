"""Fusion-stack micro-benchmark (round-2 VERDICT #6).

The round-2 steady-state ablation showed the three 8-layer d128 Perceive
stacks are ~78% of the cached flagship step (latency-bound tiny ops under
scan). This tool times forward+backward of each stack in isolation at
flagship steady-state shapes, per ProbSparse formulation
(``ROUTEFORMER_PROBSPARSE=masked|dense|gather``), so formulation/kernel
changes can be attributed stack-by-stack.

Usage: python tools/bench_fusion.py            (TPU)
       ROUTEFORMER_PROBSPARSE=dense python tools/bench_fusion.py
"""

import json
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax  # noqa: E402

if os.getenv("BENCH_FUSION_CPU", "0") == "1":
    jax.config.update("jax_platforms", "cpu")
else:
    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402
from flax import nnx  # noqa: E402

# flagship steady-state geometry (reference full_comparison.py:264-282;
# SwinV2-base feature map (8, 8, 1024) -> 65 tokens/frame)
BATCH = 16
SEQ_LEN = 40
FRAMES = BATCH * (8 + 6) * 3  # 672: train+target frames x 3 views
FRAME_TOKENS = 8 * 8 + 1
FEAT_C = 1024
EMB, HIDDEN, HEADS, LAYERS, D_FF = 64, 64, 8, 8, 256
CM_HEADS, CM_LAYERS = 8, 2

N_WARMUP, N_TIMED = 2, 10


def _time(fn, *args):
    for _ in range(N_WARMUP):
        out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(N_TIMED):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / N_TIMED * 1e3  # ms


def _fwd_bwd(module):
    """fwd+bwd runner: merge at the jit trace level, differentiate with
    nnx.value_and_grad (plain jax.grad over the state pytree would mutate
    rng counters across trace levels — same pattern as
    parallel/train_step.py)."""
    graphdef, params, rest = nnx.split(module, nnx.Param, ...)

    def step(p, r, *xx):
        m = nnx.merge(graphdef, p, r)

        def compute_loss(mm):
            out = mm(*xx)
            out = out[0] if isinstance(out, tuple) else out
            return (out.astype(jnp.float32) ** 2).mean()

        loss, grads = nnx.value_and_grad(compute_loss)(m)
        _, _, new_r = nnx.split(m, nnx.Param, ...)
        return loss, grads, new_r

    step = jax.jit(step)
    box = {"r": rest}

    def run(*xx):
        _, grads, new_r = step(params, box["r"], *xx)
        box["r"] = new_r
        return grads

    return run


def main():
    from routeformer_tpu.models.cross_modal import (
        PerceiveDecoder,
        PerceiveEncoder,
    )
    from routeformer_tpu.utils import init_on_cpu

    rng = np.random.RandomState(0)
    dtype = jnp.bfloat16
    formulation = os.getenv("ROUTEFORMER_PROBSPARSE", "masked")

    with init_on_cpu():
        frame_enc = PerceiveEncoder(
            in_channels=FEAT_C, out_len=1, out_channels=EMB, n_heads=HEADS,
            layers=LAYERS, d_ff=D_FF, dropout=0.05,
            compute_dtype="bfloat16", rngs=nnx.Rngs(0, dropout=1),
        )
        video_enc = PerceiveEncoder(
            in_channels=EMB, out_len=SEQ_LEN, out_channels=HIDDEN,
            n_heads=HEADS, layers=LAYERS, d_ff=D_FF, dropout=0.05,
            compute_dtype="bfloat16", rngs=nnx.Rngs(2, dropout=3),
        )
        gaze_enc = PerceiveEncoder(
            in_channels=2, out_len=SEQ_LEN, out_channels=HIDDEN,
            n_heads=HEADS, layers=LAYERS, d_ff=D_FF, dropout=0.05,
            compute_dtype="bfloat16", rngs=nnx.Rngs(4, dropout=5),
        )
        gaze_dec = PerceiveDecoder(
            query_channels=HIDDEN, value_channels=HIDDEN, out_channels=HIDDEN,
            out_len=SEQ_LEN, dropout=0.05, d_ff=D_FF, n_heads=CM_HEADS,
            layers=CM_LAYERS, mix=False,
            compute_dtype="bfloat16", rngs=nnx.Rngs(6, dropout=7),
        )
    for m in (frame_enc, video_enc, gaze_enc, gaze_dec):
        m.train()

    frame_tokens = jnp.asarray(
        rng.randn(FRAMES, FRAME_TOKENS, FEAT_C), dtype=dtype
    )
    video_tokens = jnp.asarray(
        rng.randn(BATCH, 4 * SEQ_LEN, EMB), dtype=dtype
    )
    gaze_pos = jnp.asarray(rng.randn(BATCH, SEQ_LEN, 2), dtype=jnp.float32)
    gaze_q = jnp.asarray(rng.randn(BATCH, SEQ_LEN, HIDDEN), dtype=dtype)
    gaze_kv = jnp.asarray(rng.randn(BATCH, SEQ_LEN, HIDDEN), dtype=dtype)

    results = {"formulation": formulation, "unit": "ms fwd+bwd"}
    results["frame_encoder_672x65"] = round(
        _time(_fwd_bwd(frame_enc), frame_tokens), 3
    )
    results["video_encoder_16x160"] = round(
        _time(_fwd_bwd(video_enc), video_tokens), 3
    )
    results["gaze_encoder_16x40"] = round(
        _time(_fwd_bwd(gaze_enc), gaze_pos), 3
    )
    results["gaze_decoder_16x40"] = round(
        _time(_fwd_bwd(gaze_dec), gaze_kv, gaze_q), 3
    )
    results["total_ms"] = round(
        sum(v for k, v in results.items() if k.endswith(("65", "160", "40"))), 3
    )
    print(json.dumps(results))


if __name__ == "__main__":
    main()
