"""On-chip A/B: fused SwinV2 block kernel vs the production block path.

Times one stage-2 block forward (C=512, H=16, n=256 tokens, shift=0 —
the measured cold-step wall: stage 2 is 381 ms of the 688 ms backbone
forward, docs/PERF.md) at the flagship frame count, interleaved timing
blocks in one process (tunnel-jitter immune, the bench_fused_ab pattern).

Path A: production SwinBlock (Pallas window-attention kernel + XLA
qkv/proj/MLP/LN glue). Path B: ops/swin_block_fusion.py — the whole block
in one Pallas grid pass. Parity is checked on-chip before timing.

Usage: python tools/probe_stage_fusion.py [frames] (TPU; default 672 =
the flagship step's frame count)
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

import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402
from flax import nnx  # noqa: E402

BLOCKS = int(os.getenv("AB_BLOCKS", "4"))
ITERS = int(os.getenv("AB_ITERS", "18"))  # 18 blocks = one stage-2 pass


def _note(msg):
    print(msg, file=sys.stderr, flush=True)


def main():
    frames = int(sys.argv[1]) if len(sys.argv) > 1 else 672
    c, h, win = 512, 16, 16
    n = win * win

    from routeformer_tpu.models.video_backbone.swin import SwinBlock

    blk = SwinBlock(
        c, h, win, shift=0, input_hw=(win, win), gelu_approximate=True,
        rngs=nnx.Rngs(0),
    )
    x = jax.random.normal(
        jax.random.PRNGKey(1), (frames, win, win, c), jnp.bfloat16
    )

    qkv_bias = jnp.concatenate(
        [blk.attn.q_bias[...], jnp.zeros((c,)), blk.attn.v_bias[...]]
    )
    params = {
        "wqkv": blk.attn.qkv.kernel[...],
        "bqkv": qkv_bias,
        "wproj": blk.attn.proj.kernel[...],
        "bproj": blk.attn.proj.bias[...],
        "ln1_scale": blk.norm1.scale[...],
        "ln1_bias": blk.norm1.bias[...],
        "wfc1": blk.fc1.kernel[...],
        "bfc1": blk.fc1.bias[...],
        "wfc2": blk.fc2.kernel[...],
        "bfc2": blk.fc2.bias[...],
        "ln2_scale": blk.norm2.scale[...],
        "ln2_bias": blk.norm2.bias[...],
        "logit_scale": jnp.exp(
            jnp.minimum(blk.attn.logit_scale[...], np.log(100.0))
        ).reshape(h),
    }
    bias = blk.attn.get_bias()

    graphdef, state = nnx.split(blk)

    @jax.jit
    def path_a(state, x):
        b = nnx.merge(graphdef, state)
        y = x
        for _ in range(ITERS):
            y = b(y)
        return y

    from routeformer_tpu.ops.swin_block_fusion import fused_swin_block_forward

    @jax.jit
    def path_b(params, bias, x):
        y = x.reshape(frames, n, c)
        for _ in range(ITERS):
            y = fused_swin_block_forward(
                y, params, n_heads=h, bias=bias, compute_bf16=True,
            )
        return y.reshape(frames, win, win, c)

    _note("compiling path A (production block)...")
    t0 = time.time()
    ya = jax.block_until_ready(path_a(state, x))
    _note(f"path A compile+run {time.time() - t0:.1f}s")
    _note("compiling path B (fused block kernel)...")
    t0 = time.time()
    yb = jax.block_until_ready(path_b(params, bias, x))
    _note(f"path B compile+run {time.time() - t0:.1f}s")

    scale = float(jnp.max(jnp.abs(ya.astype(jnp.float32)))) + 1e-9
    rel = float(
        jnp.max(jnp.abs(ya.astype(jnp.float32) - yb.astype(jnp.float32)))
    ) / scale
    _note(f"on-chip parity rel={rel:.3e} (both bf16 paths vs each other)")

    def timed(fn, *args):
        t0 = time.perf_counter()
        jax.block_until_ready(fn(*args))
        return time.perf_counter() - t0

    times = {"production": [], "fused": []}
    for _ in range(BLOCKS):
        times["production"].append(timed(path_a, state, x))
        times["fused"].append(timed(path_b, params, bias, x))
    med_a = statistics.median(times["production"])
    med_b = statistics.median(times["fused"])
    print(json.dumps({
        "metric": "swin_stage2_block_fusion_ab",
        "frames": frames,
        "iters_per_call": ITERS,
        "parity_rel": round(rel, 6),
        "production_ms_per_block": round(med_a / ITERS * 1e3, 3),
        "fused_ms_per_block": round(med_b / ITERS * 1e3, 3),
        "speedup": round(med_a / med_b, 3),
        "production_s_blocks": [round(t, 3) for t in times["production"]],
        "fused_s_blocks": [round(t, 3) for t in times["fused"]],
    }), flush=True)


if __name__ == "__main__":
    main()
