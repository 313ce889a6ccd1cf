"""On-chip f32-oracle parity for the fused SwinV2 block kernel.

The probe_stage_fusion number (3.76e-2) is the MUTUAL distance of two
bf16 paths over 18 chained blocks; this isolates the kernel against the
pure-XLA f32 twin on one block at stage-2 geometry, f32 and bf16.
"""
import json
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))
import jax

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import jax.numpy as jnp
import numpy as np
from routeformer_tpu.ops.swin_block_fusion import (
    fused_swin_block_forward,
    swin_block_reference,
)

sys.path.insert(0, str(Path(__file__).resolve().parent.parent / "tests"))
from test_swin_block_fusion import _params


def run(name, b, n, c, h, bf16, nw=1):
    key = jax.random.PRNGKey(1)
    p = _params(c, h, key)
    x = jax.random.normal(jax.random.fold_in(key, 1), (b, n, c), jnp.float32)
    bias_shape = (h, n, n) if nw == 1 else (nw, h, n, n)
    bias = jax.random.normal(jax.random.fold_in(key, 2), bias_shape,
                             jnp.float32)
    want = np.asarray(jax.jit(
        lambda x, p, bias: swin_block_reference(x, p, n_heads=h, bias=bias)
    )(x, p, bias))
    got = np.asarray(jax.jit(
        lambda x, p, bias: fused_swin_block_forward(
            x, p, n_heads=h, bias=bias, compute_bf16=bf16, interpret=False)
    )(x, p, bias))
    scale = float(np.max(np.abs(want))) + 1e-9
    rel = float(np.max(np.abs(got - want))) / scale
    print(json.dumps({"case": name, "rel": round(rel, 7)}), flush=True)


# stage-2 at f32 exceeds VMEM (f32 weights double the footprint); the
# f32 oracle case runs at stage-1 width instead.
run("c256_f32", 64, 256, 256, 8, False)
run("stage2_bf16", 64, 256, 512, 16, True)
run("stage0_shifted_bf16_nw16", 64, 256, 128, 4, True, nw=16)
