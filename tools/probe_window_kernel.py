"""Probe flash_window_attention forward at specific (B, H, N, NB) shapes
on the chip, one pallas_call per shape, printing PASS/FAIL per shape.

Shapes default to the batch-8 flagship step set (trace_window_shapes.py),
which faults the TPU worker inside the full step, plus one batch-16
control shape known-good from bench.py.

Usage: python tools/probe_window_kernel.py [b,h,n,nb ...]
"""

import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import jax.numpy as jnp  # noqa: E402

DEFAULT = [
    (288, 16, 256, 1),   # batch-16 control (stage2, works in bench)
    (144, 16, 256, 1),
    (192, 16, 256, 1),
    (576, 8, 256, 1),
    (576, 8, 256, 4),
    (768, 8, 256, 1),
    (768, 8, 256, 4),
    (2304, 4, 256, 1),
    (2304, 4, 256, 16),
    (3072, 4, 256, 1),
    (3072, 4, 256, 16),
]


def main():
    from routeformer_tpu.ops.flash_attention import flash_window_attention

    shapes = (
        [tuple(int(x) for x in a.split(",")) for a in sys.argv[1:]]
        or DEFAULT
    )
    rng = np.random.RandomState(0)
    d = 32
    for (b, h, n, nb) in shapes:
        q = jnp.asarray(rng.randn(b, h, n, d), jnp.bfloat16)
        k = jnp.asarray(rng.randn(b, h, n, d), jnp.bfloat16)
        v = jnp.asarray(rng.randn(b, h, n, d), jnp.bfloat16)
        bias = jnp.asarray(rng.randn(nb, h, n, n), jnp.float32)
        scale = jnp.asarray(np.exp(rng.uniform(0, 2, h)), jnp.float32)
        try:
            out = jax.jit(
                lambda a, b_, c: flash_window_attention(
                    a, b_, c, bias, scale, cosine=True
                )
            )(q, k, v)
            jax.block_until_ready(out)
            finite = bool(jnp.isfinite(out.astype(jnp.float32)).all())
            print(f"B={b} H={h} N={n} NB={nb}: "
                  f"{'PASS' if finite else 'NONFINITE'}", flush=True)
        except Exception as e:  # noqa: BLE001
            print(f"B={b} H={h} N={n} NB={nb}: FAIL {type(e).__name__}: "
                  f"{str(e)[:200]}", flush=True)
            # the worker may be dead after a kernel fault — stop here
            break


if __name__ == "__main__":
    main()
