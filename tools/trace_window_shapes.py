"""Trace-only: record every flash_window_attention call shape in the
flagship step at a given batch size (CPU, jax.eval_shape — no execution).

The batch-8 step faults the TPU worker while batch 16 runs; the window
kernel is the faulting component (step_at_batch.py bisect). This collects
the exact (B_windows, H, N, NB) set per batch size so the faulting grid
can be probed in isolation.

Usage: python tools/trace_window_shapes.py 8 16
"""

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax

jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp  # noqa: E402

SHAPES = []


def main():
    import routeformer_tpu.models.video_backbone.swin as swin
    from routeformer_tpu.ops import flash_attention as fa

    # Force the dispatch decision to the pure threshold (the CPU backend
    # guard would skip the kernel path entirely).
    orig_dispatch = swin._use_window_flash

    def dispatch(batch_windows, tokens, mode=None):
        return batch_windows * tokens * tokens >= 1 << 22

    swin._use_window_flash = dispatch

    orig_kernel = fa.flash_window_attention

    def recording_kernel(q, k, v, bias, scale=None, cosine=False):
        SHAPES.append(
            (q.shape[0], q.shape[1], q.shape[2], bias.shape[0])
        )
        return fa._reference_window_attention(
            q, k, v, bias,
            scale if scale is not None
            else jnp.ones((q.shape[1],), jnp.float32),
            cosine,
        )

    # patch the name the call site imports (it imports inside __call__)
    fa.flash_window_attention = recording_kernel

    from __graft_entry__ import _synthetic
    from bench_core import _build_step

    cfg, _, step_fn, params, state, opt_state = _build_step()

    for batch in [int(a) for a in sys.argv[1:]] or [8, 16]:
        SHAPES.clear()
        b = _synthetic(cfg, batch_size=batch, frame_hw=(54, 96), seed=7)
        inp = {k: jnp.asarray(v) for k, v in b["train"].items()}
        tgt = {k: jnp.asarray(v) for k, v in b["target"].items()}
        jax.eval_shape(
            step_fn, params, state, opt_state, inp, tgt, jnp.asarray(0)
        )
        uniq = sorted(set(SHAPES))
        print(f"batch={batch}: {len(SHAPES)} calls, shapes (B,H,N,NB):")
        for s in uniq:
            print("   ", s)


if __name__ == "__main__":
    main()
