"""Probe the flagship SwinV2 backbone forward alone at given frame counts
on the chip (the batch-8 full step faults; isolated window kernels pass —
this narrows whether the fault lives in the compiled backbone forward).

Usage: python tools/probe_backbone.py [n_frames ...]   (default: 144 192)
"""

import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import jax.numpy as jnp  # noqa: E402


def main():
    from flax import nnx

    from __graft_entry__ import _flagship_config
    from routeformer_tpu.models.video_backbone import SwinV2
    from routeformer_tpu.utils import init_on_cpu

    cfg = _flagship_config()
    with init_on_cpu():
        backbone = SwinV2(
            cfg.video_backbone_config, rngs=nnx.Rngs(0, dropout=1)
        )
    graphdef, bb_state = nnx.split(backbone)

    @jax.jit
    def fwd(state, frames):
        m = nnx.merge(graphdef, state)
        return m(frames)

    rng = np.random.RandomState(0)
    for n in [int(a) for a in sys.argv[1:]] or [144, 192]:
        frames = jnp.asarray(
            rng.rand(n, 54, 96, 3).astype(np.float32)
        )  # step geometry: preprocess resizes to the 256 native size
        try:
            t0 = time.perf_counter()
            out = fwd(bb_state, frames)
            jax.block_until_ready(out)
            dt = time.perf_counter() - t0
            finite = bool(
                jnp.isfinite(
                    jax.tree_util.tree_leaves(out)[0].astype(jnp.float32)
                ).all()
            )
            print(f"frames={n}: {'PASS' if finite else 'NONFINITE'} "
                  f"({dt:.1f}s incl compile)", flush=True)
        except Exception as e:  # noqa: BLE001
            print(f"frames={n}: FAIL {type(e).__name__}: {str(e)[:300]}",
                  flush=True)
            break


if __name__ == "__main__":
    main()
