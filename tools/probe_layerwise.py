"""On-chip diagnosis of the layerwise train-mode fused-stack forward.

Stage-14 measured fwd rel 1.9e-1 vs the f32 oracle at bf16 (eval
monolithic: 1.2e-2; CPU interpret: exact). Bisection matrix: layerwise
kernel at f32 and bf16, with and without masks, small geometry first.
"""
import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))
import jax

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import jax.numpy as jnp
import numpy as np
from routeformer_tpu.ops import fusion_stack as fs


def weights(n, d, f, key):
    ks = jax.random.split(key, 16)
    def rnd(k, shape, s=0.2):
        return jax.random.normal(k, shape, jnp.float32) * s
    return fs.StackWeights(
        wq=rnd(ks[0], (n, d, d)), bq=rnd(ks[1], (n, d)),
        wk=rnd(ks[2], (n, d, d)), bk=rnd(ks[3], (n, d)),
        wv=rnd(ks[4], (n, d, d)), bv=rnd(ks[5], (n, d)),
        wout=rnd(ks[6], (n, d, d)), bout=rnd(ks[7], (n, d)),
        ln1_scale=1.0 + rnd(ks[8], (n, d), 0.05), ln1_bias=rnd(ks[9], (n, d)),
        wff1=rnd(ks[10], (n, d, f)), bff1=rnd(ks[11], (n, f)),
        wff2=rnd(ks[12], (n, f, d)), bff2=rnd(ks[13], (n, d)),
        ln2_scale=1.0 + rnd(ks[14], (n, d), 0.05),
        ln2_bias=rnd(ks[15], (n, d)),
    )


def run(name, r, l, d, f, n, p, bf16):
    import math
    key = jax.random.PRNGKey(3)
    u = min(int(5 * math.ceil(math.log(l))), l)
    w = weights(n, d, f, key)
    x = jax.random.normal(jax.random.fold_in(key, 1), (r, l, d), jnp.float32)
    cnt = fs.sample_count_matrices(jax.random.split(key, n), n, l, l, u)
    masks = (fs.make_dropout_masks(jax.random.fold_in(key, 2), n, r, l, d, f, p)
             if p else None)
    y_o = jax.jit(lambda x, wt: fs.stack_reference(
        x, fs.StackWeights(*wt), cnt, masks, heads=8, u=u, dropout_rate=p,
        compute_bf16=False))(x, tuple(w))
    y_k = jax.jit(lambda x, wt: fs._fused_stack(
        x, wt, cnt, masks, 8, u, p, "gelu", bf16, False))(x, tuple(w))
    scale = max(float(jnp.max(jnp.abs(y_o))), 1e-9)
    rel = float(jnp.max(jnp.abs(y_k - y_o))) / scale
    print(json.dumps({"case": name, "rel": round(rel, 6)}), flush=True)


t0 = time.time()
# train masks force the layerwise path; p=0 keeps the monolithic one
run("small_f32_masked", 8, 65, 128, 256, 2, 0.05, False)
run("small_bf16_masked", 8, 65, 128, 256, 2, 0.05, True)
run("small_f32_nomask", 8, 65, 128, 256, 2, 0.0, False)
run("flagship_f32_masked", 384, 65, 128, 256, 8, 0.05, False)
run("flagship_bf16_masked", 384, 65, 128, 256, 8, 0.05, True)
print(f"done in {time.time()-t0:.0f}s", file=sys.stderr)
