"""Selection-flip analysis of the fused-stack on-chip error.

Theory (probe_layerwise round 1): f32 and bf16 give bit-identical rel
errors, dw is fine while dx/fwd blow up on a few entries -> the error is
DISCRETE: near-threshold ProbSparse rows select dense-vs-context
differently between the kernel's and XLA's float orderings, and a flipped
row diverges wholesale through the remaining layers. This probe measures
the per-ROW error distribution: if a small fraction of rows carries all
the error and the rest match to bf16 scale, the selection-flip theory is
confirmed (and parity should be judged on non-flipped rows + flip rate,
the only honest criterion for a discrete-selection op).
"""
import json
import math
import sys
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


def run(name, r, l, d, f, n, p):
    key = jax.random.PRNGKey(3)
    u = min(int(5 * math.ceil(math.log(l))), l)
    w = weights(n, d, f, key)
    x = jax.random.normal(jax.random.fold_in(key, 1), (r, l, d), jnp.float32)
    cnt = fs.sample_count_matrices(jax.random.split(key, n), n, l, l, u)
    masks = (fs.make_dropout_masks(jax.random.fold_in(key, 2), n, r, l, d, f, p)
             if p else None)
    y_o = np.asarray(jax.jit(lambda x, wt: fs.stack_reference(
        x, fs.StackWeights(*wt), cnt, masks, heads=8, u=u, dropout_rate=p,
        compute_bf16=False))(x, tuple(w)))
    y_k = np.asarray(jax.jit(lambda x, wt: fs._fused_stack(
        x, wt, cnt, masks, 8, u, p, "gelu", False, False))(x, tuple(w)))
    scale = max(float(np.max(np.abs(y_o))), 1e-9)
    per_row = np.max(np.abs(y_k - y_o), axis=(1, 2)) / scale  # (R,)
    bad = per_row > 5e-3
    out = {
        "case": name,
        "rows": int(r),
        "flipped_rows": int(bad.sum()),
        "flip_rate": round(float(bad.mean()), 4),
        "good_row_rel_max": round(float(per_row[~bad].max()) if (~bad).any()
                                  else -1.0, 6),
        "bad_row_rel_max": round(float(per_row.max()), 6),
    }
    print(json.dumps(out), flush=True)


run("flagship_f32_masked", 384, 65, 128, 256, 8, 0.05)
run("small_f32_nomask", 8, 65, 128, 256, 2, 0.0)
run("flagship_f32_eval", 384, 65, 128, 256, 8, 0.0)
