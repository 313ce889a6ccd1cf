"""On-chip parity check for the fused Perceive-stack kernel.

Runs the Mosaic-compiled kernel (fwd + custom-VJP bwd) against the pure-XLA
twin at the flagship fusion geometries (frame encoder L=65, video encoder
L=160, gaze encoder L=40; d128/F256/H8, 8 layers) and prints one JSON line.
Both the kernel and the bf16 twin are scored against the f32 reference; a
stage passes when the kernel's error stays within ``ORACLE_MARGIN`` of the
twin's own bf16 error (or under the absolute tolerance) — two bf16
programs that round differently drift apart through 8 layers, so
kernel-vs-twin distance alone is not a parity signal.

Usage: python tools/fusion_kernel_parity.py   (TPU)

``FUSION_PARITY_STAGES=frame_L65_eval,frame_L65_train`` limits the run to a
stage subset: tunnel compiles of the fused kernel run 20+ min each, so a
bounded run can cover the stages one invocation at a time — the persistent
compilation cache makes later invocations resume where the last one died.
Progress (per-phase compile/run timings) goes to stderr so an external
watchdog can tell a slow compile from a hang.
"""

import json
import math
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax  # noqa: E402

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

from routeformer_tpu.ops import fusion_stack as fs  # noqa: E402

FWD_TOL = 2e-2
GRAD_TOL = 5e-2
# The fused kernel and the bf16 XLA twin round differently through 8
# layers, so their mutual distance compounds past any fixed bf16-scale
# tolerance (measured 1.18e-2 at L=65 eval). Parity therefore means "the
# kernel is as accurate as the twin": both are measured against the f32
# reference (compute_bf16=False — compiles in seconds; only Mosaic kernel
# compiles are tunnel-slow) and the kernel must stay within ORACLE_MARGIN
# of the twin's own bf16 error, or under the absolute tolerance.
#
# Round-5 caveat: on the axon terminal, XLA_FLAGS carries
# --xla_allow_excess_precision=true, which lets XLA elide the twin's bf16
# casts — the "bf16 twin" then computes in f32 and its oracle error reads
# 0 (measured: twin 0.0, kernel 1.175e-2 at L=65 eval, .logs/
# fusion_parity_frame_L65_eval.log). The oracle-margin criterion is void
# in that regime, so the absolute FWD_TOL carries the gate; it is set to
# bf16-accumulation scale for an 8-layer stack (8 layers x ~2^-8 relative
# per layer ~ 3e-2 worst case; the measured kernel drift is 1.2e-2).
ORACLE_MARGIN = 1.5

_T0 = time.monotonic()


def _note(msg):
    print(f"[parity +{time.monotonic() - _T0:7.1f}s] {msg}",
          file=sys.stderr, flush=True)


def _weights(n, d, f, key):
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
        ln2_scale=1.0 + rnd(ks[14], (n, d), 0.05), ln2_bias=rnd(ks[15], (n, d)),
    )


def check(name, r, l, d, f, n, train, key):
    u = min(int(5 * math.ceil(math.log(l))), l)
    w = _weights(n, d, f, key)
    x = jax.random.normal(jax.random.fold_in(key, 1), (r, l, d), jnp.float32)
    cnt = fs.sample_count_matrices(jax.random.split(key, n), n, l, l, u)
    p = 0.05 if train else 0.0
    masks = (
        fs.make_dropout_masks(jax.random.fold_in(key, 2), n, r, l, d, f, p)
        if train
        else None
    )

    def twin(x, wt):
        return fs.stack_reference(
            x, fs.StackWeights(*wt), cnt, masks, heads=8, u=u,
            dropout_rate=p, compute_bf16=True,
        )

    def oracle(x, wt):
        return fs.stack_reference(
            x, fs.StackWeights(*wt), cnt, masks, heads=8, u=u,
            dropout_rate=p, compute_bf16=False,
        )

    interp = os.environ.get("FUSION_PARITY_INTERPRET", "0") == "1"
    # FUSION_PARITY_IMPL=hybrid checks the Mosaic-fwd + XLA-recompute-bwd
    # path (the variant whose backward needs no Mosaic compile).
    impl = (
        fs._fused_stack_hybrid
        if os.environ.get("FUSION_PARITY_IMPL") == "hybrid"
        else fs._fused_stack
    )

    def kern(x, wt):
        return impl(
            x, wt, cnt, masks, 8, u, p, "gelu", True, interp
        )

    _note(f"{name}: twin fwd compile+run")
    y_t = jax.block_until_ready(jax.jit(twin)(x, tuple(w)))
    _note(f"{name}: oracle (f32 twin) fwd compile+run")
    y_o = jax.block_until_ready(jax.jit(oracle)(x, tuple(w)))
    _note(f"{name}: kernel fwd compile+run")
    y_k = jax.block_until_ready(jax.jit(kern)(x, tuple(w)))
    fwd_scale = max(float(jnp.max(jnp.abs(y_o))), 1e-12)
    fwd_kernel = float(jnp.max(jnp.abs(y_k - y_o))) / fwd_scale
    fwd_twin = float(jnp.max(jnp.abs(y_t - y_o))) / fwd_scale
    _note(
        f"{name}: fwd rel vs oracle — kernel {fwd_kernel:.3e}, "
        f"twin {fwd_twin:.3e}"
    )

    def loss_t(x, wt):
        return jnp.sum(jnp.sin(twin(x, wt)))

    def loss_o(x, wt):
        return jnp.sum(jnp.sin(oracle(x, wt)))

    def loss_k(x, wt):
        return jnp.sum(jnp.sin(kern(x, wt)))

    _note(f"{name}: twin grad compile+run")
    gt = jax.block_until_ready(
        jax.jit(jax.grad(loss_t, argnums=(0, 1)))(x, tuple(w))
    )
    _note(f"{name}: oracle grad compile+run")
    go = jax.block_until_ready(
        jax.jit(jax.grad(loss_o, argnums=(0, 1)))(x, tuple(w))
    )
    _note(f"{name}: kernel grad compile+run")
    gk = jax.block_until_ready(
        jax.jit(jax.grad(loss_k, argnums=(0, 1)))(x, tuple(w))
    )
    _note(f"{name}: grads done")
    gx_scale = max(float(jnp.max(jnp.abs(go[0]))), 1e-12)
    gx_kernel = float(jnp.max(jnp.abs(gk[0] - go[0]))) / gx_scale
    gx_twin = float(jnp.max(jnp.abs(gt[0] - go[0]))) / gx_scale
    gw_scale = max(
        float(max(jnp.max(jnp.abs(a)) for a in go[1])), 1e-12
    )
    gw_kernel = (
        float(max(jnp.max(jnp.abs(a - b)) for a, b in zip(gk[1], go[1])))
        / gw_scale
    )
    gw_twin = (
        float(max(jnp.max(jnp.abs(a - b)) for a, b in zip(gt[1], go[1])))
        / gw_scale
    )
    _note(
        f"{name}: grad rel vs oracle — dx kernel {gx_kernel:.3e} twin "
        f"{gx_twin:.3e}; dw kernel {gw_kernel:.3e} twin {gw_twin:.3e}"
    )

    def _ok(kernel_err, twin_err, tol):
        return kernel_err < max(tol, ORACLE_MARGIN * twin_err)

    return {
        "stage": name,
        "fwd_rel_max": round(fwd_kernel, 6),
        "fwd_twin_rel_max": round(fwd_twin, 6),
        "dx_rel_max": round(gx_kernel, 6),
        "dx_twin_rel_max": round(gx_twin, 6),
        "dw_rel_max": round(gw_kernel, 6),
        "dw_twin_rel_max": round(gw_twin, 6),
        "ok": bool(
            _ok(fwd_kernel, fwd_twin, FWD_TOL)
            and _ok(gx_kernel, gx_twin, GRAD_TOL)
            and _ok(gw_kernel, gw_twin, GRAD_TOL)
        ),
    }


def main():
    key = jax.random.PRNGKey(0)
    specs = [
        ("frame_L65_eval", 384, 65, 128, 256, 8, False, key),
        ("frame_L65_train", 384, 65, 128, 256, 8, True,
         jax.random.fold_in(key, 10)),
        ("video_L160_train", 16, 160, 128, 256, 8, True,
         jax.random.fold_in(key, 20)),
        ("gaze_L40_train", 16, 40, 128, 256, 8, True,
         jax.random.fold_in(key, 30)),
    ]
    only = os.environ.get("FUSION_PARITY_STAGES")
    if only:
        wanted = {s.strip() for s in only.split(",") if s.strip()}
        unknown = wanted - {s[0] for s in specs}
        if unknown:
            raise SystemExit(f"unknown FUSION_PARITY_STAGES: {sorted(unknown)}")
        specs = [s for s in specs if s[0] in wanted]
    stages = [check(*s) for s in specs]
    out = {
        "metric": "fusion_stack_kernel_parity",
        "backend": jax.default_backend(),
        "ok": all(s["ok"] for s in stages),
        "fwd_rel_tol": FWD_TOL,
        "grad_rel_tol": GRAD_TOL,
        "oracle_margin": ORACLE_MARGIN,
        "stages": stages,
    }
    print(json.dumps(out), flush=True)
    return 0 if out["ok"] else 1


if __name__ == "__main__":
    raise SystemExit(main())
