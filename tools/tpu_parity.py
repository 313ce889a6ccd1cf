"""On-TPU window-kernel parity check (round-2 VERDICT #7).

The Pallas ``flash_window_attention`` kernel is interpreter-mode tested on
CPU (tests/test_ops_attention.py), but a Mosaic-specific numeric regression
on real hardware would only trip bench.py's isfinite assert. This script
compares the kernel against the einsum cosine-attention formulation at the
flagship SwinV2 stage shapes ON THE CHIP — forward and gradients — and
prints one JSON line. Run it next to bench.py whenever the kernel changes;
record the pass in docs/PERF.md.

Tolerances are bf16-scale (the kernel computes scores/softmax in f32 but
streams q/k/v in bf16) and RELATIVE to the reference's own magnitude on
both sides: the outputs are unnormalized (|out| reaches ~5 with sharp
softmax at scale e^2, where one bf16 ulp is 0.03), so an absolute forward
tolerance mislabels sub-ulp rounding as failure — the first on-chip run
measured fwd_max_abs 0.010-0.014 with grad_rel 30-50x inside tolerance.
Forward: 1e-2 relative; gradients: 5e-2 relative.
"""

import json
import sys

import numpy as np

import jax

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import jax.numpy as jnp  # noqa: E402

sys.path.insert(0, "/root/repo")

# Flagship SwinV2-base stage geometry @256 (docs/PERF.md stage split);
# batch_windows trimmed to 256 — per-window numerics are batch-independent
# and the einsum reference's f32 score tensor must fit HBM.
STAGES = [
    # (name, heads, tokens, head_dim, n_window_kinds)
    ("stage0_w16_d128", 4, 256, 32, 16),
    ("stage1_w16_d256", 8, 256, 32, 4),
    ("stage2_w16_d512", 16, 256, 32, 1),
    ("stage3_w8_d1024", 32, 64, 32, 1),
]
BATCH_WINDOWS = 256
FWD_TOL = 1e-2
GRAD_TOL = 5e-2


def einsum_cosine(q, k, v, bias, scale):
    """Reference formulation (the swin einsum path: f32 normalize + scores)."""
    qf = q.astype(jnp.float32)
    kf = k.astype(jnp.float32)
    qn = qf / jnp.maximum(jnp.linalg.norm(qf, axis=-1, keepdims=True), 1e-6)
    kn = kf / jnp.maximum(jnp.linalg.norm(kf, axis=-1, keepdims=True), 1e-6)
    scores = jnp.einsum("bhnd,bhmd->bhnm", qn, kn) * scale[None, :, None, None]
    nb = bias.shape[0]
    b = q.shape[0]
    full_bias = jnp.tile(bias, (b // nb, 1, 1, 1))
    weights = jax.nn.softmax(scores + full_bias, axis=-1)
    return jnp.einsum("bhnm,bhmd->bhnd", weights, v.astype(jnp.float32))


def check_stage(name, heads, tokens, head_dim, n_kinds, rng):
    from routeformer_tpu.ops.flash_attention import flash_window_attention

    shape = (BATCH_WINDOWS, heads, tokens, head_dim)
    q = jnp.asarray(rng.randn(*shape), jnp.bfloat16)
    k = jnp.asarray(rng.randn(*shape), jnp.bfloat16)
    v = jnp.asarray(rng.randn(*shape), jnp.bfloat16)
    bias = jnp.asarray(
        rng.randn(n_kinds, heads, tokens, tokens) * 2.0, jnp.float32
    )
    scale = jnp.asarray(np.exp(rng.uniform(0, 2, heads)), jnp.float32)

    def kernel_loss(q, k, v):
        out = flash_window_attention(q, k, v, bias, scale, cosine=True)
        return (out.astype(jnp.float32) ** 2).mean()

    def ref_loss(q, k, v):
        out = einsum_cosine(q, k, v, bias, scale)
        return (out ** 2).mean()

    out_k = jax.jit(
        lambda a, b, c: flash_window_attention(a, b, c, bias, scale, cosine=True)
    )(q, k, v)
    out_r = jax.jit(lambda a, b, c: einsum_cosine(a, b, c, bias, scale))(q, k, v)
    fwd_diff = float(
        jnp.max(jnp.abs(out_k.astype(jnp.float32) - out_r))
    )
    fwd_scale = float(jnp.max(jnp.abs(out_r)))
    rel_fwd = fwd_diff / max(fwd_scale, 1e-12)

    gk = jax.jit(jax.grad(kernel_loss, argnums=(0, 1, 2)))(q, k, v)
    gr = jax.jit(jax.grad(ref_loss, argnums=(0, 1, 2)))(q, k, v)
    grad_diff = max(
        float(jnp.max(jnp.abs(a.astype(jnp.float32) - b.astype(jnp.float32))))
        for a, b in zip(gk, gr)
    )
    # gradients compared in the params' bf16 storage scale; normalize by the
    # reference grad magnitude so the tolerance is relative
    grad_scale = max(
        float(jnp.max(jnp.abs(b.astype(jnp.float32)))) for b in gr
    )
    rel_grad = grad_diff / max(grad_scale, 1e-12)
    return {
        "stage": name,
        "fwd_max_abs": round(fwd_diff, 6),
        "fwd_rel_max": round(rel_fwd, 6),
        "fwd_out_scale": round(fwd_scale, 3),
        "grad_rel_max": round(rel_grad, 6),
        "ok": bool(rel_fwd < FWD_TOL and rel_grad < GRAD_TOL),
    }


def main():
    backend = jax.default_backend()
    rng = np.random.RandomState(0)
    results = [check_stage(*stage, rng) for stage in STAGES]
    ok = all(r["ok"] for r in results)
    print(
        json.dumps(
            {
                "metric": "window_kernel_tpu_parity",
                "backend": backend,
                "ok": ok,
                "fwd_tol": FWD_TOL,
                "grad_rel_tol": GRAD_TOL,
                "stages": results,
            }
        )
    )
    if backend != "tpu":
        print("WARNING: not on TPU — this run does not validate Mosaic",
              file=sys.stderr)
    sys.exit(0 if ok else 1)


if __name__ == "__main__":
    main()
