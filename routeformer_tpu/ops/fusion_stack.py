"""Fused Perceive-encoder stack: one Pallas kernel for N transformer layers.

The cross-modal fusion stacks (``models/cross_modal.py`` —
``PerceiveEncoder``: 8 identical d128 ProbSparse self-attention layers; the
reference builds them in ``routeformer/models/cross_modal_transformer.py:372-433``)
are the steady-state training wall: per layer, the masked-ProbSparse
formulation materializes dense ``(R, H, L, L)`` f32 score/softmax tensors
through HBM and XLA stores them again as autodiff residuals — at flagship
geometry (R=384 frames, L=65 tokens) that is ~100 MB per layer per
direction while the layer's useful matmul work is microseconds
(docs/PERF.md round-2/round-4 ablations: the stacks run ~50x off their FLOP
floor, latency/bandwidth-bound, and batch scaling saturates at 16).

This kernel runs the ENTIRE stack for a chunk of rows in one grid step:

- activations stay in VMEM across all N layers — scores, softmax, the
  ProbSparse selection, LayerNorms and the FFN never touch HBM;
- all N layers' weights (~2 MB bf16 at d128/F256) are VMEM-resident for
  the whole kernel (constant block index => fetched once);
- the backward pass is a second Pallas kernel over the same chunk layout
  that recomputes each layer's internals from the saved layer *inputs*
  (the only residual that leaves the forward kernel) and accumulates
  weight gradients across sequential grid steps in f32.

ProbSparse (masked formulation, ``ops/attention.py:176-204``) is computed
without gathers — TPU-unfriendly row-dependent gathers are replaced by
exact algebraic equivalents:

- the sampled-key sum (samples drawn WITH replacement, reference
  cross_modal_transformer.py:88-117) is an elementwise product with a
  per-layer COUNT matrix ``cnt[q, k] = #{s : idx[q, s] = k}`` + row-sum;
- the sampled-key max is a row-max over ``where(cnt > 0, qk, -inf)``
  (duplicates cannot change a max);
- the top-u selection ``m >= (u-th largest m)`` is the rank test
  ``#{j : m_j > m_i} < u`` (identical result including boundary ties).

Dropout masks are generated OUTSIDE the kernel (``jax.random.bernoulli``,
int8) and passed in: forward/backward consistency is trivial and the whole
op stays testable in interpreter mode on CPU (the TPU in-kernel PRNG has no
interpreter lowering).
"""

import functools
import math
from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_NEG_INF = -1e30
_LN_EPS = 1e-6  # nnx.LayerNorm default


class StackWeights(NamedTuple):
    """Stacked per-layer parameters, leading axis = layer."""

    wq: jnp.ndarray  # (N, D, D)
    bq: jnp.ndarray  # (N, D)
    wk: jnp.ndarray
    bk: jnp.ndarray
    wv: jnp.ndarray
    bv: jnp.ndarray
    wout: jnp.ndarray  # (N, D, D)
    bout: jnp.ndarray  # (N, D)
    ln1_scale: jnp.ndarray  # (N, D)
    ln1_bias: jnp.ndarray
    wff1: jnp.ndarray  # (N, D, F)
    bff1: jnp.ndarray  # (N, F)
    wff2: jnp.ndarray  # (N, F, D)
    bff2: jnp.ndarray  # (N, D)
    ln2_scale: jnp.ndarray
    ln2_bias: jnp.ndarray


def sample_count_matrices(keys, n_layers: int, l_q: int, l_k: int, u_part: int):
    """Per-layer ProbSparse sample-count matrices.

    ``keys`` is ``(N, 2)`` uint32 (one PRNG key per layer). Returns
    ``(N, L_q, L_k)`` f32 where entry ``[n, q, k]`` counts how many of the
    layer's ``u_part`` samples for query ``q`` hit key ``k`` — the exact
    multiset the reference's ``torch.randint`` sampling produces
    (duplicates included).
    """

    def one(key):
        idx = jax.random.randint(key, (l_q, u_part), 0, l_k)
        rows = jnp.broadcast_to(jnp.arange(l_q)[:, None], (l_q, u_part))
        return (
            jnp.zeros((l_q, l_k), jnp.float32).at[rows, idx].add(1.0)
        )

    return jax.vmap(one)(keys)


def _ln_fwd(x, scale, bias):
    """f32 LayerNorm matching nnx.LayerNorm defaults (fast variance)."""
    x = x.astype(jnp.float32)
    mu = jnp.mean(x, axis=-1, keepdims=True)
    var = jnp.maximum(
        jnp.mean(x * x, axis=-1, keepdims=True) - mu * mu, 0.0
    )
    inv = jax.lax.rsqrt(var + _LN_EPS)
    xhat = (x - mu) * inv
    return xhat * scale.astype(jnp.float32) + bias.astype(jnp.float32)


def _erf_f32(x):
    """f32 erf as a rational polynomial — XLA's own math-expander
    approximation (ErfImpl32: x*P5(x²)/Q7(x²), x clamped to [-4, 4]).
    Mosaic has no ``erf`` lowering, and using XLA's exact formula keeps the
    kernel within ~1 ulp of the module path's ``jax.lax.erf``."""
    x = jnp.clip(x, -4.0, 4.0)
    x2 = x * x
    alpha = (
        0.00022905065861350646, 0.0034082910107109506,
        0.050955695062380861, 0.18520832239976145, 1.128379143519084,
    )
    beta = (
        -1.1791602954361697e-7, 0.000023547966471313185,
        0.0010179625278914885, 0.014070470171167667,
        0.11098505178285362, 0.49746925110067538, 1.0,
    )
    p = jnp.full_like(x, alpha[0])
    for a in alpha[1:]:
        p = p * x2 + a
    q = jnp.full_like(x, beta[0])
    for b in beta[1:]:
        q = q * x2 + b
    return x * p / q


def _gelu_exact(x):
    return x * 0.5 * (1.0 + _erf_f32(x / np.sqrt(2.0).astype(np.float32)))


def _act_fwd(x, activation: str):
    if activation == "relu":
        return jnp.maximum(x, 0.0)
    return _gelu_exact(x)


def _act_grad(x, activation: str):
    if activation == "relu":
        return (x > 0.0).astype(jnp.float32)
    # d/dx gelu_exact = Phi(x) + x * phi(x)
    phi = jnp.exp(-0.5 * x * x) * np.float32(1.0 / math.sqrt(2.0 * math.pi))
    cdf = 0.5 * (1.0 + _erf_f32(x / np.sqrt(2.0).astype(np.float32)))
    return cdf + x * phi


def _attention_core(x, wq, bq, wk, bk, wv, bv, cnt, *, heads, u, mm_dtype):
    """Shared fwd math: layer input -> (pre-out-proj merged heads, saved).

    Returns ``(att_merged (C, L, D), saved)`` where ``saved`` carries the
    tensors the backward pass reuses, as PER-HEAD lists of (C, L, Dh) /
    (C, L, L) tensors. Heads are handled by 16-wide lane slices + an
    unrolled head loop: Mosaic supports lane slices, sublane-split
    reshapes, lane concats and single-batch-dim matmuls, but NOT the
    (C, L, H, Dh) reshape->transpose chain (measured on-chip — see
    docs/PERF.md round-4 fused-stack notes).
    """
    c, l, d = x.shape
    dh = d // heads
    scale = np.float32(1.0 / math.sqrt(dh))

    xm = x.astype(mm_dtype)
    q = (
        jax.lax.dot_general(
            xm.reshape(c * l, d), wq,
            (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        + bq.astype(jnp.float32)
    )
    k = (
        jax.lax.dot_general(
            xm.reshape(c * l, d), wk,
            (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        + bk.astype(jnp.float32)
    )
    v = (
        jax.lax.dot_general(
            xm.reshape(c * l, d), wv,
            (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        + bv.astype(jnp.float32)
    )
    cntb = cnt[None]  # (1, L, L)
    q_hs, k_hs, v_hs, p_hs, sel_hs, att_hs = [], [], [], [], [], []
    for h in range(heads):
        sl = slice(h * dh, (h + 1) * dh)
        q_h = q[:, sl].reshape(c, l, dh)
        k_h = k[:, sl].reshape(c, l, dh)
        v_h = v[:, sl].reshape(c, l, dh)

        # Dense qk in f32 from (possibly bf16-rounded) q/k — matches
        # prob_sparse_attention's preferred_element_type=f32 einsum on
        # the bf16 projections.
        qk = jax.lax.dot_general(
            q_h.astype(mm_dtype), k_h.astype(mm_dtype),
            (((2,), (2,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        )  # (C, L, L)

        # Sparsity measure from the sampled multiset (count algebra).
        sampled_sum = jnp.sum(qk * cntb, axis=-1)  # (C, L)
        sampled_max = jnp.max(
            jnp.where(cntb > 0.0, qk, _NEG_INF), axis=-1
        )
        m = sampled_max - sampled_sum / np.float32(l)

        # selected_i <=> #{j : m_j > m_i} < u (== m_i >= u-th largest,
        # ties at the threshold included — exactly the masked
        # formulation).
        greater = (m[:, :, None] < m[:, None, :]).astype(jnp.float32)
        rank = jnp.sum(greater, axis=-1)  # (C, L)
        selected = (rank < np.float32(u))[..., None]  # (C, L, 1)

        s = qk * scale
        s_max = jnp.max(s, axis=-1, keepdims=True)
        p = jnp.exp(s - s_max)
        p = p / jnp.sum(p, axis=-1, keepdims=True)  # f32 softmax

        upd = jax.lax.dot_general(
            p, v_h,
            (((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        )  # (C, L, Dh)
        ctx = jnp.mean(v_h, axis=1, keepdims=True)  # (C, 1, Dh)
        att = jnp.where(selected, upd, jnp.broadcast_to(ctx, upd.shape))

        q_hs.append(q_h), k_hs.append(k_h), v_hs.append(v_h)
        p_hs.append(p), sel_hs.append(selected), att_hs.append(att)

    att_merged = jnp.concatenate(att_hs, axis=-1).reshape(c, l, d)
    return att_merged, (q_hs, k_hs, v_hs, p_hs, sel_hs)


def _layer_fwd(x, wl, cnt_l, masks_l, *, heads, u, dropout_rate, activation,
               mm_dtype):
    """One encoder layer forward (EncoderLayer semantics, encdec.py:85-93).

    ``masks_l`` is None (deterministic) or (m1, m2, m3) int8 keep-masks.
    Returns the layer output (C, L, D) f32.
    """
    (wq, bq, wk, bk, wv, bv, wout, bout, g1, b1,
     wff1, bff1, wff2, bff2, g2, b2) = wl
    c, l, d = x.shape
    keep = np.float32(1.0 / (1.0 - dropout_rate)) if dropout_rate else None

    att_merged, _ = _attention_core(
        x, wq, bq, wk, bk, wv, bv, cnt_l, heads=heads, u=u, mm_dtype=mm_dtype
    )
    new_x = (
        jax.lax.dot_general(
            att_merged.astype(mm_dtype).reshape(c * l, d), wout,
            (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        + bout.astype(jnp.float32)
    ).reshape(c, l, d)
    if masks_l is not None:
        new_x = new_x * masks_l[0].astype(jnp.float32) * keep
    x1 = x + new_x

    xn1 = _ln_fwd(x1, g1, b1)

    f1 = (
        jax.lax.dot_general(
            xn1.astype(mm_dtype).reshape(c * l, d), wff1,
            (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        + bff1.astype(jnp.float32)
    )
    a1 = _act_fwd(f1, activation)
    if masks_l is not None:
        a1 = a1 * masks_l[1].astype(jnp.float32).reshape(c * l, -1) * keep
    f2 = (
        jax.lax.dot_general(
            a1.astype(mm_dtype), wff2,
            (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        + bff2.astype(jnp.float32)
    ).reshape(c, l, d)
    if masks_l is not None:
        f2 = f2 * masks_l[2].astype(jnp.float32) * keep

    return _ln_fwd(xn1 + f2, g2, b2)


def _weights_list(n_layers, *refs_or_arrays):
    """Split 16 stacked tensors into per-layer tuples."""
    return [
        tuple(w[i] for w in refs_or_arrays) for i in range(n_layers)
    ]


# --------------------------------------------------------------------- #
# Pure-JAX twin — the executable spec. Tests diff the kernels against it
# and it documents the exact math (same helpers, same dtypes).
# --------------------------------------------------------------------- #


def stack_reference(x, weights: StackWeights, cnt, masks, *, heads, u,
                    dropout_rate, activation="gelu", compute_bf16=True):
    """(R, L, D) f32 -> (R, L, D) f32 through all N layers (pure XLA)."""
    mm_dtype = jnp.bfloat16 if compute_bf16 else jnp.float32
    n_layers = weights.wq.shape[0]
    w_cast = _cast_weights(weights, mm_dtype)
    per_layer = _weights_list(n_layers, *w_cast)
    x = x.astype(jnp.float32)
    for i in range(n_layers):
        masks_l = None if masks is None else tuple(m[i] for m in masks)
        x = _layer_fwd(
            x, per_layer[i], cnt[i], masks_l,
            heads=heads, u=u, dropout_rate=dropout_rate,
            activation=activation, mm_dtype=mm_dtype,
        )
    return x


def _cast_weights(weights: StackWeights, mm_dtype):
    """Matmul weights in compute dtype; norm/bias vectors stay f32."""
    return StackWeights(
        wq=weights.wq.astype(mm_dtype),
        bq=weights.bq.astype(jnp.float32),
        wk=weights.wk.astype(mm_dtype),
        bk=weights.bk.astype(jnp.float32),
        wv=weights.wv.astype(mm_dtype),
        bv=weights.bv.astype(jnp.float32),
        wout=weights.wout.astype(mm_dtype),
        bout=weights.bout.astype(jnp.float32),
        ln1_scale=weights.ln1_scale.astype(jnp.float32),
        ln1_bias=weights.ln1_bias.astype(jnp.float32),
        wff1=weights.wff1.astype(mm_dtype),
        bff1=weights.bff1.astype(jnp.float32),
        wff2=weights.wff2.astype(mm_dtype),
        bff2=weights.bff2.astype(jnp.float32),
        ln2_scale=weights.ln2_scale.astype(jnp.float32),
        ln2_bias=weights.ln2_bias.astype(jnp.float32),
    )


# --------------------------------------------------------------------- #
# Forward kernel
# --------------------------------------------------------------------- #


def _fwd_kernel(*refs, n_layers, heads, u, dropout_rate, activation,
                mm_dtype, train, save_resid):
    x_ref = refs[0]
    w_refs = refs[1:17]
    cnt_ref = refs[17]
    idx = 18
    if train:
        m1_ref, m2_ref, m3_ref = refs[idx : idx + 3]
        idx += 3
    y_ref = refs[idx]
    resid_ref = refs[idx + 1] if save_resid else None

    x = x_ref[:].astype(jnp.float32)
    per_layer = _weights_list(n_layers, *w_refs)
    for i in range(n_layers):
        if save_resid:
            resid_ref[i] = x
        masks_l = (
            (m1_ref[i], m2_ref[i], m3_ref[i]) if train else None
        )
        x = _layer_fwd(
            x, per_layer[i], cnt_ref[i], masks_l,
            heads=heads, u=u, dropout_rate=dropout_rate,
            activation=activation, mm_dtype=mm_dtype,
        )
    y_ref[:] = x


# --------------------------------------------------------------------- #
# Backward kernel: recompute per layer from the saved layer inputs.
# --------------------------------------------------------------------- #


def _ln_bwd(x, scale, g):
    """Grad of _ln_fwd wrt input and (scale, bias). Returns (dx, dscale_rows,
    dbias_rows) where the weight grads are still per-element (caller sums)."""
    x = x.astype(jnp.float32)
    d = x.shape[-1]
    mu = jnp.mean(x, axis=-1, keepdims=True)
    var = jnp.maximum(jnp.mean(x * x, axis=-1, keepdims=True) - mu * mu, 0.0)
    inv = jax.lax.rsqrt(var + _LN_EPS)
    xhat = (x - mu) * inv
    gs = g * scale.astype(jnp.float32)
    m1 = jnp.mean(gs, axis=-1, keepdims=True)
    m2 = jnp.mean(gs * xhat, axis=-1, keepdims=True)
    dx = (gs - m1 - xhat * m2) * inv
    return dx, g * xhat, g, xhat


def _layer_bwd(x0, g, wl, cnt_l, masks_l, *, heads, u, dropout_rate,
               activation, mm_dtype):
    """Backward of one layer. Returns (dx0, tuple-of-16 weight grads)."""
    (wq, bq, wk, bk, wv, bv, wout, bout, g1, b1,
     wff1, bff1, wff2, bff2, g2, b2) = wl
    c, l, d = x0.shape
    dh = d // heads
    f = wff1.shape[-1]
    scale = np.float32(1.0 / math.sqrt(dh))
    keep = np.float32(1.0 / (1.0 - dropout_rate)) if dropout_rate else None

    # ---- recompute forward internals ----
    att_merged, (q_hs, k_hs, v_hs, p_hs, sel_hs) = _attention_core(
        x0, wq, bq, wk, bk, wv, bv, cnt_l, heads=heads, u=u, mm_dtype=mm_dtype
    )
    new_x = (
        jax.lax.dot_general(
            att_merged.astype(mm_dtype).reshape(c * l, d), wout,
            (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        + bout.astype(jnp.float32)
    ).reshape(c, l, d)
    if masks_l is not None:
        new_x = new_x * masks_l[0].astype(jnp.float32) * keep
    x1 = x0.astype(jnp.float32) + new_x
    xn1 = _ln_fwd(x1, g1, b1)
    f1 = (
        jax.lax.dot_general(
            xn1.astype(mm_dtype).reshape(c * l, d), wff1,
            (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        + bff1.astype(jnp.float32)
    )
    a1 = _act_fwd(f1, activation)
    if masks_l is not None:
        a1d = a1 * masks_l[1].astype(jnp.float32).reshape(c * l, f) * keep
    else:
        a1d = a1

    # ---- backward ----
    # norm2 over z = xn1 + f2_dropped
    f2 = (
        jax.lax.dot_general(
            a1d.astype(mm_dtype), wff2,
            (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        + bff2.astype(jnp.float32)
    ).reshape(c, l, d)
    if masks_l is not None:
        f2 = f2 * masks_l[2].astype(jnp.float32) * keep
    z = xn1 + f2
    dz, dg2_rows, db2_rows, _ = _ln_bwd(z, g2, g.astype(jnp.float32))
    dg2 = jnp.sum(dg2_rows.reshape(c * l, d), axis=0, keepdims=True)
    db2 = jnp.sum(db2_rows.reshape(c * l, d), axis=0, keepdims=True)

    df2 = dz
    if masks_l is not None:
        df2 = df2 * masks_l[2].astype(jnp.float32) * keep
    df2f = df2.reshape(c * l, d)
    dbff2 = jnp.sum(df2f, axis=0, keepdims=True)
    dwff2 = jax.lax.dot_general(
        a1d.astype(mm_dtype), df2f.astype(mm_dtype),
        (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # (F, D)
    da1d = jax.lax.dot_general(
        df2f.astype(mm_dtype), wff2,
        (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # (C*L, F)
    da1 = da1d
    if masks_l is not None:
        da1 = da1 * masks_l[1].astype(jnp.float32).reshape(c * l, f) * keep
    df1 = da1 * _act_grad(f1, activation)
    dbff1 = jnp.sum(df1, axis=0, keepdims=True)
    dwff1 = jax.lax.dot_general(
        xn1.astype(mm_dtype).reshape(c * l, d), df1.astype(mm_dtype),
        (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # (D, F)
    dxn1 = dz + jax.lax.dot_general(
        df1.astype(mm_dtype), wff1,
        (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    ).reshape(c, l, d)

    dx1, dg1_rows, db1_rows, _ = _ln_bwd(x1, g1, dxn1)
    dg1 = jnp.sum(dg1_rows.reshape(c * l, d), axis=0, keepdims=True)
    db1 = jnp.sum(db1_rows.reshape(c * l, d), axis=0, keepdims=True)

    dnew = dx1
    if masks_l is not None:
        dnew = dnew * masks_l[0].astype(jnp.float32) * keep
    dnewf = dnew.reshape(c * l, d)
    dbout = jnp.sum(dnewf, axis=0, keepdims=True)
    dwout = jax.lax.dot_general(
        att_merged.astype(mm_dtype).reshape(c * l, d), dnewf.astype(mm_dtype),
        (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    datt_flat = jax.lax.dot_general(
        dnewf.astype(mm_dtype), wout,
        (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # (C*L, D)

    dq_hs, dk_hs, dv_hs = [], [], []
    for h in range(heads):
        sl = slice(h * dh, (h + 1) * dh)
        datt_h = datt_flat[:, sl].reshape(c, l, dh)
        p, selected = p_hs[h], sel_hs[h]
        # where(selected, p @ v, mean(v))
        g_upd = jnp.where(selected, datt_h, 0.0)
        g_ctx = jnp.where(selected, 0.0, datt_h)
        # dV = p^T g_upd + (1/L) ones^T g_ctx. Folding the context term
        # into the same contraction (p + ones/L would be wrong — different
        # cotangents) keeps both as batched matmuls: a (C, 1, Dh)
        # keepdims-sum broadcast-add here is one of the compositions that
        # SIGABRTs the Mosaic layout pass at full program size.
        dv_h = jax.lax.dot_general(
            p, g_upd,
            (((1,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        )  # (C, L, Dh): sum_q p[q, k] g_upd[q, :]
        ones_ll = jnp.full((1, l, l), 1.0 / np.float32(l), jnp.float32)
        dv_h = dv_h + jax.lax.dot_general(
            jnp.broadcast_to(ones_ll, (c, l, l)), g_ctx,
            (((1,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        )
        dp = jax.lax.dot_general(
            g_upd, v_hs[h],
            (((2,), (2,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        )  # (C, L, L)
        ds = p * (dp - jnp.sum(dp * p, axis=-1, keepdims=True))
        dqk = ds * scale
        # selection/measure path carries no gradient (boolean select).
        dq_h = jax.lax.dot_general(
            dqk.astype(mm_dtype), k_hs[h].astype(mm_dtype),
            (((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        )
        dk_h = jax.lax.dot_general(
            dqk.astype(mm_dtype), q_hs[h].astype(mm_dtype),
            (((1,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        )
        dq_hs.append(dq_h), dk_hs.append(dk_h), dv_hs.append(dv_h)

    def merge(parts):  # H x (C, L, Dh) -> (C*L, D)
        return jnp.concatenate(parts, axis=-1).reshape(c * l, d)

    dq, dk_, dv = merge(dq_hs), merge(dk_hs), merge(dv_hs)
    x0f = x0.astype(mm_dtype).reshape(c * l, d)
    dbq = jnp.sum(dq, axis=0, keepdims=True)
    dbk = jnp.sum(dk_, axis=0, keepdims=True)
    dbv = jnp.sum(dv, axis=0, keepdims=True)
    dwq = jax.lax.dot_general(
        x0f, dq.astype(mm_dtype), (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    dwk = jax.lax.dot_general(
        x0f, dk_.astype(mm_dtype), (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    dwv = jax.lax.dot_general(
        x0f, dv.astype(mm_dtype), (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    dx0 = dx1 + (
        jax.lax.dot_general(
            dq.astype(mm_dtype), wq, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        + jax.lax.dot_general(
            dk_.astype(mm_dtype), wk, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        + jax.lax.dot_general(
            dv.astype(mm_dtype), wv, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
    ).reshape(c, l, d)

    grads = (dwq, dbq, dwk, dbk, dwv, dbv, dwout, dbout, dg1, db1,
             dwff1, dbff1, dwff2, dbff2, dg2, db2)
    return dx0, grads


def _bwd_layer_kernel(*refs, heads, u, dropout_rate, activation, mm_dtype,
                      train):
    """Backward of ONE layer over the row grid.

    The unified all-layers backward compiled for eval but the train
    variant's 8-layer x 8-head unrolled program OOM-killed the TPU
    compile helper (SIGKILL); one pallas_call per layer keeps the program
    1/N the size — and since every layer is the same jaxpr, Mosaic
    compiles it ONCE and reuses it for all N layers.
    """
    x0_ref = refs[0]
    g_ref = refs[1]
    w_refs = refs[2:18]
    cnt_ref = refs[18]
    idx = 19
    if train:
        m1_ref, m2_ref, m3_ref = refs[idx : idx + 3]
        idx += 3
    dx_ref = refs[idx]
    dw_refs = refs[idx + 1 : idx + 17]

    first = pl.program_id(0) == 0
    wl = tuple(w[:] for w in w_refs)
    masks_l = (m1_ref[:], m2_ref[:], m3_ref[:]) if train else None

    g, grads = _layer_bwd(
        x0_ref[:], g_ref[:].astype(jnp.float32), wl, cnt_ref[:], masks_l,
        heads=heads, u=u, dropout_rate=dropout_rate,
        activation=activation, mm_dtype=mm_dtype,
    )
    dx_ref[:] = g
    # Sequential TPU grid => accumulate weight grads in the output
    # buffers (constant block index: one VMEM-resident buffer each).
    # Values stay rank>=2 — Mosaic SIGABRTs on rank-1 values/stores
    # (bias grads are kept (1, X) upstream).
    for dw_ref, gr in zip(dw_refs, grads):
        @pl.when(first)
        def _(dw_ref=dw_ref, gr=gr):
            dw_ref[:] = gr.astype(dw_ref.dtype)

        @pl.when(jnp.logical_not(first))
        def _(dw_ref=dw_ref, gr=gr):
            dw_ref[:] = dw_ref[:] + gr.astype(dw_ref.dtype)


# --------------------------------------------------------------------- #
# pallas_call wrappers + custom VJP
# --------------------------------------------------------------------- #


def _pick_chunk(r: int, l: int, heads: int, train: bool) -> int:
    """Row-chunk size: keep the (C, H, L, L) f32 score tensors (x3 live)
    plus activations inside a ~4 MB budget — VMEM also holds all layers'
    weights, masks and the pipeline's double buffers.
    ``ROUTEFORMER_FUSION_CHUNK`` overrides (power of two, on-chip tuning;
    the backward pass still halves it)."""
    import os

    override = int(os.getenv("ROUTEFORMER_FUSION_CHUNK", "0"))
    if override > 0:
        override = 1 << (override.bit_length() - 1)  # floor to power of two
        return max(1, min(override, 1 << (max(r, 1).bit_length() - 1)))
    budget = 4 * 1024 * 1024
    per_row = heads * l * l * 4 * 3 + l * 2048 * (2 if train else 1)
    c = max(1, budget // per_row)
    c = min(c, 32, r)
    # power of two => R pads at most 2x at tiny R, exact grids otherwise
    return 1 << (c.bit_length() - 1)


def _full_spec(x):
    return pl.BlockSpec(
        x.shape, lambda i: (0,) * x.ndim, memory_space=pltpu.VMEM
    )


@functools.partial(
    jax.custom_vjp, nondiff_argnums=(4, 5, 6, 7, 8, 9)
)
def _fused_stack(x, weights_tuple, cnt, masks3, heads, u, dropout_rate,
                 activation, compute_bf16, interpret):
    y, _ = _fused_stack_fwd_impl(
        x, weights_tuple, cnt, masks3, heads, u, dropout_rate,
        activation, compute_bf16, interpret, save_resid=False,
    )
    return y


def _fused_stack_fwd_impl(x, weights_tuple, cnt, masks3, heads, u,
                          dropout_rate, activation, compute_bf16, interpret,
                          save_resid):
    r, l, d = x.shape
    n_layers = weights_tuple[0].shape[0]
    train = masks3 is not None
    mm_dtype = jnp.bfloat16 if compute_bf16 else jnp.float32

    c = _pick_chunk(r, l, heads, train)
    r_pad = ((r + c - 1) // c) * c
    xp = jnp.pad(x.astype(jnp.float32), ((0, r_pad - r), (0, 0), (0, 0)))
    w_cast = _cast_weights(StackWeights(*weights_tuple), mm_dtype)
    cnt = cnt.astype(jnp.float32)

    if train:
        # TRAIN mode compiles PER LAYER: the monolithic 8-layer train
        # program (mask operands included) SIGKILLs the axon remote
        # compile helper at flagship geometry — the same helper-memory
        # wall as the monolithic backward (docs/PERF.md). One layer per
        # pallas_call is 1/8 the program, Mosaic compiles one jaxpr and
        # reuses it, and the chained x round-trips HBM between layers
        # (~13 MB/layer — microseconds against the score traffic this
        # kernel family eliminates). Residuals come free: the chain
        # inputs ARE the per-layer inputs, so no save_resid kernel
        # variant is needed in train mode.
        return _fwd_layerwise(
            xp, w_cast, cnt, masks3, n_layers=n_layers, heads=heads, u=u,
            dropout_rate=dropout_rate, activation=activation,
            mm_dtype=mm_dtype, interpret=interpret, save_resid=save_resid,
            c=c, r_pad=r_pad, r=r, l=l, d=d,
        )

    operands = [xp, *w_cast, cnt]
    in_specs = [
        pl.BlockSpec((c, l, d), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
        *[_full_spec(w) for w in w_cast],
        _full_spec(cnt),
    ]
    if train:
        mp = [
            jnp.pad(m, ((0, 0), (0, r_pad - r), (0, 0), (0, 0)))
            for m in masks3
        ]
        operands += mp
        in_specs += [
            pl.BlockSpec(
                (n_layers, c, l, m.shape[-1]),
                lambda i: (0, i, 0, 0),
                memory_space=pltpu.VMEM,
            )
            for m in mp
        ]

    out_shape = [jax.ShapeDtypeStruct((r_pad, l, d), jnp.float32)]
    out_specs = [
        pl.BlockSpec((c, l, d), lambda i: (i, 0, 0), memory_space=pltpu.VMEM)
    ]
    if save_resid:
        out_shape.append(
            jax.ShapeDtypeStruct((n_layers, r_pad, l, d), jnp.float32)
        )
        out_specs.append(
            pl.BlockSpec(
                (n_layers, c, l, d),
                lambda i: (0, i, 0, 0),
                memory_space=pltpu.VMEM,
            )
        )

    flops_mm = 2 * r_pad * l * n_layers * (
        4 * d * d + 2 * d * w_cast.wff1.shape[-1] + 2 * l * (d // heads) * heads
    )
    outs = pl.pallas_call(
        functools.partial(
            _fwd_kernel,
            n_layers=n_layers, heads=heads, u=u, dropout_rate=dropout_rate,
            activation=activation, mm_dtype=mm_dtype, train=train,
            save_resid=save_resid,
        ),
        grid=(r_pad // c,),
        out_shape=out_shape,
        in_specs=in_specs,
        out_specs=out_specs,
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=flops_mm,
            bytes_accessed=4 * r_pad * l * d * (2 + (n_layers if save_resid else 0)),
            transcendentals=r_pad * heads * l * l * n_layers,
        ),
    )(*operands)

    y = outs[0][:r]
    resid = outs[1] if save_resid else None
    return y, resid


def _fwd_layerwise(xp, w_cast, cnt, masks3, *, n_layers, heads, u,
                   dropout_rate, activation, mm_dtype, interpret,
                   save_resid, c, r_pad, r, l, d):
    """Per-layer pallas_call chain (train mode; see _fused_stack_fwd_impl)."""
    mp = [
        jnp.pad(m, ((0, 0), (0, r_pad - m.shape[1]), (0, 0), (0, 0)))
        for m in masks3
    ]
    kern = functools.partial(
        _fwd_kernel, n_layers=1, heads=heads, u=u,
        dropout_rate=dropout_rate, activation=activation,
        mm_dtype=mm_dtype, train=True, save_resid=False,
    )
    resids = []
    for i in range(n_layers):
        if save_resid:
            resids.append(xp)
        operands = [xp, *(w[i : i + 1] for w in w_cast), cnt[i : i + 1]]
        in_specs = [
            pl.BlockSpec((c, l, d), lambda j: (j, 0, 0),
                         memory_space=pltpu.VMEM),
            *[_full_spec(w[i : i + 1]) for w in w_cast],
            _full_spec(cnt[i : i + 1]),
        ]
        operands += [m[i : i + 1] for m in mp]
        in_specs += [
            pl.BlockSpec(
                (1, c, l, m.shape[-1]), lambda j: (0, j, 0, 0),
                memory_space=pltpu.VMEM,
            )
            for m in mp
        ]
        f = w_cast.wff1.shape[-1]
        xp = pl.pallas_call(
            kern,
            grid=(r_pad // c,),
            out_shape=jax.ShapeDtypeStruct((r_pad, l, d), jnp.float32),
            in_specs=in_specs,
            out_specs=pl.BlockSpec((c, l, d), lambda j: (j, 0, 0),
                                   memory_space=pltpu.VMEM),
            interpret=interpret,
            cost_estimate=pl.CostEstimate(
                flops=2 * r_pad * l * (4 * d * d + 2 * d * f
                                       + 2 * l * (d // heads) * heads),
                bytes_accessed=4 * r_pad * l * d * 2,
                transcendentals=r_pad * heads * l * l,
            ),
        )(*operands)
    y = xp[:r]
    resid = jnp.stack(resids) if save_resid else None
    return y, resid


def _fused_stack_vjp_fwd(x, weights_tuple, cnt, masks3, heads, u,
                         dropout_rate, activation, compute_bf16, interpret):
    y, resid = _fused_stack_fwd_impl(
        x, weights_tuple, cnt, masks3, heads, u, dropout_rate,
        activation, compute_bf16, interpret, save_resid=True,
    )
    return y, (resid, weights_tuple, cnt, masks3, x.shape[0])


def _fused_stack_vjp_bwd(heads, u, dropout_rate, activation, compute_bf16,
                         interpret, residuals, g):
    resid, weights_tuple, cnt, masks3, r = residuals
    l, d = g.shape[1], g.shape[2]
    n_layers = weights_tuple[0].shape[0]
    train = masks3 is not None
    mm_dtype = jnp.bfloat16 if compute_bf16 else jnp.float32

    r_pad = resid.shape[1]
    # Backward recompute keeps ~2x the forward live set plus the 16 f32
    # grad accumulators; halve the forward chunk (both are powers of two,
    # so the padded row count stays divisible).
    c = max(1, _pick_chunk(r, l, heads, train) // 2)
    gp = jnp.pad(g.astype(jnp.float32), ((0, r_pad - r), (0, 0), (0, 0)))
    w_cast = _cast_weights(StackWeights(*weights_tuple), mm_dtype)
    cnt = cnt.astype(jnp.float32)
    wt = StackWeights(*weights_tuple)
    f = wt.wff1.shape[-1]
    if train:
        mp = [
            jnp.pad(m, ((0, 0), (0, r_pad - m.shape[1]), (0, 0), (0, 0)))
            for m in masks3
        ]

    # Per-layer bias/norm grads come out (1, X) (rank-2 for Mosaic) and
    # are squeezed here; weight grads are their natural 2D shapes.
    out_shape = [jax.ShapeDtypeStruct((r_pad, l, d), jnp.float32)] + [
        jax.ShapeDtypeStruct(
            w.shape[1:] if w.ndim == 3 else (1,) + w.shape[1:], jnp.float32
        )
        for w in wt
    ]
    out_specs = [
        pl.BlockSpec((c, l, d), lambda i: (i, 0, 0), memory_space=pltpu.VMEM)
    ] + [
        pl.BlockSpec(
            s.shape, lambda i, nd=len(s.shape): (0,) * nd,
            memory_space=pltpu.VMEM,
        )
        for s in out_shape[1:]
    ]

    # One pallas_call per layer, python loop in reverse: the program is
    # 1/N the size of the unified all-layers kernel (whose train variant
    # OOM-killed the TPU compile helper) and — every layer being the same
    # jaxpr — Mosaic compiles it once and reuses it N times. The carried
    # cotangent g (R, L, D) round-trips HBM between layers: ~2 MB at
    # flagship geometry, negligible next to the score traffic this kernel
    # family eliminates.
    kern = functools.partial(
        _bwd_layer_kernel,
        heads=heads, u=u, dropout_rate=dropout_rate,
        activation=activation, mm_dtype=mm_dtype, train=train,
    )
    per_layer_grads = [None] * n_layers
    for i in range(n_layers - 1, -1, -1):
        operands = [resid[i], gp, *(w[i] for w in w_cast), cnt[i]]
        in_specs = [
            pl.BlockSpec(
                (c, l, d), lambda j: (j, 0, 0), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(
                (c, l, d), lambda j: (j, 0, 0), memory_space=pltpu.VMEM
            ),
            *[_full_spec(w[i]) for w in w_cast],
            _full_spec(cnt[i]),
        ]
        if train:
            operands += [m[i] for m in mp]
            in_specs += [
                pl.BlockSpec(
                    (c, l, m.shape[-1]),
                    lambda j: (j, 0, 0),
                    memory_space=pltpu.VMEM,
                )
                for m in mp
            ]
        outs = pl.pallas_call(
            kern,
            grid=(r_pad // c,),
            out_shape=out_shape,
            in_specs=in_specs,
            out_specs=out_specs,
            interpret=interpret,
            cost_estimate=pl.CostEstimate(
                flops=3 * 2 * r_pad * l * (4 * d * d + 2 * d * f),
                bytes_accessed=4 * r_pad * l * d * 4,
                transcendentals=2 * r_pad * heads * l * l,
            ),
        )(*operands)
        gp = outs[0]
        per_layer_grads[i] = outs[1:]

    dx = gp[:r]
    dw = StackWeights(*[
        jnp.stack([per_layer_grads[i][j] for i in range(n_layers)]).reshape(
            w.shape
        ).astype(w.dtype)
        for j, w in enumerate(wt)
    ])
    dcnt = jnp.zeros_like(cnt)
    if masks3 is None:
        dmasks = None
    else:
        # int8 primals take float0 cotangents.
        dmasks = tuple(
            np.zeros(m.shape, dtype=jax.dtypes.float0) for m in masks3
        )
    return dx, tuple(dw), dcnt, dmasks


_fused_stack.defvjp(_fused_stack_vjp_fwd, _fused_stack_vjp_bwd)


def _hybrid_vjp_bwd(heads, u, dropout_rate, activation, compute_bf16,
                    interpret, residuals, g):
    """XLA per-layer-recompute backward for the Mosaic forward kernel.

    The Mosaic backward (`_bwd_layer_kernel`) has never compiled through
    the axon remote-compile helper at flagship geometry (v3 SIGABRT, v4
    helper OOM, v5 timeout, round-5 helper SIGKILL — docs/PERF.md); this
    path keeps the forward kernel's VMEM-resident win (no HBM score
    tensors, the only residual is the per-layer input) and hands the
    backward to XLA, which recomputes each layer's internals from that
    saved input — the same recompute strategy the kernel backward uses,
    expressed as a per-layer ``jax.vjp`` over ``_layer_fwd`` (the
    executable spec the tests diff against). Compiles like any XLA
    program; no Mosaic backward involved.
    """
    resid, weights_tuple, cnt, masks3, r = residuals
    n_layers = weights_tuple[0].shape[0]
    mm_dtype = jnp.bfloat16 if compute_bf16 else jnp.float32
    w_cast = _cast_weights(StackWeights(*weights_tuple), mm_dtype)
    per_layer = _weights_list(n_layers, *w_cast)
    g = g.astype(jnp.float32)
    per_layer_grads = [None] * n_layers
    for i in range(n_layers - 1, -1, -1):
        masks_l = None if masks3 is None else tuple(m[i] for m in masks3)

        def f(x_, wl_, i=i, masks_l=masks_l):
            return _layer_fwd(
                x_, wl_, cnt[i], masks_l, heads=heads, u=u,
                dropout_rate=dropout_rate, activation=activation,
                mm_dtype=mm_dtype,
            )

        _, vjp = jax.vjp(f, resid[i, :r], per_layer[i])
        g, dwl = vjp(g)
        per_layer_grads[i] = dwl
    wt = StackWeights(*weights_tuple)
    dw = tuple(
        jnp.stack(
            [per_layer_grads[i][j].astype(jnp.float32)
             for i in range(n_layers)]
        ).reshape(w.shape).astype(w.dtype)
        for j, w in enumerate(wt)
    )
    dcnt = jnp.zeros_like(cnt)
    dmasks = (
        None if masks3 is None
        else tuple(np.zeros(m.shape, dtype=jax.dtypes.float0) for m in masks3)
    )
    return g, dw, dcnt, dmasks


@functools.partial(
    jax.custom_vjp, nondiff_argnums=(4, 5, 6, 7, 8, 9)
)
def _fused_stack_hybrid(x, weights_tuple, cnt, masks3, heads, u,
                        dropout_rate, activation, compute_bf16, interpret):
    """Fused forward kernel + XLA per-layer-recompute backward."""
    y, _ = _fused_stack_fwd_impl(
        x, weights_tuple, cnt, masks3, heads, u, dropout_rate,
        activation, compute_bf16, interpret, save_resid=False,
    )
    return y


_fused_stack_hybrid.defvjp(_fused_stack_vjp_fwd, _hybrid_vjp_bwd)


def fused_perceive_stack(
    x: jnp.ndarray,
    weights: StackWeights,
    cnt: jnp.ndarray,
    masks: Optional[Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]],
    *,
    heads: int,
    factor: int = 5,
    dropout_rate: float = 0.0,
    activation: str = "gelu",
    compute_bf16: bool = True,
    interpret: bool = False,
    backward: str = "kernel",
) -> jnp.ndarray:
    """Run the full N-layer ProbSparse encoder stack in one fused kernel.

    - ``x``: (R, L, D) activations (rows attend independently).
    - ``weights``: stacked per-layer parameters (leading axis = layer).
    - ``cnt``: (N, L, L) f32 sampled-key count matrices
      (``sample_count_matrices``).
    - ``masks``: None for deterministic mode, else three int8 keep-masks
      shaped (N, R, L, D), (N, R, L, F), (N, R, L, D) — the layer's three
      dropout sites (attention output, FFN activation, FFN output).
    - ``backward``: "kernel" (per-layer Mosaic backward) or "xla" (the
      hybrid: Mosaic forward + XLA per-layer-recompute backward — the path
      that needs no Mosaic backward compile, ``_hybrid_vjp_bwd``).
    """
    l = x.shape[1]
    u = min(int(factor * math.ceil(math.log(l))), l)
    train = masks is not None and dropout_rate > 0.0
    impl = _fused_stack_hybrid if backward == "xla" else _fused_stack
    return impl(
        x, tuple(weights), cnt, tuple(masks) if train else None,
        heads, u, float(dropout_rate), activation, bool(compute_bf16),
        bool(interpret),
    )


def make_dropout_masks(key, n_layers, r, l, d, f, dropout_rate):
    """The three per-site keep-masks (int8) for the whole stack."""
    k1, k2, k3 = jax.random.split(key, 3)
    keep = 1.0 - dropout_rate
    m1 = jax.random.bernoulli(k1, keep, (n_layers, r, l, d)).astype(jnp.int8)
    m2 = jax.random.bernoulli(k2, keep, (n_layers, r, l, f)).astype(jnp.int8)
    m3 = jax.random.bernoulli(k3, keep, (n_layers, r, l, d)).astype(jnp.int8)
    return m1, m2, m3
