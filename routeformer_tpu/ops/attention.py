"""Attention variants, TPU-native.

Covers the performance/semantic roles of the reference's attention family:

- ``dot_product_attention`` ≙ ``FullAttention`` (reference
  ``models/cross_modal_transformer.py:36-69`` and
  ``models/gps_backbone/layers/SelfAttentionFamily.py:34``): dense softmax
  attention. On TPU without attention-dropout it dispatches to the fused
  Pallas kernel (``ops/flash_attention.py``); otherwise a pure-JAX einsum
  path (still one fused XLA region).
- ``prob_sparse_attention`` ≙ ``ProbAttention`` (reference
  cross_modal_transformer.py:72-166): Informer's O(L log L) top-u-query
  attention. The top-u size is *static* (computed from static sequence
  lengths), so the data-dependent part is only a gather/scatter — fully
  jittable with fixed shapes.
- ``autocorrelation_attention`` ≙ Autoformer's ``AutoCorrelation``
  (reference ``models/gps_backbone/layers/AutoCorrelation.py:8-163``):
  FFT cross-correlation + top-k time-delay aggregation. rFFT/irFFT lower to
  XLA's native FFT on TPU; the torch per-delay ``roll``/``gather`` loop
  becomes one batched modular gather.

All functions take ``(B, L, H, E)`` tensors (the reference's layout).
"""

import math
import os
from typing import Optional

import jax
import jax.numpy as jnp

_NEG_INF = -1e30


def _use_flash(q, k, dropout_rate, deterministic, need_weights) -> bool:
    import os

    if need_weights or (dropout_rate > 0.0 and not deterministic):
        return False
    mode = os.environ.get("ROUTEFORMER_FLASH", "auto")
    if mode == "0":
        return False
    if mode == "1":
        return jax.default_backend() == "tpu"
    # auto: the fused kernel wins once scores stop fitting VMEM comfortably;
    # at the flagship's short lengths XLA's fused einsum attention measures
    # ~6% faster end-to-end (docs/PERF.md), so dispatch flash for long
    # sequences only. Shapes are static under trace.
    if k.shape[1] < 512:
        return False
    return jax.default_backend() == "tpu"


def dot_product_attention(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    *,
    causal: bool = False,
    bias: Optional[jnp.ndarray] = None,
    scale: Optional[float] = None,
    dropout_rate: float = 0.0,
    deterministic: bool = True,
    dropout_rng: Optional[jax.Array] = None,
    need_weights: bool = False,
    impl: str = "auto",
):
    """Dense softmax attention on ``(B, L, H, E)`` tensors.

    Matches ``FullAttention``: scale defaults to ``1/sqrt(E)``; with
    ``causal`` a strictly-upper-triangular mask is applied; dropout (if any)
    acts on the attention weights.

    Returns ``(out, weights)`` with ``weights=None`` unless ``need_weights``.
    """
    b, l_q, h, e = q.shape
    _, l_k, _, e_v = v.shape
    scale = scale if scale is not None else 1.0 / math.sqrt(e)

    if impl == "flash" or (
        impl == "auto"
        and bias is None
        and _use_flash(q, k, dropout_rate, deterministic, need_weights)
    ):
        from routeformer_tpu.ops.flash_attention import flash_attention_bhle

        qf = q.transpose(0, 2, 1, 3).reshape(b * h, l_q, e)
        kf = k.transpose(0, 2, 1, 3).reshape(b * h, l_k, e)
        vf = v.transpose(0, 2, 1, 3).reshape(b * h, l_k, e_v)
        of = flash_attention_bhle(qf, kf, vf, causal, scale)
        out = of.reshape(b, h, l_q, e_v).transpose(0, 2, 1, 3)
        return out, None

    # Pure-JAX path (XLA fuses this into a few MXU/VPU ops).
    scores = jnp.einsum("blhe,bshe->bhls", q, k).astype(jnp.float32)
    if causal:
        row = jax.lax.broadcasted_iota(jnp.int32, (l_q, l_k), 0)
        col = jax.lax.broadcasted_iota(jnp.int32, (l_q, l_k), 1)
        scores = jnp.where((col > row)[None, None], _NEG_INF, scores)
    if bias is not None:
        scores = scores + bias
    weights = jax.nn.softmax(scores * scale, axis=-1)
    if dropout_rate > 0.0 and not deterministic:
        if dropout_rng is None:
            raise ValueError("dropout_rng required for non-deterministic attention")
        keep = jax.random.bernoulli(dropout_rng, 1.0 - dropout_rate, weights.shape)
        weights_dropped = jnp.where(keep, weights / (1.0 - dropout_rate), 0.0)
    else:
        weights_dropped = weights
    out = jnp.einsum("bhls,bshd->blhd", weights_dropped.astype(v.dtype), v)
    return out, (weights if need_weights else None)


def prob_sparse_attention(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    *,
    factor: int = 5,
    causal: bool = False,
    scale: Optional[float] = None,
    sample_rng: Optional[jax.Array] = None,
):
    """Informer ProbSparse attention on ``(B, L, H, E)`` tensors.

    Semantics of the reference (cross_modal_transformer.py:88-166):

    1. For each query, score it against ``U_part`` *sampled* keys; the
       sparsity measure is ``max - mean`` of those scores.
    2. The top-``u`` queries (``u = factor * ceil(ln L_q)``) attend densely
       to all keys; the rest receive the mean of V (non-causal) or the
       running cumsum of V (causal).

    ``u``/``U_part`` are static (shape-derived), so this compiles to fixed
    top-k + gather + scatter. ``sample_rng=None`` keeps key sampling
    deterministic (fixed key), which also makes eval reproducible —
    the reference uses a fresh ``torch.randint`` each call.

    Returns ``(out, None)``.
    """
    b, l_q, h, e = q.shape
    _, l_k, _, d = v.shape
    scale = scale if scale is not None else 1.0 / math.sqrt(e)

    u_part = min(int(factor * math.ceil(math.log(l_k))), l_k)
    u = min(int(factor * math.ceil(math.log(l_q))), l_q)

    if sample_rng is None:
        sample_rng = jax.random.PRNGKey(0)
    # (L_q, U_part) sampled key indices, shared across batch/heads like the
    # reference's torch.randint(L_K, (L_Q, sample_k)).
    index_sample = jax.random.randint(sample_rng, (l_q, u_part), 0, l_k)

    # Work in (B, H, L, E).
    qt = q.transpose(0, 2, 1, 3)
    kt = k.transpose(0, 2, 1, 3)
    vt = v.transpose(0, 2, 1, 3)

    # Three formulations of ProbSparse (ROUTEFORMER_PROBSPARSE knob). All
    # compute the same math; they trade data movement for FLOPs:
    # - "masked" (default): dense scores AND dense softmax for ALL queries,
    #   then a per-(B,H) threshold (the u-th largest sparsity measure)
    #   selects between the dense row and the context row with one
    #   jnp.where. No top-k INDEX path, no take_along_axis on scores, no
    #   scatter — the three data-movement ops that made the d128 fusion
    #   stacks latency-bound (round-2 steady-state ablation: the three
    #   8-layer stacks were ~78% of the cached step). Output equals the
    #   top-u scatter exactly whenever the u-th measure value is unique
    #   (float ties are measure-zero; the exhaustive u == L case is
    #   identical by construction).
    # - "dense": dense (B, H, L, S) score matmul reused for the sampling
    #   gather and the gathered top-u rows; top-k + gather + scatter.
    # - "gather": gather the sampled K rows then einsum; won at round 1's
    #   f32 unmerged-fusion shapes, kept as a knob for other geometries.
    formulation = os.getenv("ROUTEFORMER_PROBSPARSE", "masked")
    if formulation == "masked":
        qk_full = jnp.einsum(
            "bhle,bhse->bhls", qt, kt,
            preferred_element_type=jnp.float32,
        )  # (B, H, L_q, L_k)
        qk_sample = jnp.take_along_axis(
            qk_full, index_sample[None, None], axis=3
        )  # (B, H, L_q, U_part)
        m = qk_sample.max(axis=-1) - qk_sample.sum(axis=-1) / l_k  # (B,H,L)
        # u-th largest measure per (B, H): values-only top_k (no gather)
        thresh = jax.lax.top_k(m, u)[0][..., -1:]  # (B, H, 1)
        selected = m >= thresh  # (B, H, L_q)

        scores = qk_full * scale
        if causal:
            row = jax.lax.broadcasted_iota(jnp.int32, (l_q, l_k), 0)
            col = jax.lax.broadcasted_iota(jnp.int32, (l_q, l_k), 1)
            scores = jnp.where((col > row)[None, None], _NEG_INF, scores)
            context = jnp.cumsum(vt, axis=2)  # requires L_q == L_k
        else:
            context = jnp.broadcast_to(
                vt.mean(axis=2, keepdims=True), (b, h, l_q, d)
            )
        attn = jax.nn.softmax(scores, axis=-1)
        update = jnp.einsum("bhls,bhsd->bhld", attn, vt)  # (B, H, L_q, D)
        out = jnp.where(
            selected[..., None], update, context.astype(update.dtype)
        )
        return out.transpose(0, 2, 1, 3), None

    if formulation == "dense":
        qk_full = jnp.einsum(
            "bhle,bhse->bhls", qt, kt,
            preferred_element_type=jnp.float32,
        )  # (B, H, L_q, L_k)
        qk_sample = jnp.take_along_axis(
            qk_full, index_sample[None, None], axis=3
        )  # (B, H, L_q, U_part)
        m = qk_sample.max(axis=-1) - qk_sample.sum(axis=-1) / l_k
        _, m_top = jax.lax.top_k(m, u)  # (B, H, u)
        scores = (
            jnp.take_along_axis(qk_full, m_top[..., None], axis=2) * scale
        )  # (B, H, u, L_k), f32
    else:
        k_sampled = kt[:, :, index_sample, :]  # (B, H, L_q, U_part, E)
        qk_sample = jnp.einsum("bhle,bhlse->bhls", qt, k_sampled)

        # Sparsity measure and top-u query selection.
        m = qk_sample.max(axis=-1) - qk_sample.sum(axis=-1) / l_k  # (B, H, L_q)
        _, m_top = jax.lax.top_k(m, u)  # (B, H, u)

        q_reduce = jnp.take_along_axis(qt, m_top[..., None], axis=2)
        # f32 scores/softmax regardless of the (possibly bf16) compute dtype.
        scores = (
            jnp.einsum("bhue,bhse->bhus", q_reduce, kt).astype(jnp.float32)
            * scale
        )  # (B, H, u, L_k)

    if causal:
        # ProbMask: selected query at original position p masks keys > p.
        col = jax.lax.broadcasted_iota(jnp.int32, (b, h, u, l_k), 3)
        mask = col > m_top[..., None]
        scores = jnp.where(mask, _NEG_INF, scores)
        context = jnp.cumsum(vt, axis=2)  # (B, H, L_q, D); requires L_q == L_k
    else:
        context = jnp.broadcast_to(
            vt.mean(axis=2, keepdims=True), (b, h, l_q, d)
        )

    attn = jax.nn.softmax(scores, axis=-1)
    update = jnp.einsum("bhus,bhsd->bhud", attn, vt)  # (B, H, u, D)

    # Scatter the top-u query outputs into the context.
    batch_idx = jax.lax.broadcasted_iota(jnp.int32, (b, h, u), 0)
    head_idx = jax.lax.broadcasted_iota(jnp.int32, (b, h, u), 1)
    context = context.astype(update.dtype).at[batch_idx, head_idx, m_top].set(update)

    return context.transpose(0, 2, 1, 3), None


def autocorrelation_attention(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    *,
    factor: int = 1,
    training: bool = True,
):
    """Autoformer AutoCorrelation on ``(B, L, H, E)`` tensors.

    Reference semantics (AutoCorrelation.py:32-163): keys/values are
    truncated or zero-padded to the query length; the per-(head, channel)
    circular cross-correlation ``corr = irfft(rfft(q) * conj(rfft(k)))`` is
    computed over time; the top-k delays (k = factor*ln(L), static) are
    softmax-weighted and V is aggregated by circularly shifting with each
    delay.

    - ``training=True``: delays are chosen from the batch-mean correlation
      (shared across the batch), weights read per-sample at those delays.
    - ``training=False``: per-sample top-k delays (the reference's
      "inference" variant). Both reduce to one modular gather here instead
      of the reference's python loop over delays.

    Returns ``(out, corr)`` where corr is the (B, L, H, E) correlation map
    (for output_attention parity).
    """
    b, l, h, e = q.shape
    s = k.shape[1]
    if l > s:
        pad = jnp.zeros((b, l - s, h, v.shape[-1]), dtype=v.dtype)
        v = jnp.concatenate([v, pad], axis=1)
        k = jnp.concatenate([k, pad.astype(k.dtype)], axis=1)
    else:
        v = v[:, :l]
        k = k[:, :l]

    # (B, H, E, L) time-last for FFT.
    qt = q.transpose(0, 2, 3, 1).astype(jnp.float32)
    kt = k.transpose(0, 2, 3, 1).astype(jnp.float32)
    vt = v.transpose(0, 2, 3, 1).astype(jnp.float32)

    q_fft = jnp.fft.rfft(qt, axis=-1)
    k_fft = jnp.fft.rfft(kt, axis=-1)
    corr = jnp.fft.irfft(q_fft * jnp.conj(k_fft), n=l, axis=-1)  # (B,H,E,L)

    top_k = int(factor * math.log(l))
    mean_value = corr.mean(axis=(1, 2))  # (B, L)

    positions = jax.lax.broadcasted_iota(jnp.int32, (l,), 0)

    if training:
        # Batch-shared delays from the batch-mean correlation.
        _, delay = jax.lax.top_k(mean_value.mean(axis=0), top_k)  # (k,)
        weights = mean_value[:, delay]  # (B, k)
        tmp_corr = jax.nn.softmax(weights, axis=-1)  # (B, k)
        # gather indices: (k, L) -> circular shift by each delay
        idx = (positions[None, :] + delay[:, None]) % l  # (k, L)
        # patterns: (B, H, E, k, L)
        patterns = vt[..., idx]
        out = jnp.einsum("bhekl,bk->bhel", patterns, tmp_corr)
    else:
        weights, delay = jax.lax.top_k(mean_value, top_k)  # (B, k)
        tmp_corr = jax.nn.softmax(weights, axis=-1)
        idx = (positions[None, None, :] + delay[:, :, None]) % l  # (B, k, L)
        # per-sample gather: vt (B,H,E,L), idx (B,k,L) -> (B,H,E,k,L)
        patterns = jax.vmap(lambda vb, ib: vb[..., ib])(vt, idx)
        out = jnp.einsum("bhekl,bk->bhel", patterns, tmp_corr)

    out = out.transpose(0, 3, 1, 2).astype(v.dtype)  # (B, L, H, E)
    corr_out = corr.transpose(0, 3, 1, 2)
    return out, corr_out
