"""Fused dot-product attention Pallas kernel for TPU.

Plays the performance role of every attention variant in the reference
(reference ``routeformer/models/cross_modal_transformer.py:36-166`` and
``models/gps_backbone/layers/SelfAttentionFamily.py``): one MXU-resident
kernel computing ``softmax(q k^T / sqrt(d)) v`` with optional causal masking.

Design notes (TPU-first):

- Sequence lengths in this workload are short (40-1600 tokens), so K/V for
  one (batch, head) always fit VMEM. The kernel therefore runs a *single
  fused pass* per query block — scores, mask, softmax and the PV matmul never
  leave VMEM, which is the speed-of-light plan for these shapes (one HBM read
  of q/k/v, one write of o).
- The grid is ``(batch*heads, q_blocks)``; lane/sublane alignment is handled
  by padding L and the head dim to multiples of 128 in the wrapper and
  masking padded key columns with -inf inside the kernel.
- float32 softmax accumulation regardless of input dtype (bf16 in, f32
  accumulate, cast back out).
"""

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_NEG_INF = -1e30


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def _flash_kernel(q_ref, k_ref, v_ref, o_ref, *, scale, causal, l_q, l_k, block_q):
    q = q_ref[0].astype(jnp.float32)  # (BLOCK_Q, E)
    k = k_ref[0].astype(jnp.float32)  # (LK_PAD, E)
    v = v_ref[0].astype(jnp.float32)  # (LK_PAD, E)

    s = jax.lax.dot_general(
        q,
        k,
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # (BLOCK_Q, LK_PAD)
    s = s * scale

    lk_pad = k.shape[0]
    col_ids = jax.lax.broadcasted_iota(jnp.int32, (block_q, lk_pad), 1)
    # Mask padded key columns.
    mask = col_ids >= l_k
    if causal:
        qblock = pl.program_id(1)
        row_ids = (
            jax.lax.broadcasted_iota(jnp.int32, (block_q, lk_pad), 0)
            + qblock * block_q
        )
        mask = jnp.logical_or(mask, col_ids > row_ids)
    s = jnp.where(mask, _NEG_INF, s)

    s_max = jnp.max(s, axis=-1, keepdims=True)
    p = jnp.exp(s - s_max)
    denom = jnp.sum(p, axis=-1, keepdims=True)
    p = p / denom

    o = jax.lax.dot_general(
        p,
        v,
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    o_ref[0] = o.astype(o_ref.dtype)


def _reference_attention_bhle(q, k, v, causal, scale):
    """Pure-XLA twin of the kernel, used only to derive the backward pass."""
    s = jnp.einsum(
        "ble,bse->bls", q.astype(jnp.float32), k.astype(jnp.float32)
    ) * scale
    if causal:
        l_q, l_k = q.shape[1], k.shape[1]
        row = jax.lax.broadcasted_iota(jnp.int32, (l_q, l_k), 0)
        col = jax.lax.broadcasted_iota(jnp.int32, (l_q, l_k), 1)
        s = jnp.where((col > row)[None], _NEG_INF, s)
    p = jax.nn.softmax(s, axis=-1)
    return jnp.einsum("bls,bsd->bld", p, v.astype(jnp.float32)).astype(q.dtype)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4))
def flash_attention_bhle(
    q: jnp.ndarray, k: jnp.ndarray, v: jnp.ndarray, causal: bool, scale: float
) -> jnp.ndarray:
    """Fused attention on ``(BH, L, E)`` tensors (already head-flattened).

    Forward runs the Pallas kernel (pads L and E to lane/sublane multiples,
    unpads after); backward recomputes attention through the XLA twin —
    pallas_call has no autodiff rule, and for these short sequences the
    recompute backward is a handful of fused MXU matmuls.
    """
    return _flash_forward(q, k, v, causal, scale)


def _flash_vjp_fwd(q, k, v, causal, scale):
    return _flash_forward(q, k, v, causal, scale), (q, k, v)


def _flash_vjp_bwd(causal, scale, residuals, g):
    q, k, v = residuals
    _, vjp = jax.vjp(
        lambda q_, k_, v_: _reference_attention_bhle(q_, k_, v_, causal, scale),
        q, k, v,
    )
    return vjp(g)


flash_attention_bhle.defvjp(_flash_vjp_fwd, _flash_vjp_bwd)


def _flash_window_kernel(
    q_ref, k_ref, v_ref, b_ref, s_ref, o_ref, *, l_k, n_heads, d, cosine
):
    """Fused multi-head window attention:
    ``softmax(scale_h * (q̂ k̂ᵀ) + bias) v`` per head (cosine mode; plain
    ``q kᵀ`` otherwise). Scores never leave VMEM (the SwinV2 role, where the
    materialized f32 score tensor is gigabytes), ALL heads of a window ride
    one grid step — per-head grids drown in step overhead (window attention
    is thousands of tiny (n², d=32) problems) — and the cosine
    normalization runs in-kernel so q/k stream from HBM in bf16 with no
    separate normalize pass.

    Operands ride in TRANSPOSED (H*d, n) layout so the lane (minor) dim is
    the token axis: a (n, 32)-minor layout would be lane-padded 4x, and the
    head dim slices cheaply on sublanes.
    """
    n_pad = q_ref.shape[2]
    q = q_ref[0].astype(jnp.float32).reshape(n_heads, d, n_pad)
    k = k_ref[0].astype(jnp.float32).reshape(n_heads, d, n_pad)
    v = v_ref[0].astype(jnp.float32).reshape(n_heads, d, n_pad)

    if cosine:
        q = q / jnp.maximum(
            jnp.sqrt(jnp.sum(q * q, axis=1, keepdims=True)), 1e-6
        )
        k = k / jnp.maximum(
            jnp.sqrt(jnp.sum(k * k, axis=1, keepdims=True)), 1e-6
        )

    # bf16 matmul inputs (f32 accumulate): full-rate MXU, and no worse
    # than the XLA einsum path this replaces (bf16 operands there too).
    mm_dtype = o_ref.dtype if o_ref.dtype == jnp.bfloat16 else jnp.float32
    s = jax.lax.dot_general(
        q.astype(mm_dtype), k.astype(mm_dtype),
        dimension_numbers=(((1,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
    )  # (H, N_PAD, N_PAD)
    if cosine:
        s = s * s_ref[:, :1][..., None]
    s = s + b_ref[0].astype(jnp.float32).reshape(n_heads, n_pad, n_pad)

    col_ids = jax.lax.broadcasted_iota(jnp.int32, (n_heads, n_pad, n_pad), 2)
    s = jnp.where(col_ids >= l_k, _NEG_INF, s)

    s_max = jnp.max(s, axis=-1, keepdims=True)
    p = jnp.exp(s - s_max)
    p = p / jnp.sum(p, axis=-1, keepdims=True)
    o = jax.lax.dot_general(
        v.astype(mm_dtype), p.astype(mm_dtype),
        dimension_numbers=(((2,), (2,)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
    )  # (H, d, N_PAD)
    o_ref[0] = o.reshape(n_heads * d, n_pad).astype(o_ref.dtype)


def _reference_window_attention(q, k, v, bias, scale, cosine):
    """XLA twin of the window kernel (derives the backward pass)."""
    b = q.shape[0]
    nb = bias.shape[0]
    qf, kf = q.astype(jnp.float32), k.astype(jnp.float32)
    if cosine:
        qf = qf / jnp.maximum(
            jnp.linalg.norm(qf, axis=-1, keepdims=True), 1e-6
        )
        kf = kf / jnp.maximum(
            jnp.linalg.norm(kf, axis=-1, keepdims=True), 1e-6
        )
    s = jnp.einsum("bhnd,bhmd->bhnm", qf, kf)
    if cosine:
        s = s * scale[None, :, None, None]
    s = s + jnp.tile(bias, (b // nb, 1, 1, 1))
    p = jax.nn.softmax(s, axis=-1)
    return jnp.einsum("bhnm,bhmd->bhnd", p, v.astype(jnp.float32)).astype(
        v.dtype
    )


def flash_window_attention(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    bias: jnp.ndarray,
    scale: jnp.ndarray = None,
    cosine: bool = False,
) -> jnp.ndarray:
    """Fused biased multi-head attention on ``(B, H, N, d)`` tensors.

    ``bias`` is ``(NB, H, N, N)`` with ``B % NB == 0``: batch row ``b``
    uses ``bias[b % NB]`` — the SwinV2 layout where the window kind varies
    fastest and the (CPB + shift-mask) bias repeats across frames.

    ``cosine=True`` runs SwinV2 cosine attention in-kernel: q/k are
    L2-normalized per token and the per-head ``scale`` (shape ``(H,)``)
    multiplies the scores — q/k then stream from HBM in their (bf16)
    storage dtype with no separate normalize pass.
    """
    if scale is None:
        scale = jnp.ones((q.shape[1],), jnp.float32)
    # custom_vjp doesn't apply defaults; pass every arg explicitly.
    return _flash_window_vjp(q, k, v, bias, scale, cosine)


@functools.partial(jax.custom_vjp, nondiff_argnums=(5,))
def _flash_window_vjp(q, k, v, bias, scale, cosine):
    return _flash_window_forward(q, k, v, bias, scale, cosine)


def _flash_window_vjp_fwd(q, k, v, bias, scale, cosine):
    # fwd receives args in their original order (nondiff included);
    # only bwd gets the nondiff args as leading arguments.
    return (
        _flash_window_forward(q, k, v, bias, scale, cosine),
        (q, k, v, bias, scale),
    )


def _flash_window_vjp_bwd(cosine, residuals, g):
    q, k, v, bias, scale = residuals
    _, vjp = jax.vjp(
        lambda q_, k_, v_, b_, s_: _reference_window_attention(
            q_, k_, v_, b_, s_, cosine
        ),
        q, k, v, bias, scale,
    )
    return vjp(g)


_flash_window_vjp.defvjp(_flash_window_vjp_fwd, _flash_window_vjp_bwd)


@functools.partial(jax.jit, static_argnames=("cosine",))
def _flash_window_forward(q, k, v, bias, scale, cosine):
    # Operands are transposed to (B, H*d, N) so the lane (minor) dim is the
    # token axis: window-attention head dims are 32, and an (N, 32)-minor
    # f32 layout is lane-padded 4x in HBM (gigabytes at SwinV2 stage-1
    # frame counts). H*d rides as sublanes, sliced per head in-kernel.
    b, h, n, d = q.shape
    nb = bias.shape[0]
    assert b % nb == 0, f"batch {b} not a multiple of bias batch {nb}"
    reps = b // nb

    n_pad = _round_up(n, 128)

    def to_t(x):
        x = x.transpose(0, 1, 3, 2).reshape(b, h * d, n)
        return jnp.pad(x, ((0, 0), (0, 0), (0, n_pad - n)))

    qt, kt, vt = to_t(q), to_t(k), to_t(v)
    bp = jnp.pad(
        bias.astype(jnp.float32),
        ((0, 0), (0, 0), (0, n_pad - n), (0, n_pad - n)),
    ).reshape(nb, h * n_pad, n_pad)
    if scale is None:
        scale = jnp.ones((h,), jnp.float32)
    sp = jnp.broadcast_to(
        scale.astype(jnp.float32).reshape(h, 1), (h, 128)
    )

    # Grid (window-kind, repeat) with repeat fastest: the bias block index
    # is constant across consecutive repeat steps, so Mosaic elides its
    # re-fetch — the (H*N, N) f32 bias tile is the largest operand and is
    # shared by every `reps`-th batch row.
    grid = (nb, reps)

    out = pl.pallas_call(
        functools.partial(
            _flash_window_kernel, l_k=n, n_heads=h, d=d, cosine=cosine
        ),
        out_shape=jax.ShapeDtypeStruct((b, h * d, n_pad), v.dtype),
        grid=grid,
        in_specs=[
            pl.BlockSpec(
                (1, h * d, n_pad),
                lambda w, r, nb=nb: (r * nb + w, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (1, h * d, n_pad),
                lambda w, r, nb=nb: (r * nb + w, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (1, h * d, n_pad),
                lambda w, r, nb=nb: (r * nb + w, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (1, h * n_pad, n_pad),
                lambda w, r: (w, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (h, 128),
                lambda w, r: (0, 0),
                memory_space=pltpu.VMEM,
            ),
        ],
        out_specs=pl.BlockSpec(
            (1, h * d, n_pad),
            lambda w, r, nb=nb: (r * nb + w, 0, 0),
            memory_space=pltpu.VMEM,
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * b * h * n_pad * n_pad * 2 * d,
            bytes_accessed=4 * b * 3 * h * d * n_pad + 4 * nb * h * n_pad * n_pad,
            transcendentals=b * h * n_pad * n_pad,
        ),
    )(qt, kt, vt, bp, sp)

    return out.reshape(b, h, d, n_pad)[:, :, :, :n].transpose(0, 1, 3, 2)


@functools.partial(jax.jit, static_argnames=("causal", "scale"))
def _flash_forward(
    q: jnp.ndarray, k: jnp.ndarray, v: jnp.ndarray, causal: bool, scale: float
) -> jnp.ndarray:
    bh, l_q, e = q.shape
    _, l_k, e_v = v.shape

    block_q = min(128, _round_up(l_q, 8))
    l_q_pad = _round_up(l_q, block_q)
    l_k_pad = _round_up(l_k, 128)
    e_pad = _round_up(e, 128)
    ev_pad = _round_up(e_v, 128)

    qp = jnp.pad(q, ((0, 0), (0, l_q_pad - l_q), (0, e_pad - e)))
    kp = jnp.pad(k, ((0, 0), (0, l_k_pad - l_k), (0, e_pad - e)))
    vp = jnp.pad(v, ((0, 0), (0, l_k_pad - l_k), (0, ev_pad - e_v)))

    grid = (bh, l_q_pad // block_q)

    out = pl.pallas_call(
        functools.partial(
            _flash_kernel,
            scale=scale,
            causal=causal,
            l_q=l_q,
            l_k=l_k,
            block_q=block_q,
        ),
        out_shape=jax.ShapeDtypeStruct((bh, l_q_pad, ev_pad), q.dtype),
        grid=grid,
        in_specs=[
            pl.BlockSpec(
                (1, block_q, e_pad), lambda b, i: (b, i, 0), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(
                (1, l_k_pad, e_pad), lambda b, i: (b, 0, 0), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(
                (1, l_k_pad, ev_pad), lambda b, i: (b, 0, 0), memory_space=pltpu.VMEM
            ),
        ],
        out_specs=pl.BlockSpec(
            (1, block_q, ev_pad), lambda b, i: (b, i, 0), memory_space=pltpu.VMEM
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * bh * l_q_pad * l_k_pad * (e_pad + ev_pad),
            bytes_accessed=4 * bh * (l_q_pad * e_pad + l_k_pad * (e_pad + ev_pad)),
            transcendentals=bh * l_q_pad * l_k_pad,
        ),
    )(qp, kp, vp)

    return out[:, :l_q, :e_v]
