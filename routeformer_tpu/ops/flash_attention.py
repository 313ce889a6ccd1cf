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
