"""Attention layer modules (Flax NNX) over the TPU attention ops.

Capability parity with reference
``routeformer/models/gps_backbone/layers/SelfAttentionFamily.py`` and the
attention half of ``models/cross_modal_transformer.py:36-197``:

- ``FullAttention``: dense softmax attention with optional causal mask and
  attention-weight dropout. Dispatches to the fused Pallas kernel when
  dropout is inactive (``ops/flash_attention.py``).
- ``ProbAttention``: Informer ProbSparse top-u attention
  (``ops.prob_sparse_attention``). The reference never applies its declared
  dropout inside ProbAttention — preserved. Key sampling uses an nnx rng
  stream in training and a fixed key in eval.
- ``AttentionLayer``: per-head q/k/v/out projections with the Informer
  ``mix`` quirk: when mixed, the per-head outputs are merged from the
  head-major layout ``(B, H, L, D) -> (B, L, H*D)`` (a deliberate
  head/position shuffle in the reference; the gps-backbone variant of
  ProbAttention is *always* mixed because it skips the transpose back —
  reference SelfAttentionFamily.py:165 vs cross_modal_transformer.py:166).

All modules honor nnx ``train()``/``eval()`` via ``deterministic`` flags.
"""

from typing import Optional

import jax
import jax.numpy as jnp
from flax import nnx

from routeformer_tpu.ops.attention import (
    dot_product_attention,
    prob_sparse_attention,
)


class FullAttention(nnx.Module):
    def __init__(
        self,
        mask_flag: bool = True,
        factor: int = 5,
        scale: Optional[float] = None,
        attention_dropout: float = 0.1,
        output_attention: bool = False,
        *,
        rngs: nnx.Rngs,
    ):
        self.mask_flag = mask_flag
        self.scale = scale
        self.output_attention = output_attention
        self.attention_dropout = attention_dropout
        self.deterministic = False
        # Fork a per-instance rng stream (exactly what nnx.Dropout does);
        # storing the shared Rngs/stream reference keeps unstacked shared
        # state under nnx.vmap/scan layer stacking.
        self.rng_stream = rngs.dropout.fork()

    def __call__(self, queries, keys, values, attn_mask=None):
        # attn_mask=None + mask_flag -> causal mask, matching the reference's
        # TriangularCausalMask default. Explicit masks are additive biases.
        deterministic = self.deterministic or self.attention_dropout == 0.0
        dropout_rng = None if deterministic else self.rng_stream()
        out, attn = dot_product_attention(
            queries,
            keys,
            values,
            causal=self.mask_flag and attn_mask is None,
            bias=attn_mask,
            scale=self.scale,
            dropout_rate=self.attention_dropout,
            deterministic=deterministic,
            dropout_rng=dropout_rng,
            need_weights=self.output_attention,
        )
        return out, attn


class ProbAttention(nnx.Module):
    def __init__(
        self,
        mask_flag: bool = True,
        factor: int = 5,
        scale: Optional[float] = None,
        attention_dropout: float = 0.1,
        output_attention: bool = False,
        *,
        rngs: nnx.Rngs,
    ):
        self.mask_flag = mask_flag
        self.factor = factor
        self.scale = scale
        self.output_attention = output_attention
        self.deterministic = False
        self.rng_stream = rngs.dropout.fork()

    def __call__(self, queries, keys, values, attn_mask=None):
        if self.deterministic:
            sample_rng = jax.random.PRNGKey(0)
        else:
            sample_rng = self.rng_stream()
        out, _ = prob_sparse_attention(
            queries,
            keys,
            values,
            factor=self.factor,
            causal=self.mask_flag,
            scale=self.scale,
            sample_rng=sample_rng,
        )
        return out, None


class AttentionLayer(nnx.Module):
    """q/k/v/out projections around an inner attention
    (reference SelfAttentionFamily.py:168-196 / cross_modal:169-197)."""

    def __init__(
        self,
        attention,
        d_model: int,
        n_heads: int,
        d_keys: Optional[int] = None,
        d_values: Optional[int] = None,
        mix: bool = False,
        dtype=None,
        *,
        rngs: nnx.Rngs,
    ):
        d_keys = d_keys or (d_model // n_heads)
        d_values = d_values or (d_model // n_heads)

        # dtype: computation dtype for the projections (bf16 on TPU; params
        # stay float32). The inner attention op computes softmax in f32.
        self.inner_attention = attention
        self.query_projection = nnx.Linear(d_model, d_keys * n_heads, dtype=dtype, rngs=rngs)
        self.key_projection = nnx.Linear(d_model, d_keys * n_heads, dtype=dtype, rngs=rngs)
        self.value_projection = nnx.Linear(d_model, d_values * n_heads, dtype=dtype, rngs=rngs)
        self.out_projection = nnx.Linear(d_values * n_heads, d_model, dtype=dtype, rngs=rngs)
        self.n_heads = n_heads
        self.mix = mix

    def __call__(self, queries, keys, values, attn_mask=None):
        b, l, _ = queries.shape
        s = keys.shape[1]
        h = self.n_heads

        if queries is keys and keys is values and (
            self.query_projection.kernel.shape
            == self.key_projection.kernel.shape
            == self.value_projection.kernel.shape
        ):
            # Self-attention fast path: one fused (d, 3*dk) matmul instead
            # of three dispatches. Exactly the same math — concatenation
            # along the OUTPUT dim computes each column identically — and
            # the parameters stay separate (torch-checkpoint parity).
            kernel = jnp.concatenate(
                [
                    self.query_projection.kernel[...],
                    self.key_projection.kernel[...],
                    self.value_projection.kernel[...],
                ],
                axis=1,
            )
            bias = jnp.concatenate(
                [
                    self.query_projection.bias[...],
                    self.key_projection.bias[...],
                    self.value_projection.bias[...],
                ]
            )
            dtype = self.query_projection.dtype
            x = queries
            if dtype is not None:
                x, kernel, bias = (
                    x.astype(dtype), kernel.astype(dtype), bias.astype(dtype)
                )
            qkv = x @ kernel + bias
            dk = self.query_projection.kernel.shape[1]
            q = qkv[..., :dk].reshape(b, l, h, -1)
            k = qkv[..., dk : 2 * dk].reshape(b, s, h, -1)
            v = qkv[..., 2 * dk :].reshape(b, s, h, -1)
        else:
            q = self.query_projection(queries).reshape(b, l, h, -1)
            k = self.key_projection(keys).reshape(b, s, h, -1)
            v = self.value_projection(values).reshape(b, s, h, -1)

        out, attn = self.inner_attention(q, k, v, attn_mask=attn_mask)
        if self.mix:
            # Informer quirk: merge heads from head-major layout.
            out = out.transpose(0, 2, 1, 3)  # (B, H, L, D)
            out = out.reshape(b, l, -1)
        else:
            out = out.reshape(b, l, -1)

        return self.out_projection(out), attn
