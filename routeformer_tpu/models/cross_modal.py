"""Perceiver-style cross-modal encoder/decoder (Flax NNX).

Capability parity with the model half of reference
``routeformer/models/cross_modal_transformer.py``:

- ``PerceiveEncoder`` (reference :372-433): circular-conv token embedding +
  sinusoidal PE, a stack of ProbSparse self-attention encoder layers (no
  distillation, preserving the temporal axis), linear projection, and
  truncation to the *last* ``out_len`` tokens.
- ``PerceiveDecoder`` (reference :436-503): token-embeds the query sequence,
  decodes with causal ProbSparse self-attention (``mix=True``) + dense
  cross-attention against the value sequence, projects, truncates to the
  last ``out_len`` tokens.

These are Routeformer's fusion workhorses: frame encoder (1 token/frame),
gaze encoder, gaze-video decoder (Q=gaze, KV=front-video features), and the
main video encoder (reference ``models/routeformer.py:70-122``).
"""

import math
import os
from typing import Optional

import jax
import jax.numpy as jnp
from flax import nnx

from routeformer_tpu.models.layers import (
    AttentionLayer,
    Decoder,
    DecoderLayer,
    Encoder,
    EncoderLayer,
    FullAttention,
    PositionalEmbedding,
    ProbAttention,
    TokenEmbedding,
)
from routeformer_tpu.ops.fusion_stack import (
    StackWeights,
    fused_perceive_stack,
    make_dropout_masks,
    sample_count_matrices,
)


class PerceiveEncoder(nnx.Module):
    """ProbSparse self-attention encoder emitting the last ``out_len`` tokens."""

    def __init__(
        self,
        in_channels: int,
        out_channels: int,
        out_len: int,
        factor: int = 5,
        d_model: int = 128,
        n_heads: int = 8,
        layers: int = 3,
        d_ff: Optional[int] = None,
        dropout: float = 0.1,
        activation: str = "gelu",
        output_attention: bool = False,
        compute_dtype: Optional[str] = None,
        *,
        rngs: nnx.Rngs,
    ):
        self.pred_len = out_len
        self.output_attention = output_attention
        d_ff = d_ff if d_ff is not None else 4 * d_model
        # bf16 computation (params f32, LayerNorms f32) — the TPU autocast
        # role for the fusion stack; None keeps full f32.
        dtype = jnp.bfloat16 if compute_dtype == "bfloat16" else None
        self.d_model = d_model
        self.n_heads = n_heads
        self.factor = factor
        self.d_ff = d_ff
        self.dropout_rate = dropout
        self.activation = activation
        self.compute_bf16 = compute_dtype == "bfloat16"

        # The cross-modal TokenEmbedding keeps torch's default conv bias
        # (reference cross_modal_transformer.py:356-361), unlike the
        # bias-free gps-backbone variant.
        self.value_embedding = TokenEmbedding(
            in_channels, d_model, use_bias=True, rngs=rngs
        )
        self.position_embedding = PositionalEmbedding(d_model)

        def make_layer(layer_rngs):
            return EncoderLayer(
                AttentionLayer(
                    ProbAttention(
                        False, factor,
                        attention_dropout=dropout,
                        output_attention=output_attention,
                        rngs=layer_rngs,
                    ),
                    d_model, n_heads, mix=False, dtype=dtype, rngs=layer_rngs,
                ),
                d_model, d_ff, dropout=dropout, activation=activation,
                dtype=dtype, rngs=layer_rngs,
            )

        # Identical-shape self-attention layers (no distillation — the
        # temporal shape must be preserved) are built stacked and applied
        # with nnx.scan: one layer body per encoder in the compiled program
        # instead of `layers` inlined copies. With attention outputs
        # requested, fall back to the unscanned stack (attns are collected
        # per layer there).
        self.scan_layers = not output_attention
        if self.scan_layers:
            create = nnx.split_rngs(splits=layers)(
                nnx.vmap(make_layer, in_axes=(0,), out_axes=0)
            )
            self.stacked_layers = create(rngs)
            self.norm = nnx.LayerNorm(d_model, rngs=rngs)
            self.encoder = None
        else:
            self.encoder = Encoder(
                [make_layer(rngs) for _ in range(layers)],
                None,
                norm_layer=nnx.LayerNorm(d_model, rngs=rngs),
            )
        self.projection = nnx.Linear(d_model, out_channels, rngs=rngs)
        # Dedicated stream for the fused-kernel path's sampling/dropout
        # randomness (forked LAST so every other stream's key derivation is
        # unchanged vs earlier checkpoints).
        self.kernel_rngs = rngs.dropout.fork()

    def _fused_kernel_mode(self) -> Optional[str]:
        """Fused-stack dispatch mode, or None for the nnx-scan formulation.

        ``ROUTEFORMER_FUSION_KERNEL`` values:
        - ``1``/``tpu``: Mosaic forward + Mosaic per-layer backward.
          Opt-in only — the Mosaic backward has never compiled through the
          axon remote-compile helper at flagship geometry (docs/PERF.md).
        - ``hybrid``: Mosaic forward + XLA per-layer-recompute backward
          (no Mosaic backward compile needed).
        - ``interpret`` / ``hybrid-interpret``: same dispatch with the
          forward kernel in interpreter mode (CPU tests).
        """
        if not self.scan_layers or self.d_model % self.n_heads:
            return None
        mode = os.getenv("ROUTEFORMER_FUSION_KERNEL", "0")
        if mode in ("0", "auto"):
            return None
        if os.getenv("ROUTEFORMER_PROBSPARSE", "masked") != "masked":
            return None  # the kernel implements the masked formulation
        if mode in ("interpret", "hybrid-interpret"):
            return mode
        if jax.default_backend() != "tpu":
            return None
        return "hybrid" if mode == "hybrid" else "tpu"

    def _run_fused_stack(self, x: jnp.ndarray, interpret: bool,
                         backward: str = "kernel") -> jnp.ndarray:
        layers = self.stacked_layers
        att = layers.attention
        n_layers = layers.norm1.scale[...].shape[0]
        r, l, d = x.shape

        # ProbSparse key sampling: eval reproduces the scan path's fixed
        # PRNGKey(0) per layer; training draws fresh per-layer keys
        # (reference cross_modal_transformer.py:96-117 uses a fresh
        # torch.randint each call).
        u_part = min(int(self.factor * math.ceil(math.log(l))), l)
        if att.inner_attention.deterministic:
            keys = jnp.broadcast_to(
                jax.random.PRNGKey(0)[None], (n_layers, 2)
            )
        else:
            keys = jax.random.split(self.kernel_rngs(), n_layers)
        cnt = sample_count_matrices(keys, n_layers, l, l, u_part)

        train_dropout = (
            not layers.dropout.deterministic and self.dropout_rate > 0.0
        )
        masks = (
            make_dropout_masks(
                self.kernel_rngs(), n_layers, r, l, d, self.d_ff,
                self.dropout_rate,
            )
            if train_dropout
            else None
        )

        weights = StackWeights(
            wq=att.query_projection.kernel[...],
            bq=att.query_projection.bias[...],
            wk=att.key_projection.kernel[...],
            bk=att.key_projection.bias[...],
            wv=att.value_projection.kernel[...],
            bv=att.value_projection.bias[...],
            wout=att.out_projection.kernel[...],
            bout=att.out_projection.bias[...],
            ln1_scale=layers.norm1.scale[...],
            ln1_bias=layers.norm1.bias[...],
            wff1=layers.ff1.kernel[...],
            bff1=layers.ff1.bias[...],
            wff2=layers.ff2.kernel[...],
            bff2=layers.ff2.bias[...],
            ln2_scale=layers.norm2.scale[...],
            ln2_bias=layers.norm2.bias[...],
        )
        return fused_perceive_stack(
            x, weights, cnt, masks,
            heads=self.n_heads,
            factor=self.factor,
            dropout_rate=self.dropout_rate if train_dropout else 0.0,
            activation=self.activation,
            compute_bf16=self.compute_bf16,
            interpret=interpret,
            backward=backward,
        )

    def __call__(self, x_enc: jnp.ndarray):
        enc_out = self.value_embedding(x_enc) + self.position_embedding(x_enc)
        kernel_mode = self._fused_kernel_mode()
        if kernel_mode is not None:
            enc_out = self._run_fused_stack(
                enc_out,
                interpret=kernel_mode.endswith("interpret"),
                backward="xla" if kernel_mode.startswith("hybrid")
                else "kernel",
            )
            enc_out = self.norm(enc_out)
            attns = None
        elif self.scan_layers:
            unroll = int(os.getenv("ROUTEFORMER_FUSION_UNROLL", "1"))

            @nnx.scan(in_axes=(0, nnx.Carry), out_axes=nnx.Carry, unroll=unroll)
            def run_layers(layer, x):
                x, _ = layer(x, attn_mask=None)
                return x

            enc_out = run_layers(self.stacked_layers, enc_out)
            enc_out = self.norm(enc_out)
            attns = None
        else:
            enc_out, attns = self.encoder(enc_out, attn_mask=None)
        enc_out = self.projection(enc_out)

        if self.output_attention:
            return enc_out[:, -self.pred_len :, :], attns
        return enc_out[:, -self.pred_len :, :]


class PerceiveDecoder(nnx.Module):
    """Causal ProbSparse self-attn + dense cross-attn decoder."""

    def __init__(
        self,
        query_channels: int,
        value_channels: int,
        out_channels: int,
        out_len: int,
        factor: int = 5,
        n_heads: int = 8,
        layers: int = 2,
        d_ff: Optional[int] = None,
        dropout: float = 0.1,
        activation: str = "gelu",
        mix: bool = True,
        compute_dtype: Optional[str] = None,
        *,
        rngs: nnx.Rngs,
    ):
        self.pred_len = out_len
        d_model = value_channels
        d_ff = d_ff if d_ff is not None else 4 * d_model
        dtype = jnp.bfloat16 if compute_dtype == "bfloat16" else None

        self.value_embedding = TokenEmbedding(
            query_channels, d_model, use_bias=True, rngs=rngs
        )
        self.position_embedding = PositionalEmbedding(d_model)
        self.decoder = Decoder(
            [
                DecoderLayer(
                    AttentionLayer(
                        ProbAttention(
                            True, factor,
                            attention_dropout=dropout,
                            output_attention=False, rngs=rngs,
                        ),
                        d_model, n_heads, mix=mix, dtype=dtype, rngs=rngs,
                    ),
                    AttentionLayer(
                        FullAttention(
                            False, factor,
                            attention_dropout=dropout,
                            output_attention=False, rngs=rngs,
                        ),
                        d_model, n_heads, mix=False, dtype=dtype, rngs=rngs,
                    ),
                    d_model, d_ff, dropout=dropout, activation=activation,
                    dtype=dtype, rngs=rngs,
                )
                for _ in range(layers)
            ],
            norm_layer=nnx.LayerNorm(d_model, rngs=rngs),
        )
        self.projection = nnx.Linear(d_model, out_channels, rngs=rngs)

    def __call__(self, x_enc: jnp.ndarray, x_dec: jnp.ndarray) -> jnp.ndarray:
        """x_enc: cross/value sequence; x_dec: query sequence."""
        dec_out = self.value_embedding(x_dec) + self.position_embedding(x_dec)
        dec_out = self.decoder(dec_out, x_enc, x_mask=None, cross_mask=None)
        dec_out = self.projection(dec_out)
        return dec_out[:, -self.pred_len :, :]
