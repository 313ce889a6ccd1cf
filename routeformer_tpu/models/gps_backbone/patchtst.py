"""PatchTST GPS backbone (Flax NNX).

Capability parity with reference
``routeformer/models/gps_backbone/PatchTST.py:15-216`` and its layer stack
(``layers/PatchTSTBackbone.py``: PatchTST_backbone:18, TSTiEncoder:186,
TSTEncoder:272, _MultiheadAttention:448 with residual-attention scores;
``layers/ReversibleInstanceNorm.py``: RevIN:10;
``layers/PatchTSTLayers.py``: positional_encoding:128):

- channel-independent patching: each input channel is unfolded into
  overlapping patches, linearly embedded, and encoded by a shared
  transformer (channels folded into the batch dim — MXU-friendly);
- RevIN reversible instance normalization around the whole backbone;
- residual attention (pre-softmax scores carried across layers);
- BatchNorm-style sublayer norm (the PatchTST default);
- optional trend/residual decomposition with two backbones;
- flatten head mapping (d_model * patch_num) -> pred_len per channel;
- final Linear(c_in -> c_out) projection (the routeformer adaptation,
  reference PatchTST.py:188).
"""

import math
import jax
import jax.numpy as jnp
from flax import nnx

from routeformer_tpu.models.gps_backbone.config import PatchTSTBackboneConfig
from routeformer_tpu.models.gps_backbone.linear import series_decomp


class RevIN(nnx.Module):
    """Reversible instance normalization (reference ReversibleInstanceNorm.py:10-70).

    Stateless reformulation: ``norm`` returns the statistics instead of
    storing them on the module (jit-pure), ``denorm`` takes them back.
    """

    def __init__(
        self, num_features: int, eps: float = 1e-5, affine: bool = True,
        subtract_last: bool = False, *, rngs: nnx.Rngs = None,
    ):
        self.eps = eps
        self.affine = affine
        self.subtract_last = subtract_last
        if affine:
            self.affine_weight = nnx.Param(jnp.ones((num_features,)))
            self.affine_bias = nnx.Param(jnp.zeros((num_features,)))

    def norm(self, x: jnp.ndarray):
        """x: (B, L, C) -> (normalized, stats)."""
        if self.subtract_last:
            loc = x[:, -1:, :]
        else:
            loc = jax.lax.stop_gradient(x.mean(axis=1, keepdims=True))
        stdev = jax.lax.stop_gradient(
            jnp.sqrt(x.var(axis=1, keepdims=True) + self.eps)
        )
        out = (x - loc) / stdev
        if self.affine:
            out = out * self.affine_weight[...] + self.affine_bias[...]
        return out, (loc, stdev)

    def denorm(self, x: jnp.ndarray, stats):
        loc, stdev = stats
        if self.affine:
            x = (x - self.affine_bias[...]) / (
                self.affine_weight[...] + self.eps * self.eps
            )
        return x * stdev + loc


def positional_encoding(pe: str, q_len: int, d_model: int, key) -> jnp.ndarray:
    """Initial value for the (learnable) positional encoding
    (reference PatchTSTLayers.py:128-160). 'zeros' (the default) is
    uniform(-0.02, 0.02)."""
    if pe in (None, "zeros"):
        return jax.random.uniform(key, (q_len, d_model), minval=-0.02, maxval=0.02)
    if pe == "zero":
        return jnp.broadcast_to(
            jax.random.uniform(key, (q_len, 1), minval=-0.02, maxval=0.02),
            (q_len, d_model),
        )
    if pe == "sincos":
        position = jnp.arange(q_len, dtype=jnp.float32)[:, None]
        div_term = jnp.exp(
            jnp.arange(0, d_model, 2, dtype=jnp.float32)
            * -(math.log(10000.0) / d_model)
        )
        w = jnp.zeros((q_len, d_model))
        w = w.at[:, 0::2].set(jnp.sin(position * div_term))
        w = w.at[:, 1::2].set(jnp.cos(position * div_term))
        w = w - w.mean()
        return w / (w.std() * 10)
    raise ValueError(f"positional encoding {pe!r} not supported")


class _BatchNormSublayer(nnx.Module):
    """Transpose-BatchNorm1d-Transpose over tokens (PatchTST 'BatchNorm')."""

    def __init__(self, d_model: int, *, rngs: nnx.Rngs):
        self.bn = nnx.BatchNorm(d_model, momentum=0.9, epsilon=1e-5, rngs=rngs)

    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        # nnx.BatchNorm normalizes the last dim over all others — equivalent
        # to torch BatchNorm1d on (B, C, L).
        return self.bn(x)


class TSTEncoderLayer(nnx.Module):
    """(reference PatchTSTBackbone.py:337-445)"""

    def __init__(
        self, d_model: int, n_heads: int, d_ff: int, norm: str = "BatchNorm",
        attn_dropout: float = 0.0, dropout: float = 0.0,
        activation: str = "gelu", res_attention: bool = True,
        pre_norm: bool = False, *, rngs: nnx.Rngs,
    ):
        d_k = d_model // n_heads
        self.n_heads = n_heads
        self.d_k = d_k
        self.res_attention = res_attention
        self.pre_norm = pre_norm
        self.scale = d_k**-0.5

        self.W_Q = nnx.Linear(d_model, d_k * n_heads, rngs=rngs)
        self.W_K = nnx.Linear(d_model, d_k * n_heads, rngs=rngs)
        self.W_V = nnx.Linear(d_model, d_k * n_heads, rngs=rngs)
        self.to_out = nnx.Linear(d_k * n_heads, d_model, rngs=rngs)
        self.dropout_attn = nnx.Dropout(dropout, rngs=rngs)
        self.dropout_ffn = nnx.Dropout(dropout, rngs=rngs)
        self.proj_dropout = nnx.Dropout(dropout, rngs=rngs)

        if "batch" in norm.lower():
            self.norm_attn = _BatchNormSublayer(d_model, rngs=rngs)
            self.norm_ffn = _BatchNormSublayer(d_model, rngs=rngs)
        else:
            self.norm_attn = nnx.LayerNorm(d_model, rngs=rngs)
            self.norm_ffn = nnx.LayerNorm(d_model, rngs=rngs)

        self.ff1 = nnx.Linear(d_model, d_ff, rngs=rngs)
        self.ff2 = nnx.Linear(d_ff, d_model, rngs=rngs)
        self.activation = (
            (lambda x: jax.nn.gelu(x, approximate=False))
            if activation == "gelu"
            else jax.nn.relu
        )

    def _attention(self, src, prev):
        b, l, _ = src.shape
        h, dk = self.n_heads, self.d_k
        q = self.W_Q(src).reshape(b, l, h, dk).transpose(0, 2, 1, 3)
        k = self.W_K(src).reshape(b, l, h, dk).transpose(0, 2, 1, 3)
        v = self.W_V(src).reshape(b, l, h, dk).transpose(0, 2, 1, 3)

        scores = jnp.einsum("bhld,bhsd->bhls", q, k) * self.scale
        if prev is not None:
            scores = scores + prev
        attn = jax.nn.softmax(scores, axis=-1)
        out = jnp.einsum("bhls,bhsd->bhld", attn, v)
        out = out.transpose(0, 2, 1, 3).reshape(b, l, h * dk)
        out = self.proj_dropout(self.to_out(out))
        return out, scores

    def __call__(self, src, prev=None):
        if self.pre_norm:
            src = self.norm_attn(src)
        src2, scores = self._attention(src, prev)
        src = src + self.dropout_attn(src2)
        if not self.pre_norm:
            src = self.norm_attn(src)

        if self.pre_norm:
            src = self.norm_ffn(src)
        src2 = self.ff2(self.dropout_ffn(self.activation(self.ff1(src))))
        src = src + self.dropout_ffn(src2)
        if not self.pre_norm:
            src = self.norm_ffn(src)

        if self.res_attention:
            return src, scores
        return src


class PatchTSTBackboneCore(nnx.Module):
    """RevIN + patching + channel-independent encoder + flatten head
    (reference PatchTSTBackbone.py:18-148)."""

    def __init__(self, cfg: PatchTSTBackboneConfig, c_in: int, *, rngs: nnx.Rngs):
        self.c_in = c_in
        self.patch_len = cfg.patch_len
        self.stride = cfg.stride
        self.padding_patch = cfg.padding_patch
        self.revin = cfg.revin
        self.individual = cfg.individual
        self.target_window = cfg.pred_len
        context_window = cfg.seq_len

        patch_num = int((context_window - cfg.patch_len) / cfg.stride + 1)
        if cfg.padding_patch == "end":
            patch_num += 1
        self.patch_num = patch_num

        if self.revin:
            self.revin_layer = RevIN(
                c_in, affine=cfg.affine, subtract_last=cfg.subtract_last, rngs=rngs
            )

        self.W_P = nnx.Linear(cfg.patch_len, cfg.d_model, rngs=rngs)
        self.W_pos = nnx.Param(
            positional_encoding("zeros", patch_num, cfg.d_model, rngs.params())
        )
        self.enc_dropout = nnx.Dropout(cfg.dropout, rngs=rngs)
        self.layers = nnx.List(
            [
                TSTEncoderLayer(
                    cfg.d_model, cfg.n_heads, cfg.d_ff,
                    dropout=cfg.dropout, res_attention=True, rngs=rngs,
                )
                for _ in range(cfg.e_layers)
            ]
        )

        head_nf = cfg.d_model * patch_num
        if self.individual:
            init = nnx.initializers.lecun_normal()
            self.head_weight = nnx.Param(
                init(rngs.params(), (c_in, head_nf, cfg.pred_len))
            )
            self.head_bias = nnx.Param(jnp.zeros((c_in, cfg.pred_len)))
        else:
            self.head = nnx.Linear(head_nf, cfg.pred_len, rngs=rngs)
        self.head_dropout = nnx.Dropout(cfg.head_dropout, rngs=rngs)

    def __call__(self, z: jnp.ndarray) -> jnp.ndarray:
        """z: (B, C, L) -> (B, C, pred_len) (torch layout kept for parity)."""
        b, c, l = z.shape
        stats = None
        if self.revin:
            zt = z.transpose(0, 2, 1)
            zt, stats = self.revin_layer.norm(zt)
            z = zt.transpose(0, 2, 1)

        if self.padding_patch == "end":
            # ReplicationPad1d((0, stride)): repeat last value stride times.
            pad = jnp.repeat(z[..., -1:], self.stride, axis=-1)
            z = jnp.concatenate([z, pad], axis=-1)

        # unfold into patches: (B, C, patch_num, patch_len)
        patches = jnp.stack(
            [
                z[..., i * self.stride : i * self.stride + self.patch_len]
                for i in range(self.patch_num)
            ],
            axis=2,
        )

        x = self.W_P(patches)  # (B, C, N, D)
        u = x.reshape(b * c, self.patch_num, -1)
        u = self.enc_dropout(u + self.W_pos[...])

        scores = None
        out = u
        for layer in self.layers:
            out, scores = layer(out, prev=scores)

        out = out.reshape(b, c, self.patch_num, -1)  # (B, C, N, D)
        out = out.transpose(0, 1, 3, 2)  # (B, C, D, N)
        flat = out.reshape(b, c, -1)  # (B, C, D*N)
        if self.individual:
            pred = jnp.einsum("bcf,cfp->bcp", flat, self.head_weight[...])
            pred = pred + self.head_bias[...][None]
        else:
            pred = self.head(flat)
        pred = self.head_dropout(pred)  # (B, C, pred_len)

        if self.revin:
            pt = pred.transpose(0, 2, 1)
            pt = self.revin_layer.denorm(pt, stats)
            pred = pt.transpose(0, 2, 1)
        return pred


class PatchTST(nnx.Module):
    """PatchTST model (reference PatchTST.py:15-216)."""

    def __init__(self, configs: PatchTSTBackboneConfig, *, rngs: nnx.Rngs):
        self.c_out = configs.c_out
        self.pred_len = configs.pred_len
        self.decomposition = configs.get("decomposition", False)
        self.kernel_size = configs.get("kernel_size", 25)
        c_in = configs.enc_in

        if self.decomposition:
            self.model_trend = PatchTSTBackboneCore(configs, c_in, rngs=rngs)
            self.model_res = PatchTSTBackboneCore(configs, c_in, rngs=rngs)
        else:
            self.model = PatchTSTBackboneCore(configs, c_in, rngs=rngs)
        self.projection = nnx.Linear(c_in, self.c_out, rngs=rngs)

    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        """(B, seq_len, C) -> (B, pred_len, c_out)."""
        if self.decomposition:
            res_init, trend_init = series_decomp(x, self.kernel_size)
            res = self.model_res(res_init.transpose(0, 2, 1))
            trend = self.model_trend(trend_init.transpose(0, 2, 1))
            out = (res + trend).transpose(0, 2, 1)
        else:
            out = self.model(x.transpose(0, 2, 1)).transpose(0, 2, 1)
        out = self.projection(out)
        return out[:, : self.pred_len, :]
