"""AutoBot-Ego baseline (Flax NNX).

Capability parity with reference ``experiments/autobots/autobots.py``:
``AutoBotEgo`` (:81) — temporal+social attention encoder over agent
dynamics, a learnable-query transformer decoder producing ``c`` bivariate-
Gaussian modes (``OutputModel`` :45), and mode probabilities from a
learnable-seed attention head; ``AutoBotAdapted`` (:342) — the ego-only
adapter: GPS -> velocities in, mode-probability-weighted mean trajectory
out, integrated by cumsum onto the last fix.

The torch ``nn.TransformerEncoderLayer``/``DecoderLayer`` building blocks
are re-implemented as post-norm blocks with their defaults (ReLU FFN,
post-norm); with the adapter's single always-present ego agent the
existence masks are constant no-ops and are folded away.
"""

import math
import jax
import jax.numpy as jnp
from flax import nnx

from routeformer_tpu.ops.attention import dot_product_attention


def _xavier_sqrt2():
    return nnx.initializers.xavier_normal()


class _MHA(nnx.Module):
    """Minimal multi-head attention with q/k/v/out projections."""

    def __init__(self, d_model: int, n_heads: int, *, rngs: nnx.Rngs):
        self.n_heads = n_heads
        self.wq = nnx.Linear(d_model, d_model, rngs=rngs)
        self.wk = nnx.Linear(d_model, d_model, rngs=rngs)
        self.wv = nnx.Linear(d_model, d_model, rngs=rngs)
        self.wo = nnx.Linear(d_model, d_model, rngs=rngs)

    def __call__(self, q, k, v, causal=False):
        b, l, d = q.shape
        s = k.shape[1]
        h = self.n_heads
        qh = self.wq(q).reshape(b, l, h, d // h)
        kh = self.wk(k).reshape(b, s, h, d // h)
        vh = self.wv(v).reshape(b, s, h, d // h)
        out, _ = dot_product_attention(qh, kh, vh, causal=causal)
        return self.wo(out.reshape(b, l, d))


class _EncoderBlock(nnx.Module):
    """torch TransformerEncoderLayer defaults: post-norm, ReLU FFN."""

    def __init__(self, d_model, n_heads, d_ff, dropout, *, rngs: nnx.Rngs):
        self.attn = _MHA(d_model, n_heads, rngs=rngs)
        self.ff1 = nnx.Linear(d_model, d_ff, rngs=rngs)
        self.ff2 = nnx.Linear(d_ff, d_model, rngs=rngs)
        self.norm1 = nnx.LayerNorm(d_model, rngs=rngs)
        self.norm2 = nnx.LayerNorm(d_model, rngs=rngs)
        self.dropout = nnx.Dropout(dropout, rngs=rngs)

    def __call__(self, x):
        x = self.norm1(x + self.dropout(self.attn(x, x, x)))
        y = self.ff2(self.dropout(jax.nn.relu(self.ff1(x))))
        return self.norm2(x + self.dropout(y))


class _DecoderBlock(nnx.Module):
    """torch TransformerDecoderLayer defaults: post-norm, causal self-attn."""

    def __init__(self, d_model, n_heads, d_ff, dropout, *, rngs: nnx.Rngs):
        self.self_attn = _MHA(d_model, n_heads, rngs=rngs)
        self.cross_attn = _MHA(d_model, n_heads, rngs=rngs)
        self.ff1 = nnx.Linear(d_model, d_ff, rngs=rngs)
        self.ff2 = nnx.Linear(d_ff, d_model, rngs=rngs)
        self.norm1 = nnx.LayerNorm(d_model, rngs=rngs)
        self.norm2 = nnx.LayerNorm(d_model, rngs=rngs)
        self.norm3 = nnx.LayerNorm(d_model, rngs=rngs)
        self.dropout = nnx.Dropout(dropout, rngs=rngs)

    def __call__(self, tgt, memory):
        tgt = self.norm1(tgt + self.dropout(self.self_attn(tgt, tgt, tgt, causal=True)))
        tgt = self.norm2(tgt + self.dropout(self.cross_attn(tgt, memory, memory)))
        y = self.ff2(self.dropout(jax.nn.relu(self.ff1(tgt))))
        return self.norm3(tgt + self.dropout(y))


def _sinusoid_table(max_len: int, d_model: int) -> jnp.ndarray:
    position = jnp.arange(max_len, dtype=jnp.float32)[:, None]
    div_term = jnp.exp(
        jnp.arange(0, d_model, 2, dtype=jnp.float32)
        * (-math.log(10000.0) / d_model)
    )
    pe = jnp.zeros((max_len, d_model))
    pe = pe.at[:, 0::2].set(jnp.sin(position * div_term))
    pe = pe.at[:, 1::2].set(jnp.cos(position * div_term))
    return pe


class OutputModel(nnx.Module):
    """Bivariate-Gaussian head (reference autobots.py:45-79)."""

    def __init__(self, d_k: int = 64, *, rngs: nnx.Rngs):
        self.d_k = d_k
        self.l1 = nnx.Linear(d_k, d_k, kernel_init=_xavier_sqrt2(), rngs=rngs)
        self.l2 = nnx.Linear(d_k, d_k, kernel_init=_xavier_sqrt2(), rngs=rngs)
        self.l3 = nnx.Linear(d_k, 5, kernel_init=_xavier_sqrt2(), rngs=rngs)
        self.min_stdev = 0.01

    def __call__(self, x):
        """x: (B, T, d_k) -> (B, T, 5) Gaussian params."""
        h = jax.nn.relu(self.l1(x))
        h = jax.nn.relu(self.l2(h))
        p = self.l3(h)
        x_mean, y_mean = p[..., 0], p[..., 1]
        x_sigma = jax.nn.softplus(p[..., 2]) + self.min_stdev
        y_sigma = jax.nn.softplus(p[..., 3]) + self.min_stdev
        rho = jnp.tanh(p[..., 4]) * 0.9
        return jnp.stack([x_mean, y_mean, x_sigma, y_sigma, rho], axis=-1)


class AutoBotEgo(nnx.Module):
    """Ego-only AutoBot (reference autobots.py:81-340, maps disabled)."""

    def __init__(
        self,
        d_k: int = 128,
        c: int = 5,
        T: int = 30,
        L_enc: int = 1,
        dropout: float = 0.0,
        k_attr: int = 2,
        num_heads: int = 16,
        L_dec: int = 1,
        tx_hidden_size: int = 384,
        *,
        rngs: nnx.Rngs,
    ):
        self.d_k = d_k
        self.c = c
        self.T = T
        self.L_enc = L_enc
        self.L_dec = L_dec

        self.agents_dynamic_encoder = nnx.Linear(
            k_attr, d_k, kernel_init=_xavier_sqrt2(), rngs=rngs
        )
        self.temporal_attn_layers = nnx.List(
            [_EncoderBlock(d_k, num_heads, tx_hidden_size, dropout, rngs=rngs)
             for _ in range(L_enc)]
        )
        self.social_attn_layers = nnx.List(
            [_EncoderBlock(d_k, num_heads, tx_hidden_size, dropout, rngs=rngs)
             for _ in range(L_enc)]
        )
        xavier_u = nnx.initializers.xavier_uniform()
        self.Q = nnx.Param(xavier_u(rngs.params(), (T, 1, c, d_k)))
        self.tx_decoder = nnx.List(
            [_DecoderBlock(d_k, num_heads, tx_hidden_size, dropout, rngs=rngs)
             for _ in range(L_dec)]
        )
        self.pos_table = _sinusoid_table(100, d_k)
        self.output_model = OutputModel(d_k, rngs=rngs)
        self.P = nnx.Param(xavier_u(rngs.params(), (c, 1, d_k)))
        self.prob_decoder = _MHA(d_k, num_heads, rngs=rngs)
        self.prob_predictor = nnx.Linear(
            d_k, 1, kernel_init=_xavier_sqrt2(), rngs=rngs
        )

    def __call__(self, ego_in: jnp.ndarray):
        """ego_in: (B, T_obs, k_attr+1) with an existence-mask last channel.

        Returns (out_dists (c, T, B, 5), mode_probs (B, c)).
        """
        b, t_obs, _ = ego_in.shape
        ego_tensor = ego_in[:, :, :2]

        # encoder: temporal attention over time (social attention over the
        # single ego agent degenerates to per-timestep self-attention).
        emb = self.agents_dynamic_encoder(ego_tensor)  # (B, T, d_k)
        for i in range(self.L_enc):
            x = emb + self.pos_table[None, :t_obs]
            emb = self.temporal_attn_layers[i](x)
            # social attention over N=1 agents: sequence length 1 per token
            social = emb.reshape(b * t_obs, 1, self.d_k)
            emb = self.social_attn_layers[i](social).reshape(b, t_obs, self.d_k)
        ego_emb = emb  # (B, T_obs, d_k)

        # decoder: c modes folded into the batch dim
        context = jnp.repeat(ego_emb, self.c, axis=0)  # (B*c, T_obs, d_k)
        out_seq = (
            self.Q[...]
            .transpose(1, 2, 0, 3)  # (1, c, T, d_k)
            .reshape(self.c, self.T, self.d_k)
        )
        out_seq = jnp.tile(out_seq, (b, 1, 1))  # (B*c, T, d_k)
        for d in range(self.L_dec):
            out_seq = self.tx_decoder[d](out_seq, context)
        out_dists = (
            self.output_model(out_seq)
            .reshape(b, self.c, self.T, 5)
            .transpose(1, 2, 0, 3)
        )  # (c, T, B, 5)

        # mode probabilities
        mode_seed = jnp.tile(
            self.P[...].transpose(1, 0, 2), (b, 1, 1)
        )  # (B, c, d_k)
        mode_emb = self.prob_decoder(mode_seed, ego_emb, ego_emb)
        logits = self.prob_predictor(mode_emb)[..., 0]  # (B, c)
        mode_probs = jax.nn.softmax(logits, axis=-1)
        return out_dists, mode_probs


class AutoBotAdapted(nnx.Module):
    """Ego-only AutoBot adapter (reference autobots.py:342-387)."""

    def __init__(self, configs, *, rngs: nnx.Rngs):
        self.configs = configs
        self.model = AutoBotEgo(
            d_k=configs.encoder_hidden_size,
            c=5,
            T=configs.gps_backbone_config.pred_len,
            L_enc=configs.gps_backbone_config.e_layers,
            dropout=0.0,
            k_attr=2,
            num_heads=configs.encoder_heads,
            L_dec=configs.gps_backbone_config.d_layers,
            tx_hidden_size=configs.encoder_d_ff,
            rngs=rngs,
        )

    def __call__(self, batch: dict, target_batch=None):
        gps = batch["gps"].astype(jnp.float32)
        motion_vector = gps[:, 1:, :] - gps[:, :-1, :]
        motions = jnp.pad(motion_vector, ((0, 0), (1, 0), (0, 0)))
        motions = jnp.concatenate(
            [motions, jnp.ones_like(motions[:, :, :1])], axis=2
        )

        out_dists, mode_probs = self.model(motions)

        x_mean = out_dists[:, :, :, 0]  # (c, T, B)
        y_mean = out_dists[:, :, :, 1]
        probs = mode_probs.T[:, None, :]  # (c, 1, B)

        expected_x = (x_mean * probs).sum(axis=0).T  # (B, T)
        expected_y = (y_mean * probs).sum(axis=0).T

        trajs = jnp.stack([expected_x, expected_y], axis=2)  # (B, T, 2)
        last_input_gps = gps[:, -1:, :]
        return last_input_gps + jnp.cumsum(trajs, axis=1)
