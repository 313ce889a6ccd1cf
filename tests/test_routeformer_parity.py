"""Full-model forward parity: JAX Routeformer vs a hand-built torch twin.

The strongest offline substitute for a real-data ADE/FDE comparison (no
GEM/DR(eye)VE footage ships in this container): a torch model mirroring the
reference flagship semantics end-to-end — motion features (angle/norm/accel)
-> Informer (DataEmbedding, ProbSparse encoder with distil convs, smart
decoder) -> cumsum integration onto the last fix (reference
``models/routeformer.py:124-395`` + ``gps_backbone/Informer.py:18-167``) —
with identical weights loaded into the JAX model through the generic
``convert.load_torch_state_dict`` path.

ProbSparse is made exhaustive (factor large enough that ``u >= L``), which
reduces it EXACTLY to dense (causal) attention on both sides — the top-u
selection covers every query — so the twin uses dense attention and the
comparison is deterministic. The sub-exhaustive top-u path is covered
component-level in tests/test_ops_attention.py.

Twin module names mirror the flax paths so the loader maps every parameter
without fuzzy matching; the test asserts full coverage.
"""

import math

import numpy as np
import jax.numpy as jnp
import torch
import torch.nn as nn
import torch.nn.functional as F
from flax import nnx

from routeformer_tpu.models import RouteformerConfig
from routeformer_tpu.models.gps_backbone import GPSBackboneConfig, Informer
from routeformer_tpu.models.routeformer import Routeformer
from routeformer_tpu.models.video_backbone.convert import load_torch_state_dict

SEQ_LEN, PRED_LEN = 40, 30
D_MODEL, N_HEADS, E_LAYERS, D_LAYERS, D_FF = 64, 4, 3, 1, 128
ENC_IN = 5  # motion(2) + angle + norm + accel
C_OUT = 2
FACTOR = 100  # u = min(factor*ceil(ln L), L) = L -> exhaustive ProbSparse


class TorchAttentionLayer(nn.Module):
    """Dense equivalent of the exhaustive ProbSparse AttentionLayer,
    including the Informer ``mix`` head-major merge quirk."""

    def __init__(self, d_model, n_heads, causal):
        super().__init__()
        self.query_projection = nn.Linear(d_model, d_model)
        self.key_projection = nn.Linear(d_model, d_model)
        self.value_projection = nn.Linear(d_model, d_model)
        self.out_projection = nn.Linear(d_model, d_model)
        self.n_heads = n_heads
        self.causal = causal

    def forward(self, q_in, k_in, v_in):
        b, l, _ = q_in.shape
        s = k_in.shape[1]
        h = self.n_heads
        q = self.query_projection(q_in).view(b, l, h, -1).permute(0, 2, 1, 3)
        k = self.key_projection(k_in).view(b, s, h, -1).permute(0, 2, 1, 3)
        v = self.value_projection(v_in).view(b, s, h, -1).permute(0, 2, 1, 3)
        scores = (q @ k.transpose(-2, -1)) / math.sqrt(q.shape[-1])
        if self.causal:
            mask = torch.triu(torch.ones(l, s, dtype=torch.bool), diagonal=1)
            scores = scores.masked_fill(mask, float("-inf"))
        out = scores.softmax(-1) @ v  # (B, H, L, D)
        # mix=True merge: flatten from head-major memory layout
        out = out.reshape(b, l, -1)
        return self.out_projection(out)


class TorchEncoderLayer(nn.Module):
    def __init__(self):
        super().__init__()
        self.attention = TorchAttentionLayer(D_MODEL, N_HEADS, causal=False)
        self.ff1 = nn.Linear(D_MODEL, D_FF)
        self.ff2 = nn.Linear(D_FF, D_MODEL)
        self.norm1 = nn.LayerNorm(D_MODEL, eps=1e-6)
        self.norm2 = nn.LayerNorm(D_MODEL, eps=1e-6)

    def forward(self, x):
        x = x + self.attention(x, x, x)
        y = x = self.norm1(x)
        y = self.ff2(F.relu(self.ff1(y)))
        return self.norm2(x + y)


class TorchConvLayer(nn.Module):
    """Distil stage: circular conv k3 pad2 + BN + ELU + maxpool(3,2,1)."""

    def __init__(self):
        super().__init__()
        self.conv = nn.Conv1d(
            D_MODEL, D_MODEL, 3, padding=2, padding_mode="circular"
        )
        self.norm = nn.BatchNorm1d(D_MODEL)

    def forward(self, x):  # (B, L, C)
        x = self.conv(x.permute(0, 2, 1))
        x = F.elu(self.norm(x))
        x = F.max_pool1d(x, 3, stride=2, padding=1)
        return x.permute(0, 2, 1)


class TorchDecoderLayer(nn.Module):
    def __init__(self):
        super().__init__()
        self.self_attention = TorchAttentionLayer(D_MODEL, N_HEADS, causal=True)
        self.cross_attention = TorchAttentionLayer(D_MODEL, N_HEADS, causal=False)
        self.ff1 = nn.Linear(D_MODEL, D_FF)
        self.ff2 = nn.Linear(D_FF, D_MODEL)
        self.norm1 = nn.LayerNorm(D_MODEL, eps=1e-6)
        self.norm2 = nn.LayerNorm(D_MODEL, eps=1e-6)
        self.norm3 = nn.LayerNorm(D_MODEL, eps=1e-6)

    def forward(self, x, cross):
        x = self.norm1(x + self.self_attention(x, x, x))
        x = x + self.cross_attention(x, cross, cross)
        y = x = self.norm2(x)
        y = self.ff2(F.relu(self.ff1(y)))
        return self.norm3(x + y)


class TorchDataEmbedding(nn.Module):
    def __init__(self, c_in):
        super().__init__()
        self.value_embedding = nn.Module()
        self.value_embedding.conv = nn.Conv1d(
            c_in, D_MODEL, 3, padding=1, padding_mode="circular", bias=False
        )
        self.temporal_embedding = nn.Module()
        self.temporal_embedding.linear = nn.Linear(1, D_MODEL, bias=False)

    def forward(self, x, x_mark):
        val = self.value_embedding.conv(x.permute(0, 2, 1)).permute(0, 2, 1)
        tmp = self.temporal_embedding.linear(x_mark)
        length = x.shape[1]
        position = torch.arange(length, dtype=torch.float32).unsqueeze(1)
        div = torch.exp(
            torch.arange(0, D_MODEL, 2, dtype=torch.float32)
            * -(math.log(10000.0) / D_MODEL)
        )
        pe = torch.zeros(length, D_MODEL)
        pe[:, 0::2] = torch.sin(position * div)
        pe[:, 1::2] = torch.cos(position * div)
        return val + tmp + pe.unsqueeze(0)


class TorchInformer(nn.Module):
    def __init__(self):
        super().__init__()
        self.enc_embedding = TorchDataEmbedding(ENC_IN)
        self.dec_embedding = TorchDataEmbedding(ENC_IN)
        self.encoder = nn.Module()
        self.encoder.attn_layers = nn.ModuleList(
            [TorchEncoderLayer() for _ in range(E_LAYERS)]
        )
        self.encoder.conv_layers = nn.ModuleList(
            [TorchConvLayer() for _ in range(E_LAYERS - 1)]
        )
        self.encoder.norm = nn.LayerNorm(D_MODEL, eps=1e-6)
        self.decoder = nn.Module()
        self.decoder.layers = nn.ModuleList(
            [TorchDecoderLayer() for _ in range(D_LAYERS)]
        )
        self.decoder.norm = nn.LayerNorm(D_MODEL, eps=1e-6)
        self.decoder.projection = nn.Linear(D_MODEL, C_OUT)

    def forward(self, x):
        b, l, _ = x.shape
        marks_enc = torch.arange(l, dtype=torch.float32).view(1, l, 1).expand(b, l, 1)
        # smart decoder: seed with the repeated last input token
        x_dec = torch.cat([x, x[:, -1:, :].repeat(1, PRED_LEN, 1)], 1)
        ld = l + PRED_LEN
        marks_dec = (
            torch.arange(ld, dtype=torch.float32).view(1, ld, 1).expand(b, ld, 1)
        )

        h = self.enc_embedding(x, marks_enc)
        for attn, conv in zip(self.encoder.attn_layers, self.encoder.conv_layers):
            h = conv(attn(h))
        h = self.encoder.attn_layers[-1](h)
        h = self.encoder.norm(h)

        d = self.dec_embedding(x_dec, marks_dec)
        for layer in self.decoder.layers:
            d = layer(d, h)
        d = self.decoder.projection(self.decoder.norm(d))
        return d[:, -PRED_LEN:, :]


class TorchRouteformer(nn.Module):
    """Minimal flagship forward: motion features -> Informer -> cumsum."""

    def __init__(self):
        super().__init__()
        self.gps_backbone = TorchInformer()

    def forward(self, gps):
        motion = gps[:, 1:] - gps[:, :-1]
        motion = F.pad(motion, (0, 0, 1, 0))
        angle = torch.atan2(motion[..., 1], motion[..., 0]).unsqueeze(-1)
        norm = motion.norm(dim=-1, keepdim=True)
        normalized_angle = (angle - angle[:, :1]) / math.pi
        accel = F.pad(norm[:, 1:] - norm[:, :-1], (0, 0, 1, 0))
        x = torch.cat([motion, normalized_angle, norm, accel], -1)
        out = self.gps_backbone(x)
        return gps[:, -1:] + torch.cumsum(out, 1)


def _jax_model():
    gps_cfg = GPSBackboneConfig(
        seq_len=SEQ_LEN, label_len=SEQ_LEN, pred_len=PRED_LEN,
        d_model=D_MODEL, n_heads=N_HEADS, e_layers=E_LAYERS,
        d_layers=D_LAYERS, d_ff=D_FF, factor=FACTOR,
        dropout=0.0, activation="relu", distil=True,
        embed="timeF", freq="m",
    )
    cfg = RouteformerConfig(
        gps_backbone_config=gps_cfg, decoder_mode="smart",
        discount_factor={0: 0.97}, epsilon=1.0,
        normalize_motion=False, rotate_motion=False,
    )
    model = Routeformer(cfg, gps_backbone=Informer, rngs=nnx.Rngs(0, dropout=1))
    model.eval()
    return model


def test_full_model_forward_parity():
    torch.manual_seed(0)
    twin = TorchRouteformer().eval()
    with torch.no_grad():  # non-trivial biases/norm params
        for p in twin.parameters():
            if p.ndim == 1:
                p.add_(0.05 * torch.randn_like(p))

    model = _jax_model()
    n_loaded, n_total = load_torch_state_dict(
        model, twin.state_dict(), fuzzy=False
    )
    assert n_loaded == n_total, f"loaded {n_loaded}/{n_total} params"

    rng = np.random.RandomState(7)
    gps = np.cumsum(
        rng.randn(4, SEQ_LEN + 1, 2).astype(np.float32) * 0.5, axis=1
    )

    with torch.no_grad():
        t_out = twin(torch.from_numpy(gps)).numpy()

    j_out = np.asarray(model({"gps": jnp.asarray(gps)}))
    assert j_out.shape == t_out.shape == (4, PRED_LEN, 2)
    np.testing.assert_allclose(j_out, t_out, atol=1e-4, rtol=1e-4)


def test_exhaustive_probsparse_is_dense():
    """Sanity for the test's premise: at factor >= L the ProbSparse op
    returns exactly dense attention (all queries selected)."""
    from routeformer_tpu.ops.attention import (
        dot_product_attention,
        prob_sparse_attention,
    )

    rng = np.random.RandomState(0)
    q = jnp.asarray(rng.randn(2, 12, 2, 8).astype(np.float32))
    k = jnp.asarray(rng.randn(2, 12, 2, 8).astype(np.float32))
    v = jnp.asarray(rng.randn(2, 12, 2, 8).astype(np.float32))
    sparse, _ = prob_sparse_attention(q, k, v, factor=100, causal=False)
    dense, _ = dot_product_attention(q, k, v, causal=False)
    np.testing.assert_allclose(
        np.asarray(sparse), np.asarray(dense), atol=1e-5
    )
