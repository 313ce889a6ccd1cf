"""Numerical parity of SwinV2Backbone against a torch twin via load_timm_swin.

The torch twin mirrors timm's SwinV2 semantics (cosine window attention with
CPB-MLP bias, res-post-norm, MSFT patch-merging concat order) and uses
timm-style state-dict names, so ``load_timm_swin`` consumes its
``state_dict()`` directly — validating both the converter's name/layout
mapping and the JAX forward math end-to-end.
"""

import math

import numpy as np
import jax.numpy as jnp
import pytest
import torch
import torch.nn as nn
import torch.nn.functional as F
from flax import nnx

from routeformer_tpu.models.video_backbone import SwinV2Backbone, TimmBackboneConfig
from routeformer_tpu.models.video_backbone.convert import load_timm_swin
from routeformer_tpu.models.video_backbone.swin import (
    _relative_coords_table,
    _relative_position_index,
    _shift_attn_mask,
)

IMG = 64
PATCH = 4
EMBED = 16
DEPTHS = (2, 2)
HEADS = (2, 4)
WINDOW = 4


class TorchWindowAttention(nn.Module):
    def __init__(self, dim, window, n_heads):
        super().__init__()
        self.dim, self.window, self.n_heads = dim, window, n_heads
        self.qkv = nn.Linear(dim, 3 * dim, bias=False)
        self.q_bias = nn.Parameter(torch.zeros(dim))
        self.v_bias = nn.Parameter(torch.zeros(dim))
        self.logit_scale = nn.Parameter(
            torch.full((n_heads, 1, 1), math.log(10.0))
        )
        self.cpb_mlp = nn.Sequential(
            nn.Linear(2, 512), nn.ReLU(), nn.Linear(512, n_heads, bias=False)
        )
        self.register_buffer(
            "coords_table",
            torch.from_numpy(_relative_coords_table(window)),
            persistent=False,
        )
        self.register_buffer(
            "rel_index",
            torch.from_numpy(_relative_position_index(window)).long(),
            persistent=False,
        )
        self.proj = nn.Linear(dim, dim)

    def forward(self, x, mask=None):
        b, n, c = x.shape
        h = self.n_heads
        qkv_bias = torch.cat(
            [self.q_bias, torch.zeros_like(self.q_bias), self.v_bias]
        )
        qkv = F.linear(x, self.qkv.weight, qkv_bias)
        qkv = qkv.reshape(b, n, 3, h, c // h).permute(2, 0, 3, 1, 4)
        q, k, v = qkv[0], qkv[1], qkv[2]
        attn = F.normalize(q, dim=-1) @ F.normalize(k, dim=-1).transpose(-2, -1)
        scale = torch.clamp(self.logit_scale, max=math.log(100.0)).exp()
        attn = attn * scale

        bias = self.cpb_mlp(self.coords_table)[self.rel_index.reshape(-1)]
        bias = bias.reshape(n, n, h).permute(2, 0, 1)
        attn = attn + 16.0 * torch.sigmoid(bias).unsqueeze(0)

        if mask is not None:
            nw = mask.shape[0]
            attn = attn.view(b // nw, nw, h, n, n) + mask.unsqueeze(0).unsqueeze(2)
            attn = attn.view(b, h, n, n)
        attn = attn.softmax(dim=-1)
        out = (attn @ v).transpose(1, 2).reshape(b, n, c)
        return self.proj(out)


def window_partition_t(x, window):
    n, h, w, c = x.shape
    x = x.view(n, h // window, window, w // window, window, c)
    return x.permute(0, 1, 3, 2, 4, 5).reshape(-1, window, window, c)


def window_reverse_t(wins, window, h, w):
    n = wins.shape[0] // ((h // window) * (w // window))
    x = wins.view(n, h // window, w // window, window, window, -1)
    return x.permute(0, 1, 3, 2, 4, 5).reshape(n, h, w, -1)


class TorchSwinBlock(nn.Module):
    def __init__(self, dim, n_heads, window, shift, input_hw):
        super().__init__()
        self.window = min(window, *input_hw)
        self.shift = shift if self.window < min(input_hw) else 0
        self.attn = TorchWindowAttention(dim, self.window, n_heads)
        self.norm1 = nn.LayerNorm(dim)
        self.norm2 = nn.LayerNorm(dim)
        self.mlp = nn.Module()
        self.mlp.fc1 = nn.Linear(dim, 4 * dim)
        self.mlp.fc2 = nn.Linear(4 * dim, dim)
        if self.shift > 0:
            self.register_buffer(
                "attn_mask",
                torch.from_numpy(
                    _shift_attn_mask(*input_hw, self.window, self.shift)
                ),
                persistent=False,
            )
        else:
            self.attn_mask = None

    def forward(self, x):
        n, h, w, c = x.shape
        shortcut = x
        if self.shift > 0:
            x = torch.roll(x, (-self.shift, -self.shift), dims=(1, 2))
        wins = window_partition_t(x, self.window).reshape(
            -1, self.window * self.window, c
        )
        wins = self.attn(wins, self.attn_mask)
        x = window_reverse_t(
            wins.reshape(-1, self.window, self.window, c), self.window, h, w
        )
        if self.shift > 0:
            x = torch.roll(x, (self.shift, self.shift), dims=(1, 2))
        x = shortcut + self.norm1(x)
        y = self.mlp.fc2(F.gelu(self.mlp.fc1(x)))
        return x + self.norm2(y)


class TorchPatchMerging(nn.Module):
    """MSFT/timm concat order [x0, x1, x2, x3] = [(0,0),(1,0),(0,1),(1,1)]."""

    def __init__(self, dim):
        super().__init__()
        self.reduction = nn.Linear(4 * dim, 2 * dim, bias=False)
        self.norm = nn.LayerNorm(2 * dim)

    def forward(self, x):
        x0 = x[:, 0::2, 0::2]
        x1 = x[:, 1::2, 0::2]
        x2 = x[:, 0::2, 1::2]
        x3 = x[:, 1::2, 1::2]
        x = torch.cat([x0, x1, x2, x3], dim=-1)
        return self.norm(self.reduction(x))


class TorchSwinV2(nn.Module):
    def __init__(self):
        super().__init__()
        self.patch_embed = nn.Module()
        self.patch_embed.proj = nn.Conv2d(3, EMBED, PATCH, stride=PATCH)
        self.patch_embed.norm = nn.LayerNorm(EMBED)
        hw = IMG // PATCH
        dim = EMBED
        self.layers = nn.ModuleList()
        for si, (depth, heads) in enumerate(zip(DEPTHS, HEADS)):
            layer = nn.Module()
            layer.blocks = nn.ModuleList(
                [
                    TorchSwinBlock(
                        dim, heads, WINDOW,
                        0 if bi % 2 == 0 else min(WINDOW, hw) // 2,
                        (hw, hw),
                    )
                    for bi in range(depth)
                ]
            )
            if si < len(DEPTHS) - 1:
                layer.downsample = TorchPatchMerging(dim)
                dim *= 2
                hw //= 2
            self.layers.append(layer)
        self.norm = nn.LayerNorm(dim)

    def forward(self, x):
        """x: (N, H, W, C) in [0,1], already resized/normalized upstream."""
        x = self.patch_embed.proj(x.permute(0, 3, 1, 2))
        x = x.permute(0, 2, 3, 1)
        x = self.patch_embed.norm(x)
        for layer in self.layers:
            for block in layer.blocks:
                x = block(x)
            if hasattr(layer, "downsample"):
                x = layer.downsample(x)
        return self.norm(x)


def test_converted_weights_match_torch():
    torch.manual_seed(0)
    tm = TorchSwinV2().eval()
    # non-trivial weights: default torch init plus noise on the biases
    with torch.no_grad():
        for p in tm.parameters():
            if p.ndim == 1:
                p.add_(0.02 * torch.randn_like(p))

    cfg = TimmBackboneConfig(
        model_type="swinv2_parity_test", cache_enabled=False,
        compute_dtype="float32", pad_to_square=False,
    )
    jm = SwinV2Backbone(cfg, rngs=nnx.Rngs(0))
    jm.eval()
    n_loaded = load_timm_swin(jm, tm.state_dict())
    assert n_loaded > 0

    rng = np.random.RandomState(0)
    # already-square images at native size: preprocess reduces to mean/std
    x = rng.uniform(size=(2, IMG, IMG, 3)).astype(np.float32)

    mean = np.array([0.485, 0.456, 0.406], dtype=np.float32)
    std = np.array([0.229, 0.224, 0.225], dtype=np.float32)
    with torch.no_grad():
        t_out = tm(torch.from_numpy((x - mean) / std)).numpy()

    j_out = np.asarray(jm(jnp.asarray(x)))
    assert j_out.shape == t_out.shape
    np.testing.assert_allclose(j_out, t_out, atol=2e-4, rtol=1e-3)


def test_loader_rejects_shape_mismatch():
    torch.manual_seed(0)
    tm = TorchSwinV2()
    sd = tm.state_dict()
    sd["patch_embed.proj.weight"] = torch.zeros(7, 3, 4, 4)
    cfg = TimmBackboneConfig(
        model_type="swinv2_parity_test", cache_enabled=False,
        compute_dtype="float32",
    )
    jm = SwinV2Backbone(cfg, rngs=nnx.Rngs(0))
    with pytest.raises(AssertionError):
        load_timm_swin(jm, sd)
