"""Numerical parity: the (scanned) flax ViT backbone vs a torch twin.

This covers the 'frozen-encoder parity' risk (SURVEY hard part #3): the
conversion path from timm-style torch state dicts into the stacked-scan
layout must reproduce torch numerics exactly.
"""

import math

import numpy as np
import jax.numpy as jnp
import pytest
import torch
import torch.nn as nn
from flax import nnx

from routeformer_tpu.models.video_backbone import TimmBackboneConfig
from routeformer_tpu.models.video_backbone.convert import load_timm_vit
from routeformer_tpu.models.video_backbone.vit import PRESETS, TimmBackbone


class TorchViT(nn.Module):
    """timm-style ViT matching the TimmBackbone architecture."""

    def __init__(self, img=64, patch=16, width=32, depth=2, heads=4):
        super().__init__()
        self.heads = heads
        self.patch_embed = nn.Module()
        self.patch_embed.proj = nn.Conv2d(3, width, patch, patch)
        grid = img // patch
        self.pos_embed = nn.Parameter(torch.randn(1, grid * grid, width) * 0.02)
        self.blocks = nn.ModuleList()
        for _ in range(depth):
            blk = nn.Module()
            blk.norm1 = nn.LayerNorm(width, eps=1e-6)
            blk.norm2 = nn.LayerNorm(width, eps=1e-6)
            blk.attn = nn.Module()
            blk.attn.qkv = nn.Linear(width, 3 * width)
            blk.attn.proj = nn.Linear(width, width)
            blk.mlp = nn.Module()
            blk.mlp.fc1 = nn.Linear(width, 4 * width)
            blk.mlp.fc2 = nn.Linear(4 * width, width)
            self.blocks.append(blk)
        self.norm = nn.LayerNorm(width, eps=1e-6)

    def forward(self, x):  # x: (N, 3, H, W), already normalized
        x = self.patch_embed.proj(x)  # (N, C, g, g)
        n, c, gh, gw = x.shape
        x = x.permute(0, 2, 3, 1).reshape(n, gh * gw, c)
        x = x + self.pos_embed
        h = self.heads
        for blk in self.blocks:
            y = blk.norm1(x)
            qkv = blk.attn.qkv(y).reshape(n, -1, 3, h, c // h)
            q, k, v = qkv[:, :, 0], qkv[:, :, 1], qkv[:, :, 2]
            q = q.permute(0, 2, 1, 3)
            k = k.permute(0, 2, 1, 3)
            v = v.permute(0, 2, 1, 3)
            attn = torch.softmax(
                q @ k.transpose(-2, -1) / math.sqrt(c // h), dim=-1
            )
            out = (attn @ v).permute(0, 2, 1, 3).reshape(n, -1, c)
            x = x + blk.attn.proj(out)
            x = x + blk.mlp.fc2(nn.functional.gelu(blk.mlp.fc1(blk.norm2(x))))
        return self.norm(x)


class TestViTParity:
    def test_converted_weights_match_torch(self, rng):
        torch.manual_seed(0)
        tvit = TorchViT().eval()
        cfg = TimmBackboneConfig(
            model_type="vit_tiny_test", cache_enabled=False,
            compute_dtype="float32", pad_to_square=False,
        )
        backbone = TimmBackbone(cfg, rngs=nnx.Rngs(0))
        backbone.eval()

        n_loaded = load_timm_vit(backbone, tvit.state_dict())
        assert n_loaded >= 17

        # feed the post-preprocessing tensor to both (bypass resize; the
        # tiny preset's native size is 64, so only normalization applies)
        img = rng.uniform(size=(2, 64, 64, 3)).astype(np.float32)
        p = PRESETS["vit_tiny_test"]
        mean = np.asarray(p.mean, dtype=np.float32)
        std = np.asarray(p.std, dtype=np.float32)
        normed = (img - mean) / std

        with torch.no_grad():
            expected = tvit(
                torch.tensor(normed).permute(0, 3, 1, 2)
            ).numpy()  # (N, tokens, C)

        got = np.asarray(backbone(jnp.asarray(img)))  # (N, g, g, C)
        got = got.reshape(expected.shape)
        np.testing.assert_allclose(got, expected, atol=2e-4)

    def test_cls_token_pos_embed_dropped(self, rng):
        """timm ViTs carry a cls-token position; conversion drops it."""
        torch.manual_seed(1)
        tvit = TorchViT()
        sd = {k: v for k, v in tvit.state_dict().items()}
        grid_sq = sd["pos_embed"].shape[1]
        sd["pos_embed"] = torch.randn(1, grid_sq + 1, sd["pos_embed"].shape[2])
        cfg = TimmBackboneConfig(
            model_type="vit_tiny_test", cache_enabled=False,
            compute_dtype="float32",
        )
        backbone = TimmBackbone(cfg, rngs=nnx.Rngs(0))
        load_timm_vit(backbone, sd)
        np.testing.assert_allclose(
            np.asarray(backbone.pos_embed[...]),
            sd["pos_embed"][:, 1:].numpy(),
            atol=1e-6,
        )


def test_vit_remat_matches_plain_gradients():
    """ViT remat path: identical gradients, different schedule."""
    import jax
    from routeformer_tpu.models.video_backbone import TimmBackbone, TimmBackboneConfig

    rng = np.random.RandomState(3)
    x = jnp.asarray(rng.uniform(size=(2, 48, 64, 3)).astype(np.float32))

    def grads(remat):
        cfg = TimmBackboneConfig(
            model_type="vit_tiny_test", cache_enabled=False,
            compute_dtype="float32", train_backbone=True, remat=remat,
        )
        model = TimmBackbone(cfg, rngs=nnx.Rngs(0))

        def loss_fn(m):
            return jnp.sum(m(x) ** 2)

        return nnx.grad(loss_fn)(model)

    flat_plain = jax.tree.leaves(grads(False))
    flat_remat = jax.tree.leaves(grads(True))
    assert len(flat_plain) == len(flat_remat)
    for a, b in zip(flat_plain, flat_remat):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5)
