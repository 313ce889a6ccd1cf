"""Vision-transformer video backbones (Flax NNX).

Plays the role of the reference's timm-encoder family
(``routeformer/models/video_backbone/TimmBackbone.py:13-184`` and the
SwinV2/DinoV2/Sam wrappers in ``video_backbone/__init__.py:14-31``):
a frozen (by default) pretrained-style image encoder producing a 2-D feature
map per frame, with the same input conditioning — pad-to-square, resize to
the model's native resolution, mean/std normalization.

Differences by design (TPU-first):

- One ViT implementation with per-preset geometry covers the DinoV2/SAM-ViT
  class of encoders; weights can be imported from torch checkpoints via
  ``video_backbone/convert.py`` (no network access is assumed — random init
  otherwise).
- No minibatch loop: XLA pipelines the whole flattened frame batch (use
  remat/sharding for memory instead of Python-level chunking).
- The reference's epoch-10 unfreeze (TimmBackbone.py:123) is an explicit
  ``unfreeze`` attribute toggled by the trainer; when False the feature
  output is wrapped in ``stop_gradient`` (frozen semantics under one
  compiled program).
- Attention runs on the fused Pallas kernel on TPU.
"""

import math
from dataclasses import dataclass
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from flax import nnx

from routeformer_tpu.models.video_backbone.config import (
    TimmBackboneConfig,
    VideoBackboneModule,
)
from routeformer_tpu.ops.attention import dot_product_attention

IMAGENET_MEAN = (0.485, 0.456, 0.406)
IMAGENET_STD = (0.229, 0.224, 0.225)


@dataclass(frozen=True)
class ViTPreset:
    img_size: int
    patch_size: int
    width: int
    depth: int
    heads: int
    mean: Tuple[float, float, float] = IMAGENET_MEAN
    std: Tuple[float, float, float] = IMAGENET_STD


# Geometry mirrors the reference's timm choices (full_comparison.py:231-256):
# DinoV2 ViT-B/14 @518 (the reference's img_size=518 — 37x37 patch grid,
# ~5.5x the tokens of 224; pick `dinov2_base_224` when memory-constrained),
# SAM ViT-B/16. `swinv2_base` here is the ViT-class stand-in geometry; the
# faithful hierarchical SwinV2 lives in swin.py and owns the SwinV2 symbol.
PRESETS = {
    "swinv2_base": ViTPreset(img_size=256, patch_size=16, width=768, depth=12, heads=12),
    "dinov2_base": ViTPreset(img_size=518, patch_size=14, width=768, depth=12, heads=12),
    "dinov2_base_224": ViTPreset(img_size=224, patch_size=14, width=768, depth=12, heads=12),
    "samvit_base": ViTPreset(img_size=224, patch_size=16, width=768, depth=12, heads=12),
    # small preset for tests/debug
    "vit_tiny_test": ViTPreset(img_size=64, patch_size=16, width=32, depth=2, heads=4),
}


class ViTBlock(nnx.Module):
    def __init__(self, width: int, heads: int, dtype=None, gelu_approximate=False,
                 *, rngs: nnx.Rngs):
        # dtype = computation dtype (bf16 on TPU); params stay float32 and
        # LayerNorms reduce in float32 for stability.
        self.norm1 = nnx.LayerNorm(width, rngs=rngs)
        self.norm2 = nnx.LayerNorm(width, rngs=rngs)
        self.qkv = nnx.Linear(width, 3 * width, dtype=dtype, rngs=rngs)
        self.proj = nnx.Linear(width, width, dtype=dtype, rngs=rngs)
        self.fc1 = nnx.Linear(width, 4 * width, dtype=dtype, rngs=rngs)
        self.fc2 = nnx.Linear(4 * width, width, dtype=dtype, rngs=rngs)
        self.heads = heads
        self.width = width
        self.gelu_approximate = gelu_approximate

    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        b, n, c = x.shape
        h = self.heads
        y = self.norm1(x)
        qkv = self.qkv(y).reshape(b, n, 3, h, c // h)
        q, k, v = qkv[:, :, 0], qkv[:, :, 1], qkv[:, :, 2]
        attn, _ = dot_product_attention(q, k, v)
        x = x + self.proj(attn.reshape(b, n, c))
        x = x + self.fc2(
            jax.nn.gelu(self.fc1(self.norm2(x)), approximate=self.gelu_approximate)
        )
        return x


class TimmBackbone(VideoBackboneModule):
    """ViT image encoder with the reference's input conditioning."""

    epoch_unfreeze = True  # participates in the trainer's epoch-10 flip

    def __init__(self, configs: Optional[TimmBackboneConfig] = None, *, rngs: nnx.Rngs):
        configs = configs or TimmBackboneConfig()
        self.configs = configs
        preset_name = configs.model_type or "vit_tiny_test"
        if preset_name not in PRESETS:
            # map timm-style names onto presets (reference model strings)
            lowered = preset_name.lower()
            if "swin" in lowered:
                preset_name = "swinv2_base"
            elif "dino" in lowered:
                preset_name = "dinov2_base"
            elif "sam" in lowered:
                preset_name = "samvit_base"
            else:
                raise ValueError(f"Unknown video backbone model_type {preset_name!r}")
        self.preset = PRESETS[preset_name]
        self.train_backbone = configs.train_backbone
        # Reference quirk: forward re-enables backbone grads after epoch 10
        # (TimmBackbone.py:123); the trainer toggles this attribute.
        self.unfreeze = False
        # Train-time photometric augs (reference TimmBackbone.py:58-67),
        # applied when the backbone itself is being trained. nnx
        # train()/eval() toggles `deterministic`. Applied to the [0,1]
        # frames BEFORE mean/std normalization (the reference runs
        # torchvision's [0,1]-clamping ops on normalized tensors; doing
        # it pre-normalization keeps the ops' semantics intact).
        self.deterministic = True
        self.aug_rngs = rngs.dropout.fork()

        p = self.preset
        grid = p.img_size // p.patch_size
        self.grid = grid
        compute_dtype = (
            jnp.bfloat16
            if getattr(configs, "compute_dtype", "float32") == "bfloat16"
            else None
        )
        self.compute_dtype = compute_dtype
        self.patch_embed = nnx.Conv(
            3, p.width, kernel_size=(p.patch_size, p.patch_size),
            strides=(p.patch_size, p.patch_size), padding="VALID",
            dtype=compute_dtype, rngs=rngs,
        )
        self.pos_embed = nnx.Param(
            nnx.initializers.normal(0.02)(rngs.params(), (1, grid * grid, p.width))
        )
        # The encoder blocks are created STACKED (params carry a leading
        # depth axis) and applied with nnx.scan: the XLA program contains one
        # block body instead of depth x call-sites copies — this cuts the
        # flagship train-step compile time dramatically (compiles here go
        # through a remote tunnel) without changing the math.
        @nnx.split_rngs(splits=p.depth)
        @nnx.vmap(in_axes=(0,), out_axes=0)
        def create_blocks(block_rngs):
            return ViTBlock(
                p.width, p.heads, dtype=compute_dtype,
                gelu_approximate=getattr(configs, "gelu", "exact") == "tanh",
                rngs=block_rngs,
            )

        self.blocks = create_blocks(rngs)
        self.depth = p.depth
        self.norm = nnx.LayerNorm(p.width, rngs=rngs)
        self._output_feature_shape = (grid, grid, p.width)

    @property
    def output_feature_shape(self) -> Tuple[int, int, int]:
        """(H', W', C') of the feature map."""
        return self._output_feature_shape

    def preprocess(self, images: jnp.ndarray) -> jnp.ndarray:
        """Pad to square, resize to native resolution, normalize.

        images: (N, H, W, C) float in [0, 1] (or uint8 wire format).
        """
        if images.dtype == jnp.uint8:
            from routeformer_tpu.ops.image import to_float16

            images = to_float16(images)
        n, h, w, c = images.shape
        if self.configs.pad_to_square and h != w:
            side = max(h, w)
            images = jnp.pad(
                images, ((0, 0), (0, side - h), (0, side - w), (0, 0))
            )
        size = self.preset.img_size
        if images.shape[1] != size or images.shape[2] != size:
            images = jax.image.resize(
                images, (n, size, size, c), method="bilinear"
            )
        mean = jnp.asarray(self.preset.mean, dtype=images.dtype)
        std = jnp.asarray(self.preset.std, dtype=images.dtype)
        return (images - mean) / std

    def preprocess_frames(self, images: jnp.ndarray) -> jnp.ndarray:
        """Augment (train-backbone mode) + resize/normalize to the native
        resolution. Streams of different raw resolutions become concatenable
        after this — the split lets the model batch several views through
        one ``encode_frames`` call."""
        if images.dtype == jnp.uint8:
            from routeformer_tpu.ops.image import to_float16

            images = to_float16(images)
        # Augs gate on train_backbone ONLY (reference TimmBackbone.py:174-175
        # — unfreeze-only runs never augment; see swin.py).
        if self.train_backbone and not self.deterministic:
            from routeformer_tpu.ops.augment import photometric_augment

            images = photometric_augment(images, self.aug_rngs())
        x = self.preprocess(images)
        if self.compute_dtype is not None:
            x = x.astype(self.compute_dtype)
        return x

    def __call__(self, images: jnp.ndarray) -> jnp.ndarray:
        """(N, H, W, C) frames -> (N, H', W', C') features."""
        return self.encode_frames(self.preprocess_frames(images))

    def encode_frames(self, x: jnp.ndarray) -> jnp.ndarray:
        """Encoder over already-preprocessed (N, S, S, C) frames."""
        x = self.patch_embed(x)  # (N, grid, grid, width)
        n, gh, gw, c = x.shape
        x = x.reshape(n, gh * gw, c) + self.pos_embed[...].astype(x.dtype)

        if getattr(self.configs, "remat", False):
            # One block of activations lives at a time in the backward pass;
            # the rest are recomputed (scan-over-layers + remat = O(1) layer
            # memory, the standard TPU trade for training large encoders).
            @nnx.scan(in_axes=(0, nnx.Carry), out_axes=nnx.Carry)
            def run_blocks(block, x):
                return nnx.remat(ViTBlock.__call__)(block, x)

        else:
            @nnx.scan(in_axes=(0, nnx.Carry), out_axes=nnx.Carry)
            def run_blocks(block, x):
                return block(x)

        x = run_blocks(self.blocks, x)
        x = self.norm(x.astype(jnp.float32))
        x = x.reshape(n, gh, gw, c)
        if not (self.train_backbone or self.unfreeze):
            x = jax.lax.stop_gradient(x)
        return x


class DinoV2(TimmBackbone):
    """Cache-separated DinoV2-class encoder (reference video_backbone/__init__.py:21-25)."""


class Sam(TimmBackbone):
    """Cache-separated SAM-ViT-class encoder (reference video_backbone/__init__.py:28-31)."""
