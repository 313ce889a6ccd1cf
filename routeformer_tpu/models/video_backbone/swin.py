"""SwinV2 vision backbone (Flax NNX).

Faithful SwinV2 architecture for the reference's flagship video encoder slot
(timm ``swinv2_base_window12to16_192to256`` — reference
``experiments/full_comparison.py:231-239``): hierarchical stages with
window attention (alternating shifted windows), patch merging between
stages, and the three SwinV2 changes over v1 — residual-post-norm, cosine
attention with a learnable temperature, and a continuous log-spaced
relative-position-bias MLP.

Pretrained weights import through ``video_backbone/convert.py`` when the
user supplies a checkpoint (zero-egress environment); otherwise random init.
TPU notes: window partitioning is pure static reshapes/transposes; the
window attention batch is ``(N * windows, win², C)`` — large, uniform MXU
matmuls; blocks within a stage run under ``nnx.scan`` pairs (W-MSA/SW-MSA)
to keep the compiled program small.
"""

import math
import os
from dataclasses import dataclass, replace as dc_replace
from typing import Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import nnx

from routeformer_tpu.utils.logging import get_logger

logger = get_logger("video_backbone.swin")


import threading  # noqa: E402  (guard state below)

# Known-bad geometry guard (docs/PERF.md "batch-8 full step faults the TPU
# worker"): the flagship train step at certain FRAME batch sizes crashes
# the axon TPU worker at runtime when the Pallas window kernel is in the
# program — while every component (the kernel at each in-step shape, the
# backbone forward alone) passes in isolation, i.e. a whole-program
# XLA/Mosaic scheduling interaction. The verified-safe fallback is the
# einsum window path for the ENTIRE encode of a known-bad geometry, which
# this guard applies automatically at trace time (no env var needed).
# 144/192 are the batch-8 e2e frame batches (8 samples x 18 gopro /
# 24 front frames; stage-1 window batches 2304/3072 from the bisection).
# Override/extend via ROUTEFORMER_SWIN_FLASH_BAD_FRAMES="144,192" (empty
# string disables the guard). Minimal repro for upstream:
# STEP_BATCH=8 python tools/step_at_batch.py
_DEFAULT_BAD_FRAME_COUNTS = frozenset({144, 192})
_flash_guard = threading.local()


def _bad_frame_counts() -> frozenset:
    env = os.environ.get("ROUTEFORMER_SWIN_FLASH_BAD_FRAMES")
    if env is None:
        return _DEFAULT_BAD_FRAME_COUNTS
    return frozenset(int(v) for v in env.split(",") if v.strip())


class _force_einsum_windows:
    """Trace-time context: dispatch every window attention inside to the
    einsum path (the known-bad-geometry fallback)."""

    def __enter__(self):
        _flash_guard.active = getattr(_flash_guard, "active", 0) + 1

    def __exit__(self, *exc):
        _flash_guard.active -= 1


def _use_window_flash(
    batch_windows: int, tokens: int, mode: Optional[str] = None
) -> bool:
    """Dispatch window attention to the fused Pallas kernel.

    Worth it when the einsum path's (B, H, N, N) f32 score tensor is large
    (flagship: 10.5 GB at stage 1); tiny test shapes keep the XLA path,
    which also serves CPU runs.

    ``mode`` is the explicit dispatch choice ("auto"/"0"/"1"), normally set
    via ``TimmBackboneConfig.window_flash``; when None, the
    ``ROUTEFORMER_SWIN_FLASH`` env var is consulted. NOTE: the decision is
    evaluated at *trace* time and frozen into the compiled program — under
    "auto" different stages of one model may legitimately take different
    numeric paths (Pallas bf16 fused kernel vs f32 einsum), and changing
    the env var after the first compiled step has no effect.
    """
    if getattr(_flash_guard, "active", 0):
        return False  # inside a known-bad-geometry encode (see guard above)
    if mode is None:
        mode = os.environ.get("ROUTEFORMER_SWIN_FLASH", "auto")
    if mode == "0":
        return False
    if jax.default_backend() != "tpu":
        return False
    if mode == "1":
        return True
    return batch_windows * tokens * tokens >= 1 << 22

from routeformer_tpu.models.video_backbone.config import (
    TimmBackboneConfig,
    VideoBackboneModule,
)
from routeformer_tpu.models.video_backbone.vit import IMAGENET_MEAN, IMAGENET_STD


def window_partition(x: jnp.ndarray, window: int) -> jnp.ndarray:
    """(N, H, W, C) -> (N * nH * nW, window, window, C)."""
    n, h, w, c = x.shape
    x = x.reshape(n, h // window, window, w // window, window, c)
    return x.transpose(0, 1, 3, 2, 4, 5).reshape(-1, window, window, c)


def window_reverse(windows: jnp.ndarray, window: int, h: int, w: int) -> jnp.ndarray:
    """Inverse of window_partition."""
    n = windows.shape[0] // ((h // window) * (w // window))
    x = windows.reshape(n, h // window, w // window, window, window, -1)
    return x.transpose(0, 1, 3, 2, 4, 5).reshape(n, h, w, -1)


def _relative_coords_table(window: int) -> np.ndarray:
    """Log-spaced continuous relative coordinates (SwinV2 CPB input)."""
    coords = np.arange(-(window - 1), window, dtype=np.float64)
    table = np.stack(np.meshgrid(coords, coords, indexing="ij"), axis=-1)
    table = table / (window - 1)  # normalize to [-1, 1]
    table = np.sign(table) * np.log2(np.abs(table) * 8 + 1.0) / np.log2(8)
    return table.reshape(-1, 2).astype(np.float32)


def _relative_position_index(window: int) -> np.ndarray:
    coords = np.stack(
        np.meshgrid(np.arange(window), np.arange(window), indexing="ij")
    )  # (2, w, w)
    flat = coords.reshape(2, -1)
    rel = flat[:, :, None] - flat[:, None, :]  # (2, ws², ws²)
    rel = rel.transpose(1, 2, 0) + (window - 1)
    return (rel[..., 0] * (2 * window - 1) + rel[..., 1]).astype(np.int32)


def _shift_attn_mask(h: int, w: int, window: int, shift: int) -> np.ndarray:
    """Additive mask isolating the wrapped regions of shifted windows."""
    img = np.zeros((1, h, w, 1), dtype=np.int32)
    cnt = 0
    for hs in (slice(0, -window), slice(-window, -shift), slice(-shift, None)):
        for ws in (slice(0, -window), slice(-window, -shift), slice(-shift, None)):
            img[:, hs, ws, :] = cnt
            cnt += 1
    # pure-numpy window partition: this is a host-side constant (no device
    # round-trip at trace time; also keeps the module eval_shape-safe)
    n, h, w, c = img.shape
    wins = (
        img.reshape(n, h // window, window, w // window, window, c)
        .transpose(0, 1, 3, 2, 4, 5)
        .reshape(-1, window * window)
    )
    mask = wins[:, None, :] - wins[:, :, None]
    return np.where(mask != 0, -100.0, 0.0).astype(np.float32)


class WindowAttention(nnx.Module):
    """SwinV2 cosine window attention with a CPB-MLP relative bias."""

    def __init__(
        self, dim: int, window: int, n_heads: int, dtype=None,
        flash_mode: Optional[str] = None, *, rngs: nnx.Rngs,
    ):
        self.dim = dim
        self.window = window
        self.n_heads = n_heads
        # Explicit kernel-dispatch choice ("auto"/"0"/"1"); None defers to
        # the ROUTEFORMER_SWIN_FLASH env var (see _use_window_flash).
        self.flash_mode = flash_mode
        self.qkv = nnx.Linear(dim, 3 * dim, use_bias=False, dtype=dtype, rngs=rngs)
        self.q_bias = nnx.Param(jnp.zeros((dim,)))
        self.v_bias = nnx.Param(jnp.zeros((dim,)))
        self.proj = nnx.Linear(dim, dim, dtype=dtype, rngs=rngs)
        self.logit_scale = nnx.Param(
            jnp.full((n_heads, 1, 1), math.log(10.0))
        )
        # continuous position bias MLP: 2 -> 512 -> heads
        self.cpb_fc1 = nnx.Linear(2, 512, rngs=rngs)
        self.cpb_fc2 = nnx.Linear(512, n_heads, use_bias=False, rngs=rngs)
        self.coords_table = jnp.asarray(_relative_coords_table(window))
        self.rel_index = jnp.asarray(_relative_position_index(window))

    def get_bias(self) -> jnp.ndarray:
        """(H, N, N) continuous-position bias. Hoistable: SwinStage computes
        every scanned block's bias in ONE batched op before the scan (the
        per-iteration gather+transpose is latency-bound, ~5 ms/block at
        stage-2 shapes)."""
        n = self.window * self.window
        h = self.n_heads
        bias_table = self.cpb_fc2(jax.nn.relu(self.cpb_fc1(self.coords_table)))
        bias = bias_table[self.rel_index.reshape(-1)].reshape(n, n, h)
        return 16.0 * jax.nn.sigmoid(bias.transpose(2, 0, 1))

    def __call__(
        self,
        x: jnp.ndarray,
        mask: Optional[jnp.ndarray] = None,
        bias: Optional[jnp.ndarray] = None,
    ):
        """x: (B_windows, ws², C); mask: (n_windows, ws², ws²) additive;
        bias: optional precomputed ``get_bias()`` output."""
        b, n, c = x.shape
        h = self.n_heads
        qkv_bias = jnp.concatenate(
            [self.q_bias[...], jnp.zeros((c,)), self.v_bias[...]]
        )
        qkv = self.qkv(x) + qkv_bias
        qkv = qkv.reshape(b, n, 3, h, c // h).transpose(2, 0, 3, 1, 4)
        q, k, v = qkv[0], qkv[1], qkv[2]  # (B, H, N, d)

        scale = jnp.exp(
            jnp.minimum(self.logit_scale[...], math.log(100.0))
        ).reshape(h)

        if bias is None:
            bias = self.get_bias()  # (H, N, N)

        if _use_window_flash(b, n, self.flash_mode):
            # Fused Pallas path: the materialized (B, H, N, N) f32 score
            # tensor is gigabytes at flagship frame counts (10.5 GB at
            # stage 1 of a 672-frame step) — the kernel keeps scores in
            # VMEM, runs all heads of a window in one grid step, and does
            # the cosine normalization + per-head scale in-kernel so q/k
            # stream from HBM in bf16. The (CPB + shift-mask) bias repeats
            # every n_windows rows of the batch, exactly the kernel's
            # bias-broadcast layout.
            from routeformer_tpu.ops.flash_attention import (
                flash_window_attention,
            )

            if mask is not None:
                full_bias = bias[None] + mask[:, None]  # (nW, H, N, N)
            else:
                full_bias = bias[None]  # (1, H, N, N)
            out = flash_window_attention(
                q, k, v, full_bias, scale, cosine=True
            )
        else:
            # cosine attention
            qn = q / jnp.maximum(
                jnp.linalg.norm(q, axis=-1, keepdims=True), 1e-6
            )
            kn = k / jnp.maximum(
                jnp.linalg.norm(k, axis=-1, keepdims=True), 1e-6
            )
            attn = jnp.einsum("bhnd,bhmd->bhnm", qn, kn).astype(jnp.float32)
            attn = attn * scale[None, :, None, None]
            attn = attn + bias[None]
            if mask is not None:
                nw = mask.shape[0]
                attn = attn.reshape(b // nw, nw, h, n, n) + mask[None, :, None]
                attn = attn.reshape(b, h, n, n)
            attn = jax.nn.softmax(attn, axis=-1).astype(v.dtype)
            out = jnp.einsum("bhnm,bhmd->bhnd", attn, v)

        out = out.transpose(0, 2, 1, 3).reshape(b, n, c)
        return self.proj(out)


class SwinBlock(nnx.Module):
    """SwinV2 block: res-post-norm window attention + MLP."""

    def __init__(
        self, dim: int, n_heads: int, window: int, shift: int,
        input_hw: Tuple[int, int], dtype=None, gelu_approximate=False,
        flash_mode: Optional[str] = None, *, rngs: nnx.Rngs,
    ):
        self.gelu_approximate = gelu_approximate
        self.window = min(window, *input_hw)
        self.shift = shift if self.window < min(input_hw) else 0
        self.input_hw = input_hw
        # whether the block's matmuls run bf16 (dtype is the nnx compute
        # dtype; params stay f32) — forwarded to the fused-block kernel
        self.compute_bf16 = dtype == jnp.bfloat16
        self.attn = WindowAttention(
            dim, self.window, n_heads, dtype, flash_mode, rngs=rngs
        )
        # timm/torch SwinV2 LayerNorm eps (torch default 1e-5; nnx default 1e-6)
        self.norm1 = nnx.LayerNorm(dim, epsilon=1e-5, rngs=rngs)
        self.norm2 = nnx.LayerNorm(dim, epsilon=1e-5, rngs=rngs)
        self.fc1 = nnx.Linear(dim, 4 * dim, dtype=dtype, rngs=rngs)
        self.fc2 = nnx.Linear(4 * dim, dim, dtype=dtype, rngs=rngs)
        if self.shift > 0:
            self.attn_mask = jnp.asarray(
                _shift_attn_mask(*input_hw, self.window, self.shift)
            )
        else:
            self.attn_mask = None

    def _fused_block_mode(self, c: int) -> Optional[str]:
        """'tpu'/'interpret' when the whole block should run as ONE Pallas
        kernel (ops/swin_block_fusion.py) — measured +24% vs the
        production path on stage-2 blocks (docs/PERF.md round 5).

        Gates: tanh gelu (the kernel's activation; "exact" models fall
        back), C <= 512 (stage-3's C=1024 MLP weights alone exceed
        VMEM), and not inside the bad-geometry einsum guard.

        Default ON since round 5: step-level cold 24.91 vs 22.86 clips/s
        (+9%, mfu 0.086 vs 0.079, .logs/queue_r5_stage_17_*.log), math
        identical to the plain path (f32-exact in tests), backward via
        XLA recompute. Shifted blocks ride the same kernel with a
        per-window-kind (CPB + shift-mask) bias and the (window-kind,
        repeat) grid. ROUTEFORMER_SWIN_BLOCK_FUSION=0 opts out."""
        import os

        mode = os.getenv("ROUTEFORMER_SWIN_BLOCK_FUSION", "1")
        if mode == "0":
            return None
        if getattr(_flash_guard, "active", 0):
            # inside a known-bad-geometry encode (the batch-8 worker-fault
            # registry): keep the whole encode on the verified einsum path
            # — no Pallas kernels in the schedule at all
            return None
        if not self.gelu_approximate or c > 512:
            return None
        if mode == "interpret":
            return "interpret"
        return "tpu" if jax.default_backend() == "tpu" else None

    def _run_fused_block(
        self, x: jnp.ndarray, bias: Optional[jnp.ndarray], interpret: bool
    ) -> jnp.ndarray:
        from routeformer_tpu.ops.swin_block_fusion import fused_swin_block

        n, h, w, c = x.shape
        if self.shift > 0:
            x = jnp.roll(x, (-self.shift, -self.shift), axis=(1, 2))
        wins = window_partition(x, self.window).reshape(
            -1, self.window * self.window, c
        )
        qkv_bias = jnp.concatenate(
            [self.attn.q_bias[...], jnp.zeros((c,)), self.attn.v_bias[...]]
        )
        params = {
            "wqkv": self.attn.qkv.kernel[...],
            "bqkv": qkv_bias,
            "wproj": self.attn.proj.kernel[...],
            "bproj": self.attn.proj.bias[...],
            "ln1_scale": self.norm1.scale[...],
            "ln1_bias": self.norm1.bias[...],
            "wfc1": self.fc1.kernel[...],
            "bfc1": self.fc1.bias[...],
            "wfc2": self.fc2.kernel[...],
            "bfc2": self.fc2.bias[...],
            "ln2_scale": self.norm2.scale[...],
            "ln2_bias": self.norm2.bias[...],
            "logit_scale": jnp.exp(
                jnp.minimum(self.attn.logit_scale[...], math.log(100.0))
            ).reshape(self.attn.n_heads),
        }
        if bias is None:
            bias = self.attn.get_bias()
        if self.attn_mask is not None:
            # per-window-kind bias: CPB + shift mask (the flash-window
            # bias-broadcast layout; window index varies fastest)
            bias = bias[None] + self.attn_mask[:, None]
        out = fused_swin_block(
            wins, params, bias, self.attn.n_heads, self.compute_bf16,
            interpret,
        )
        out = window_reverse(
            out.reshape(-1, self.window, self.window, c), self.window, h, w
        )
        if self.shift > 0:
            out = jnp.roll(out, (self.shift, self.shift), axis=(1, 2))
        return out

    def __call__(
        self, x: jnp.ndarray, bias: Optional[jnp.ndarray] = None
    ) -> jnp.ndarray:
        """x: (N, H, W, C); bias: optional precomputed CPB bias."""
        n, h, w, c = x.shape
        fusion_mode = self._fused_block_mode(c)
        if fusion_mode is not None:
            return self._run_fused_block(
                x, bias, interpret=fusion_mode == "interpret"
            )
        shortcut = x
        if self.shift > 0:
            x = jnp.roll(x, (-self.shift, -self.shift), axis=(1, 2))
        wins = window_partition(x, self.window).reshape(
            -1, self.window * self.window, c
        )
        wins = self.attn(wins, self.attn_mask, bias)
        x = window_reverse(
            wins.reshape(-1, self.window, self.window, c), self.window, h, w
        )
        if self.shift > 0:
            x = jnp.roll(x, (self.shift, self.shift), axis=(1, 2))
        # residual-post-norm (the SwinV2 ordering)
        x = shortcut + self.norm1(x.astype(jnp.float32)).astype(shortcut.dtype)
        y = self.fc2(jax.nn.gelu(self.fc1(x), approximate=self.gelu_approximate))
        return x + self.norm2(y.astype(jnp.float32)).astype(x.dtype)


class SwinBlockPair(nnx.Module):
    """One W-MSA + SW-MSA block pair — the unit Swin repeats.

    Pairing keeps the scanned body uniform: every even block has shift 0 and
    every odd block has shift window//2, so a stage of depth D is D/2
    identical pair-bodies under ``nnx.scan``.
    """

    def __init__(
        self, dim: int, n_heads: int, window: int,
        input_hw: Tuple[int, int], dtype=None, gelu_approximate=False,
        flash_mode: Optional[str] = None, *, rngs: nnx.Rngs,
    ):
        shift = min(window, *input_hw) // 2
        self.block_a = SwinBlock(
            dim, n_heads, window, 0, input_hw, dtype, gelu_approximate,
            flash_mode, rngs=rngs,
        )
        self.block_b = SwinBlock(
            dim, n_heads, window, shift, input_hw, dtype, gelu_approximate,
            flash_mode, rngs=rngs,
        )

    def get_biases(self):
        return self.block_a.attn.get_bias(), self.block_b.attn.get_bias()

    def __call__(self, x: jnp.ndarray, biases=None) -> jnp.ndarray:
        bias_a, bias_b = biases if biases is not None else (None, None)
        return self.block_b(self.block_a(x, bias_a), bias_b)


class SwinStage(nnx.Module):
    """A stack of block pairs applied with ``nnx.scan``.

    The XLA program contains ONE pair body per stage instead of ``depth``
    block call-sites — the same compile-size lever as the scanned ViT
    (vit.py); SwinV2-base stage 3 drops from 18 inlined blocks to 1 body.
    """

    def __init__(
        self, dim: int, n_heads: int, window: int, depth: int,
        input_hw: Tuple[int, int], dtype=None, remat: bool = False,
        gelu_approximate: bool = False, flash_mode: Optional[str] = None,
        *, rngs: nnx.Rngs,
    ):
        if depth % 2 != 0:
            raise ValueError(f"Swin stage depth must be even, got {depth}")
        self.n_pairs = depth // 2
        self.remat = remat

        @nnx.split_rngs(splits=self.n_pairs)
        @nnx.vmap(in_axes=(0,), out_axes=0)
        def create_pairs(pair_rngs):
            return SwinBlockPair(
                dim, n_heads, window, input_hw, dtype, gelu_approximate,
                flash_mode, rngs=pair_rngs,
            )

        self.pairs = create_pairs(rngs)

    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        # All scanned blocks' CPB biases in one batched op (the in-body
        # gather+transpose is latency-bound, ~5 ms/block at stage-2 shapes)
        # — they ride the scan as per-iteration xs.
        @nnx.vmap(in_axes=(0,), out_axes=0)
        def all_biases(pair):
            return pair.get_biases()

        biases = all_biases(self.pairs)

        if self.remat:
            @nnx.scan(in_axes=(0, nnx.Carry, 0), out_axes=nnx.Carry)
            def run_pairs(pair, x, biases):
                return nnx.remat(SwinBlockPair.__call__)(pair, x, biases)

        else:
            @nnx.scan(in_axes=(0, nnx.Carry, 0), out_axes=nnx.Carry)
            def run_pairs(pair, x, biases):
                return pair(x, biases)

        return run_pairs(self.pairs, x, biases)


class PatchMerging(nnx.Module):
    def __init__(self, dim: int, dtype=None, *, rngs: nnx.Rngs):
        self.reduction = nnx.Linear(4 * dim, 2 * dim, use_bias=False, dtype=dtype, rngs=rngs)
        self.norm = nnx.LayerNorm(2 * dim, epsilon=1e-5, rngs=rngs)

    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        n, h, w, c = x.shape
        x = x.reshape(n, h // 2, 2, w // 2, 2, c)
        x = x.transpose(0, 1, 3, 2, 4, 5).reshape(n, h // 2, w // 2, 4 * c)
        x = self.reduction(x)
        return self.norm(x.astype(jnp.float32)).astype(x.dtype)


@dataclass(frozen=True)
class SwinPreset:
    img_size: int = 256
    patch_size: int = 4
    embed_dim: int = 128
    depths: Sequence[int] = (2, 2, 18, 2)
    heads: Sequence[int] = (4, 8, 16, 32)
    window: int = 16


SWIN_PRESETS = {
    "swinv2_base": SwinPreset(),
    # 192-px training geometry of the same checkpoint family (timm
    # swinv2_base_window12to16_192to256 trains at 192/window 12 and
    # fine-tunes at 256/window 16): ~0.56x the pixels and a 144- vs
    # 256-token window — the cold-step ablation lever (docs/PERF.md;
    # round-3 VERDICT #5). Same parameter count except the CPB bias MLPs'
    # input grids, so accuracy evidence transfers.
    "swinv2_base_192": SwinPreset(img_size=192, window=12),
    # Exercises windowing, shifted windows, and one merge at minimum cost;
    # output (4, 4, 32) matches the old test geometry.
    "swinv2_tiny_test": SwinPreset(
        img_size=32, patch_size=4, embed_dim=16, depths=(2, 2), heads=(2, 4),
        window=4,
    ),
    # Larger grid for the torch-twin parity test (multiple windows per side
    # in BOTH stages, so the shift mask's wrap regions are non-degenerate).
    "swinv2_parity_test": SwinPreset(
        img_size=64, patch_size=4, embed_dim=16, depths=(2, 2), heads=(2, 4),
        window=4,
    ),
}


class SwinV2Backbone(VideoBackboneModule):
    """Hierarchical SwinV2 encoder producing a (H/32, W/32, 8*embed) map."""

    epoch_unfreeze = True  # participates in the trainer's epoch-10 flip

    def __init__(self, configs: Optional[TimmBackboneConfig] = None, *, rngs: nnx.Rngs):
        configs = configs or TimmBackboneConfig()
        self.configs = configs
        name = configs.model_type or "swinv2_base"
        lowered = name.lower()
        if lowered in SWIN_PRESETS:
            preset = SWIN_PRESETS[lowered]
        elif "tiny_test" in lowered:
            preset = SWIN_PRESETS["swinv2_tiny_test"]
        elif "192" in lowered and "256" not in lowered:
            preset = SWIN_PRESETS["swinv2_base_192"]
        else:
            preset = SWIN_PRESETS["swinv2_base"]
        # ROUTEFORMER_SWIN_GEOMETRY=192 re-points any base-preset model at
        # the 192-px training geometry (the ablation switch; timm names
        # like swinv2_base_window12to16_192to256 keep selecting 256).
        if (
            preset is SWIN_PRESETS["swinv2_base"]
            and os.environ.get("ROUTEFORMER_SWIN_GEOMETRY") == "192"
        ):
            preset = SWIN_PRESETS["swinv2_base_192"]
        # ROUTEFORMER_SWIN_HEADS=<head_dim> repacks every stage's attention
        # into fewer, wider heads (base d=32 -> e.g. d=64: heads
        # (4,8,16,32) -> (2,4,8,16)). qkv/proj widths are unchanged — only
        # the per-head split, the CPB-MLP output width, and the per-head
        # logit scales change — so FLOPs are identical but the MXU
        # contraction of q@k^T doubles from the shape-bound d=32 (the cold
        # -step wall, docs/PERF.md "head-dim repacking"). This changes the
        # softmax granularity vs the timm architecture: it is an ABLATION
        # lever (accuracy evidence must come from fixture training, and
        # published checkpoints cannot be imported into a repacked model).
        head_dim_env = os.environ.get("ROUTEFORMER_SWIN_HEADS")
        if head_dim_env and preset.embed_dim // preset.heads[0] != int(
            head_dim_env
        ):
            target_d = int(head_dim_env)
            base_d = preset.embed_dim // preset.heads[0]
            if target_d % base_d != 0:
                raise ValueError(
                    f"ROUTEFORMER_SWIN_HEADS={target_d} is not a multiple "
                    f"of the preset head dim {base_d}"
                )
            factor = target_d // base_d
            if any(h % factor for h in preset.heads):
                raise ValueError(
                    f"head counts {preset.heads} not divisible by "
                    f"repack factor {factor}"
                )
            preset = dc_replace(
                preset, heads=tuple(h // factor for h in preset.heads)
            )
        self.preset = preset
        self.train_backbone = configs.train_backbone
        self.unfreeze = False
        # Train-time photometric augs (reference TimmBackbone.py:58-67),
        # applied when the backbone itself is being trained. nnx
        # train()/eval() toggles `deterministic`. Applied to the [0,1]
        # frames BEFORE mean/std normalization (the reference runs
        # torchvision's [0,1]-clamping ops on normalized tensors; doing
        # it pre-normalization keeps the ops' semantics intact).
        self.deterministic = True
        self.aug_rngs = rngs.dropout.fork()
        dtype = (
            jnp.bfloat16
            if getattr(configs, "compute_dtype", "float32") == "bfloat16"
            else None
        )
        self.compute_dtype = dtype

        p = preset
        self.patch_embed = nnx.Conv(
            3, p.embed_dim, kernel_size=(p.patch_size, p.patch_size),
            strides=(p.patch_size, p.patch_size), padding="VALID",
            dtype=dtype, rngs=rngs,
        )
        self.patch_norm = nnx.LayerNorm(p.embed_dim, epsilon=1e-5, rngs=rngs)

        hw = p.img_size // p.patch_size
        dim = p.embed_dim
        stages = []
        merges = {}
        for si, (depth, heads) in enumerate(zip(p.depths, p.heads)):
            stages.append(
                SwinStage(
                    dim, heads, p.window, depth, (hw, hw), dtype,
                    remat=getattr(configs, "remat", False),
                    gelu_approximate=getattr(configs, "gelu", "exact") == "tanh",
                    flash_mode=getattr(configs, "window_flash", None),
                    rngs=rngs,
                )
            )
            if si < len(p.depths) - 1:
                merges[str(si)] = PatchMerging(dim, dtype, rngs=rngs)
                dim *= 2
                hw //= 2
        self.stages = nnx.List(stages)
        self.merges = nnx.Dict(merges)
        self.merge_stages = tuple(merges.keys())
        self.final_norm = nnx.LayerNorm(dim, epsilon=1e-5, rngs=rngs)
        self._output_feature_shape = (hw, hw, dim)

    @property
    def output_feature_shape(self) -> Tuple[int, int, int]:
        return self._output_feature_shape

    def preprocess(self, images: jnp.ndarray) -> jnp.ndarray:
        if images.dtype == jnp.uint8:
            from routeformer_tpu.ops.image import to_float16

            images = to_float16(images)
        n, h, w, c = images.shape
        if self.configs.pad_to_square and h != w:
            side = max(h, w)
            images = jnp.pad(images, ((0, 0), (0, side - h), (0, side - w), (0, 0)))
        size = self.preset.img_size
        if images.shape[1] != size or images.shape[2] != size:
            images = jax.image.resize(images, (n, size, size, c), method="bilinear")
        mean = jnp.asarray(IMAGENET_MEAN, dtype=images.dtype)
        std = jnp.asarray(IMAGENET_STD, dtype=images.dtype)
        return (images - mean) / std

    def preprocess_frames(self, images: jnp.ndarray) -> jnp.ndarray:
        """Augment (train-backbone mode) + resize/normalize to native
        resolution (see vit.py — enables multi-view batched encoding)."""
        if images.dtype == jnp.uint8:
            from routeformer_tpu.ops.image import to_float16

            images = to_float16(images)
        # Augment ONLY under train_backbone — the reference gates augs on
        # `self.train_backbone and self.training` (TimmBackbone.py:174-175),
        # so an unfreeze-only run never augments; `unfreeze` controls just
        # the stop_gradient removal (encode_frames).
        if self.train_backbone and not self.deterministic:
            from routeformer_tpu.ops.augment import photometric_augment

            images = photometric_augment(images, self.aug_rngs())
        x = self.preprocess(images)
        if self.compute_dtype is not None:
            x = x.astype(self.compute_dtype)
        return x

    def __call__(self, images: jnp.ndarray) -> jnp.ndarray:
        return self.encode_frames(self.preprocess_frames(images))

    def encode_frames(self, x: jnp.ndarray) -> jnp.ndarray:
        # Automatic fallback for geometries known to fault the TPU worker
        # with the Pallas window kernel in the full-step program (see the
        # guard at the top of this module / docs/PERF.md): those frame
        # batches take the einsum window path for the whole encode.
        if x.shape[0] in _bad_frame_counts() and jax.default_backend() == "tpu":
            logger.warning(
                "SwinV2 encode at known-bad frame batch %d: window "
                "attention falls back to the einsum path (see docs/PERF.md "
                "batch-8 kernel fault)", x.shape[0],
            )
            with _force_einsum_windows():
                return self._encode_frames_body(x)
        return self._encode_frames_body(x)

    def _encode_frames_body(self, x: jnp.ndarray) -> jnp.ndarray:
        x = self.patch_embed(x)
        x = self.patch_norm(x.astype(jnp.float32)).astype(x.dtype)
        for si, stage in enumerate(self.stages):
            x = stage(x)
            if str(si) in self.merge_stages:
                x = self.merges[str(si)](x)
        x = self.final_norm(x.astype(jnp.float32))
        if not (self.train_backbone or self.unfreeze):
            x = jax.lax.stop_gradient(x)
        return x


class SwinV2(SwinV2Backbone):
    """Cache-separated flagship SwinV2 encoder.

    The reference flagship video backbone slot
    (``swinv2_base_window12to16_192to256``, reference
    experiments/full_comparison.py:231-240 and
    video_backbone/__init__.py:14-18): the subclass exists for embedding-
    cache key separation, exactly like the reference's torchcache-wrapped
    subclasses.
    """
