"""Video backbone configs and abstract interface.

Capability parity with reference
``routeformer/models/video_backbone/config.py:11-56``: the base config
carries embedding-cache and minibatching knobs; ``TimmBackboneConfig`` adds
model selection + pad-to-square; ``InverseFormBackboneConfig`` the
checkpoint path. The torchcache knobs map onto this build's content-hash
embedding cache (``video_backbone/cache.py``).

The abstract module contract (≙ ``VideoBackboneModule``): a backbone maps a
flattened frame batch ``(N, H, W, C)`` (channel-last, TPU-native) to a
feature map ``(N, H', W', C')`` and exposes ``output_feature_shape``
``(H', W', C')``.
"""

from abc import abstractmethod
from dataclasses import dataclass
from typing import Optional, Tuple

from flax import nnx

from routeformer_tpu.utils.config import BaseConfig


@dataclass
class VideoBackboneConfig(BaseConfig):
    """Config for video backbones (reference video_backbone/config.py:11-27)."""

    cache_dir: Optional[str] = None
    train_backbone: bool = False
    backbone_minibatch_size: int = 4
    # Embedding-cache knobs (torchcache equivalents).
    cache_enabled: bool = True
    cache_module_hash: Optional[str] = None
    max_persistent_cache_size: float = 200e9
    max_memory_cache_size: float = 20e9
    cache_dtype: str = "bfloat16"

    def __post_init__(self):
        if self.cache_enabled and self.train_backbone:
            raise ValueError("cache_enabled and train_backbone cannot both be True.")


@dataclass
class TimmBackboneConfig(VideoBackboneConfig):
    """Config for pretrained-encoder backbones (reference config.py:30-36)."""

    pad_to_square: bool = True
    model_type: Optional[str] = None
    # Path to a converted checkpoint (torch state_dict -> flax), optional.
    checkpoint_path: Optional[str] = None
    # Computation dtype for the encoder (params stay float32). bfloat16 is
    # the TPU-native choice and plays the role of the reference's autocast
    # (TimmBackbone.py:132).
    compute_dtype: str = "bfloat16"
    # GELU variant inside encoder blocks. "exact" (erf) matches torch/timm
    # checkpoints bit-for-bit in the activation; "tanh" is the cheaper
    # approximation (~6% faster flagship step on TPU) — safe when training
    # from scratch, wrong when importing pretrained torch weights.
    gelu: str = "exact"
    # Rematerialize encoder blocks in the backward pass: activations inside
    # each block are recomputed instead of stored, trading FLOPs for HBM —
    # lets much larger frame batches fit when the backbone is trained
    # (train_backbone/unfreeze). No effect on frozen (stop_gradient) use.
    remat: bool = False
    # SwinV2 window-attention kernel dispatch: "1" = always the fused
    # Pallas kernel (bf16, TPU only), "0" = always the XLA einsum path
    # (f32 scores), "auto" = per-shape size threshold, None = defer to the
    # ROUTEFORMER_SWIN_FLASH env var (default "auto"). The choice is
    # evaluated at TRACE time and frozen into the compiled program: under
    # "auto" different stages of one model may take different numeric
    # paths, and changing the env var after the first jit has no effect.
    window_flash: Optional[str] = None


@dataclass
class InverseFormBackboneConfig(VideoBackboneConfig):
    """Config for the HRNet segmentation-trunk backbone (reference config.py:39-44)."""

    download_model: bool = False
    model_path: Optional[str] = None


class VideoBackboneModule(nnx.Module):
    """Abstract video backbone (reference config.py:47-56)."""

    # Whether the trainer's epoch-10 boundary flips this module's
    # ``unfreeze``. Only the timm-encoder backbones opt in: the reference's
    # epoch unfreeze lives solely in TimmBackbone.forward
    # (TimmBackbone.py:123); InverseForm keeps its static partial-freeze
    # semantics (InverseForm.py:69-75) with no epoch dependence.
    epoch_unfreeze: bool = False

    @property
    @abstractmethod
    def output_feature_shape(self) -> Tuple[int, int, int]:
        """Shape (H', W', C') of the output feature map."""
        ...
