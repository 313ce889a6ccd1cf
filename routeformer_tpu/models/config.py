"""Routeformer config.

Capability parity with reference ``routeformer/models/config.py:11-107``:
hierarchical dataclass config owning the GPS- and video-backbone configs;
``__post_init__`` validates FPS divisibility and *pushes* derived fields into
the child GPS config's ``init=False`` receiving fields.
"""

from dataclasses import dataclass, field
from typing import Literal, Optional

from routeformer_tpu.models.gps_backbone.config import GPSBackboneConfig
from routeformer_tpu.models.video_backbone.config import VideoBackboneConfig
from routeformer_tpu.utils.config import BaseConfig


@dataclass
class RouteformerConfig(BaseConfig):
    """Config for Routeformer (reference models/config.py:11-107)."""

    gps_backbone_config: GPSBackboneConfig
    video_backbone_config: Optional[VideoBackboneConfig] = None
    output_attention: bool = False
    # If None, resolved to (video_backbone_config is not None).
    with_video: Optional[bool] = None
    with_gaze: bool = False
    with_scene: bool = True
    # Future discount schedule {epoch: gamma}.
    discount_factor: dict = field(default_factory=lambda: {0: 0.9})
    decoder_mode: Literal["vanilla", "recursive", "smart"] = "vanilla"
    rotate_motion: bool = False
    loss_function: Literal["mse", "mae", "smooth_l1"] = "smooth_l1"
    epsilon: Optional[float] = None
    visual_epsilon: Optional[float] = None
    # Autoregressive eval decode, chunked by step size.
    autoregressive: bool = False
    autoregressive_step_size: int = 1
    # Dense prediction: also predict future visual features.
    dense_prediction: bool = False
    dense_loss_ratio: float = 0.25
    # FPS of video/gaze streams; must divide output_fps.
    video_fps: int = 1
    gaze_fps: int = 1
    # Fusion encoder parameters.
    encoder_hidden_size: int = 64
    encoder_heads: int = 8
    encoder_layers: int = 2
    encoder_d_ff: int = 64
    cross_modal_decoder_heads: int = 8
    cross_modal_decoder_layers: int = 1
    # Motion normalization / augmentation.
    normalize_motion: bool = False
    motion_mean: float = 0.0
    motion_std: float = 1.0
    motion_noise: float = 0.0
    # View/gaze/feature dropout.
    view_dropout: float = 0.0
    gaze_dropout: float = 0.0
    feature_dropout: float = 0.0
    image_embedding_size: int = 128
    # Training params (carried for the driver, not used in the model math).
    lr: float = 5e-4
    wd: float = 0
    optimizer: str = "Adam"
    batch_size: int = 32
    min_pci: float = 0.0
    step_size: int = 1
    epochs: int = 100
    output_fps: int = 5
    gopro_scaling_factor: float = 1.0
    front_scaling_factor: float = 1.0
    num_workers: int = 0
    use_cache: bool = False
    cache_dir: Optional[str] = None
    # Compute dtype for the model ("float32" or "bfloat16"); TPU-specific
    # addition — params stay float32, activations/matmuls run in this dtype.
    compute_dtype: str = "float32"

    # Rebuttal params (reference config.py:81-82)
    _only_motion: bool = False

    def __post_init__(self, **kwargs):
        assert (
            self.output_fps % self.video_fps == 0
        ), "Video FPS must be a divisor of the output FPS"
        assert (
            self.output_fps % self.gaze_fps == 0
        ), "Gaze FPS must be a divisor of the output FPS"
        self.with_video = (
            self.with_video
            if self.with_video is not None
            else self.video_backbone_config is not None
        )
        if self.with_gaze:
            assert self.with_video, "Gaze backbone requires video backbone to be used"
        # Push derived fields into the child GPS config
        # (reference models/config.py:96-107).
        self.gps_backbone_config.output_attention = self.output_attention
        self.gps_backbone_config.with_video = self.with_video
        self.gps_backbone_config.with_gaze = self.with_gaze
        self.gps_backbone_config.dense_prediction = self.dense_prediction
        self.gps_backbone_config.image_embedding_size = self.image_embedding_size
        self.gps_backbone_config.encoder_hidden_size = self.encoder_hidden_size
        self.gps_backbone_config.output_fps = self.output_fps
        self.gps_backbone_config.dense_loss_ratio = self.dense_loss_ratio
        self.gps_backbone_config.discount_factor = self.discount_factor
        self.gps_backbone_config.smart_decoder = self.decoder_mode == "smart"
