"""Video backbone zoo (reference ``routeformer/models/video_backbone/__init__.py``)."""

from routeformer_tpu.models.video_backbone.config import (
    InverseFormBackboneConfig,
    TimmBackboneConfig,
    VideoBackboneConfig,
    VideoBackboneModule,
)
from routeformer_tpu.models.video_backbone.vit import DinoV2, Sam, SwinV2, TimmBackbone


def __getattr__(name):
    if name == "InverseForm":
        from routeformer_tpu.models.video_backbone.inverseform import InverseForm

        return InverseForm
    if name == "SwinV2Backbone":
        # The faithful hierarchical SwinV2 (windowed attention, res-post-norm,
        # cosine attention, CPB-MLP). The `SwinV2` name keeps the fast
        # scanned-ViT encoder for the flagship bench; select the true
        # architecture explicitly via this class.
        from routeformer_tpu.models.video_backbone.swin import SwinV2Backbone

        return SwinV2Backbone
    raise AttributeError(f"module {__name__!r} has no attribute {name!r}")


__all__ = [
    "SwinV2",
    "DinoV2",
    "Sam",
    "TimmBackbone",
    "VideoBackboneConfig",
    "VideoBackboneModule",
    "TimmBackboneConfig",
    "InverseFormBackboneConfig",
    "InverseForm",
]
