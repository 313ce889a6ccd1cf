"""Video backbone zoo (reference ``routeformer/models/video_backbone/__init__.py``)."""

from routeformer_tpu.models.video_backbone.config import (
    InverseFormBackboneConfig,
    TimmBackboneConfig,
    VideoBackboneConfig,
    VideoBackboneModule,
)
from routeformer_tpu.models.video_backbone.swin import SwinV2, SwinV2Backbone
from routeformer_tpu.models.video_backbone.vit import DinoV2, Sam, TimmBackbone


def __getattr__(name):
    if name == "InverseForm":
        from routeformer_tpu.models.video_backbone.inverseform import InverseForm

        return InverseForm
    raise AttributeError(f"module {__name__!r} has no attribute {name!r}")


__all__ = [
    "SwinV2",
    "SwinV2Backbone",
    "DinoV2",
    "Sam",
    "TimmBackbone",
    "VideoBackboneConfig",
    "VideoBackboneModule",
    "TimmBackboneConfig",
    "InverseFormBackboneConfig",
    "InverseForm",
]
