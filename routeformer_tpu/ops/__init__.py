"""TPU compute kernels (Pallas) with pure-JAX fallbacks.

The reference reaches native compute only through library calls (cuDNN SDPA,
OpenCV resize/undistort, ffmpeg). Here the hot device-side ops are owned by
this package:

- ``attention``: dense flash attention (Pallas MXU kernel) + the reference's
  attention variants (ProbSparse, AutoCorrelation) expressed TPU-natively.
- ``image``: bilinear resize / undistort-remap / crop kernels for the video
  input path.
- ``heatmap``: gaze Gaussian-heatmap rasterization.

Every op has a jittable pure-JAX path (used on CPU and for tiny shapes) and a
Pallas path (used on TPU when shapes warrant it); the dispatch is automatic
and overridable.
"""

from routeformer_tpu.ops.attention import (
    autocorrelation_attention,
    dot_product_attention,
    prob_sparse_attention,
)
from routeformer_tpu.ops.fusion_stack import (
    StackWeights,
    fused_perceive_stack,
    make_dropout_masks,
    sample_count_matrices,
    stack_reference,
)
from routeformer_tpu.ops.heatmap import overlay_heatmap_on_frame, rasterize_gaze_heatmap
from routeformer_tpu.ops.image import (
    crop_horizontal,
    remap,
    resize_video,
    to_float16,
    undistort_video,
)

__all__ = [
    "dot_product_attention",
    "prob_sparse_attention",
    "autocorrelation_attention",
    "StackWeights",
    "fused_perceive_stack",
    "make_dropout_masks",
    "sample_count_matrices",
    "stack_reference",
    "rasterize_gaze_heatmap",
    "overlay_heatmap_on_frame",
    "remap",
    "resize_video",
    "crop_horizontal",
    "undistort_video",
    "to_float16",
]
