"""InverseForm video backbone: HRNet-16 segmentation trunk (Flax NNX).

Capability parity with reference
``routeformer/models/video_backbone/InverseForm.py:12-181``: the Qualcomm
InverseForm checkpoint's LightHRNet-16 trunk used as a feature extractor —
the 240-channel multi-resolution concat adaptive-average-pooled to 8x8
(InverseForm.py:67-69). The trunk itself is the faithful HR16 architecture
(``hrnet.py``; vendored ``inverse_form_layers/hrnetv2.py`` +
``lighthrnet.py`` in the reference).

- Partial unfreezing: when training, everything except stage 4 stays frozen
  (reference InverseForm.py:69-75) — expressed functionally as a
  stop_gradient before stage 4.
- Checkpoint loading: the reference fuzzy-remaps ``hr16s_4k_slim.pth``
  (InverseForm.py:94-133); here ``configs.model_path`` (when the file
  exists) loads through ``convert.load_torch_checkpoint``, whose fuzzy
  name matching plays the same role. The GitHub download (:44-49) has no
  offline equivalent (zero egress).
- No minibatch loop (reference :166-173): XLA pipelines the whole flattened
  frame batch.
"""

from pathlib import Path
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from flax import nnx

from routeformer_tpu.models.video_backbone.config import (
    InverseFormBackboneConfig,
    VideoBackboneModule,
)
from routeformer_tpu.models.video_backbone.hrnet import HighResolutionNet16
from routeformer_tpu.utils.logging import get_logger

logger = get_logger("video_backbone.inverseform")


class InverseForm(VideoBackboneModule):
    """HRNet-16 trunk + adaptive 8x8 pool feature extractor."""

    POOL_HW = (8, 8)

    def __init__(
        self, configs: Optional[InverseFormBackboneConfig] = None, *, rngs: nnx.Rngs
    ):
        configs = configs or InverseFormBackboneConfig()
        self.configs = configs
        self.train_backbone = configs.train_backbone
        self.unfreeze = False

        self.backbone = HighResolutionNet16(rngs=rngs)
        self._out_c = self.backbone.high_level_ch  # 240

        model_path = getattr(configs, "model_path", None)
        if model_path and Path(model_path).exists():
            import torch

            from routeformer_tpu.models.video_backbone.convert import (
                load_hrnet_torch,
            )

            state = torch.load(model_path, map_location="cpu", weights_only=True)
            if isinstance(state, dict) and "state_dict" in state:
                state = state["state_dict"]
            n_loaded, n_total = load_hrnet_torch(self.backbone, state)
            logger.info(
                "InverseForm checkpoint %s: %d/%d params loaded",
                model_path, n_loaded, n_total,
            )

    @property
    def output_feature_shape(self) -> Tuple[int, int, int]:
        return (*self.POOL_HW, self._out_c)

    def __call__(self, images: jnp.ndarray) -> jnp.ndarray:
        """(N, H, W, C) in [0,1] -> (N, 8, 8, 240) features.

        The reference feeds raw (un-normalized) float images
        (InverseForm.py:157-159) — preserved.
        """
        if images.dtype == jnp.uint8:
            from routeformer_tpu.ops.image import to_float16

            images = to_float16(images)
        images = images.astype(jnp.float32)
        trainable = self.train_backbone or self.unfreeze
        feats = self.backbone(
            images, stop_before_stage4=trainable
        )

        # adaptive average pool to POOL_HW (reference AdaptiveAvgPool2d 8x8)
        ph, pw = self.POOL_HW
        n, fh, fw, c = feats.shape
        if fh % ph == 0 and fw % pw == 0:
            ky, kx = fh // ph, fw // pw
            out = feats.reshape(n, ph, ky, pw, kx, c).mean(axis=(2, 4))
        else:
            # non-divisible (or smaller) feature maps: bilinear resample to
            # the pooled grid
            out = jax.image.resize(feats, (n, ph, pw, c), method="bilinear")
        if not trainable:
            out = jax.lax.stop_gradient(out)
        return out
