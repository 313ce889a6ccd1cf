"""HRNet-16 trunk (Flax NNX) — the InverseForm backbone's network.

Faithful reimplementation of the reference's vendored LightHRNet
(``routeformer/models/video_backbone/inverse_form_layers/hrnetv2.py:282``
``HighResolutionNet`` with the HR16 stage config,
``inverse_form_layers/config.py:174-206``):

- stem: two stride-2 3x3 convs to 64 channels (1/4 resolution),
- stage 1: two Bottleneck blocks at 64 (expansion 4 -> 256),
- stages 2-4: parallel multi-resolution branches with channels
  (16, 32, 64, 128), BASIC blocks (2 per branch per module), module counts
  (1, 3, 2), all-to-all SUM fusion (1x1 conv + bilinear up for coarse->fine;
  chains of stride-2 3x3 convs for fine->coarse),
- output: all four branches upsampled to the finest (1/4) resolution and
  concatenated -> 240 channels (``high_level_ch``), the tensor the
  InverseForm wrapper pools to 8x8 (reference InverseForm.py:67-69).

Module attribute names mirror the torch originals (conv1/bn1/layer1/
transition1/stage2.0.branches.i.j/fuse_layers.i.j...) so
``convert.load_torch_state_dict`` maps the published ``hr16s_4k_slim.pth``
checkpoint without bespoke renaming.

TPU notes: channel-last convs throughout (no NCHW permutes); BatchNorm in
inference mode (the trunk is a frozen/stage-frozen feature extractor);
bilinear resizes lower to XLA gather/convolutions.
"""

from typing import List, Optional, Sequence

import jax
import jax.numpy as jnp
from flax import nnx

BN_MOMENTUM = 0.9  # torch momentum 0.1 == flax momentum 0.9
HR16_CHANNELS = (16, 32, 64, 128)
HR16_MODULES = (1, 3, 2)  # stages 2, 3, 4


def _conv(c_in, c_out, kernel, stride, *, rngs):
    return nnx.Conv(
        c_in, c_out, kernel_size=(kernel, kernel), strides=(stride, stride),
        padding=[(kernel // 2, kernel // 2)] * 2, use_bias=False, rngs=rngs,
    )


def _bn(c, *, rngs):
    return nnx.BatchNorm(c, momentum=BN_MOMENTUM, epsilon=1e-5, rngs=rngs)


def _resize_to(x, h, w):
    if x.shape[1] == h and x.shape[2] == w:
        return x
    return jax.image.resize(x, (x.shape[0], h, w, x.shape[3]), "bilinear")


class BasicBlock(nnx.Module):
    expansion = 1

    def __init__(self, inplanes, planes, stride=1, has_downsample=False, *, rngs):
        self.conv1 = _conv(inplanes, planes, 3, stride, rngs=rngs)
        self.bn1 = _bn(planes, rngs=rngs)
        self.conv2 = _conv(planes, planes, 3, 1, rngs=rngs)
        self.bn2 = _bn(planes, rngs=rngs)
        self.downsample = (
            nnx.Dict(
                {
                    "0": _conv(inplanes, planes, 1, stride, rngs=rngs),
                    "1": _bn(planes, rngs=rngs),
                }
            )
            if has_downsample
            else None
        )

    def __call__(self, x):
        residual = x
        out = jax.nn.relu(self.bn1(self.conv1(x)))
        out = self.bn2(self.conv2(out))
        if self.downsample is not None:
            residual = self.downsample["1"](self.downsample["0"](x))
        return jax.nn.relu(out + residual)


class Bottleneck(nnx.Module):
    expansion = 4

    def __init__(self, inplanes, planes, stride=1, has_downsample=False, *, rngs):
        self.conv1 = _conv(inplanes, planes, 1, 1, rngs=rngs)
        self.bn1 = _bn(planes, rngs=rngs)
        self.conv2 = _conv(planes, planes, 3, stride, rngs=rngs)
        self.bn2 = _bn(planes, rngs=rngs)
        self.conv3 = _conv(planes, planes * 4, 1, 1, rngs=rngs)
        self.bn3 = _bn(planes * 4, rngs=rngs)
        self.downsample = (
            nnx.Dict(
                {
                    "0": _conv(inplanes, planes * 4, 1, stride, rngs=rngs),
                    "1": _bn(planes * 4, rngs=rngs),
                }
            )
            if has_downsample
            else None
        )

    def __call__(self, x):
        residual = x
        out = jax.nn.relu(self.bn1(self.conv1(x)))
        out = jax.nn.relu(self.bn2(self.conv2(out)))
        out = self.bn3(self.conv3(out))
        if self.downsample is not None:
            residual = self.downsample["1"](self.downsample["0"](x))
        return jax.nn.relu(out + residual)


class _ConvBnSeq(nnx.Module):
    """Sequential of (conv, bn[, relu]) triples with torch-style indices."""

    def __init__(self, specs, *, rngs):
        # specs: list of (c_in, c_out, stride, relu)
        mods = {}
        self.n = len(specs)
        self.relus = []
        for idx, (c_in, c_out, stride, relu) in enumerate(specs):
            mods[str(2 * idx)] = _conv(c_in, c_out, 3, stride, rngs=rngs)
            mods[str(2 * idx + 1)] = _bn(c_out, rngs=rngs)
            self.relus.append(relu)
        self.mods = nnx.Dict(mods)

    def __call__(self, x):
        for idx in range(self.n):
            x = self.mods[str(2 * idx + 1)](self.mods[str(2 * idx)](x))
            if self.relus[idx]:
                x = jax.nn.relu(x)
        return x


class HRModule(nnx.Module):
    """One exchange unit: per-branch block chains + all-to-all SUM fusion
    (reference hrnetv2.py:105-272)."""

    def __init__(self, channels: Sequence[int], num_blocks: int = 2, *, rngs):
        self.channels = list(channels)
        n = len(channels)
        self.branches = nnx.List(
            [
                nnx.List(
                    [BasicBlock(c, c, rngs=rngs) for _ in range(num_blocks)]
                )
                for c in channels
            ]
        )
        # fuse_layers[i][j]: contribution of branch j to output i
        fuse = {}
        for i in range(n):
            for j in range(n):
                if j > i:
                    # coarse -> fine: 1x1 conv + BN (+ bilinear upsample at call)
                    fuse[f"{i}_{j}"] = nnx.Dict(
                        {
                            "0": _conv(channels[j], channels[i], 1, 1, rngs=rngs),
                            "1": _bn(channels[i], rngs=rngs),
                        }
                    )
                elif j < i:
                    # fine -> coarse: chain of stride-2 3x3 convs; ReLU on
                    # all but the last
                    specs = []
                    for k in range(i - j):
                        last = k == i - j - 1
                        specs.append(
                            (
                                channels[j],
                                channels[i] if last else channels[j],
                                2,
                                not last,
                            )
                        )
                    fuse[f"{i}_{j}"] = _ConvBnSeq(specs, rngs=rngs)
        self.fuse_layers = nnx.Dict(fuse)

    def __call__(self, xs: List[jnp.ndarray]) -> List[jnp.ndarray]:
        xs = [
            self._run_branch(branch, x)
            for branch, x in zip(self.branches, xs)
        ]
        out = []
        for i in range(len(xs)):
            y = xs[i]
            h, w = y.shape[1:3]
            for j in range(len(xs)):
                if j == i:
                    continue
                f = self.fuse_layers[f"{i}_{j}"]
                if j > i:
                    z = _resize_to(f["1"](f["0"](xs[j])), h, w)
                else:
                    z = f(xs[j])
                y = y + z
            out.append(jax.nn.relu(y))
        return out

    @staticmethod
    def _run_branch(branch, x):
        for block in branch:
            x = block(x)
        return x


class _Transition(nnx.Module):
    """Branch-set transition (reference hrnetv2.py:336-377)."""

    def __init__(self, pre: Sequence[int], cur: Sequence[int], *, rngs):
        self.n_pre = len(pre)
        self.n_cur = len(cur)
        mods = {}
        for i in range(len(cur)):
            if i < len(pre):
                if cur[i] != pre[i]:
                    mods[str(i)] = _ConvBnSeq(
                        [(pre[i], cur[i], 1, True)], rngs=rngs
                    )
            else:
                specs = []
                for j in range(i + 1 - len(pre)):
                    out_c = cur[i] if j == i - len(pre) else pre[-1]
                    specs.append((pre[-1], out_c, 2, True))
                mods[str(i)] = _ConvBnSeq(specs, rngs=rngs)
        self.mods = nnx.Dict(mods)
        # membership on nnx.Dict is unreliable; keep an explicit key set
        self.present = tuple(sorted(mods))

    def __call__(self, xs: List[jnp.ndarray]) -> List[jnp.ndarray]:
        out = []
        for i in range(self.n_cur):
            key = str(i)
            if key in self.present:
                src = xs[i] if i < self.n_pre else xs[-1]
                out.append(self.mods[key](src))
            else:
                out.append(xs[i])
        return out


class HighResolutionNet16(nnx.Module):
    """The HR16 trunk: returns the 240-channel concat of all branches at
    the finest (1/4) resolution (reference hrnetv2.py:427-520 forward's
    third output, which InverseForm pools)."""

    def __init__(self, *, rngs: nnx.Rngs):
        ch = HR16_CHANNELS
        self.conv1 = _conv(3, 64, 3, 2, rngs=rngs)
        self.bn1 = _bn(64, rngs=rngs)
        self.conv2 = _conv(64, 64, 3, 2, rngs=rngs)
        self.bn2 = _bn(64, rngs=rngs)

        # stage 1: 2 bottlenecks at 64 -> 256
        self.layer1 = nnx.List(
            [
                Bottleneck(64, 64, has_downsample=True, rngs=rngs),
                Bottleneck(256, 64, rngs=rngs),
            ]
        )

        self.transition1 = _Transition((256,), ch[:2], rngs=rngs)
        self.stage2 = nnx.List(
            [HRModule(ch[:2], rngs=rngs) for _ in range(HR16_MODULES[0])]
        )
        self.transition2 = _Transition(ch[:2], ch[:3], rngs=rngs)
        self.stage3 = nnx.List(
            [HRModule(ch[:3], rngs=rngs) for _ in range(HR16_MODULES[1])]
        )
        self.transition3 = _Transition(ch[:3], ch, rngs=rngs)
        self.stage4 = nnx.List(
            [HRModule(ch, rngs=rngs) for _ in range(HR16_MODULES[2])]
        )
        self.high_level_ch = sum(ch)

    def stem(self, x: jnp.ndarray) -> jnp.ndarray:
        x = jax.nn.relu(self.bn1(self.conv1(x)))
        x = jax.nn.relu(self.bn2(self.conv2(x)))
        for block in self.layer1:
            x = block(x)
        return x

    def __call__(self, x: jnp.ndarray, stop_before_stage4: bool = False):
        """(N, H, W, 3) -> (N, H/4, W/4, 240).

        ``stop_before_stage4`` inserts a stop_gradient before stage 4,
        the reference's partial-unfreeze semantics (InverseForm.py:69-75:
        everything frozen except stage4).
        """
        x = self.stem(x)
        xs = self.transition1([x])
        for module in self.stage2:
            xs = module(xs)
        xs = self.transition2(xs)
        for module in self.stage3:
            xs = module(xs)
        xs = self.transition3(xs)
        if stop_before_stage4:
            xs = [jax.lax.stop_gradient(f) for f in xs]
        for module in self.stage4:
            xs = module(xs)

        h, w = xs[0].shape[1:3]
        return jnp.concatenate(
            [xs[0]] + [_resize_to(f, h, w) for f in xs[1:]], axis=-1
        )
