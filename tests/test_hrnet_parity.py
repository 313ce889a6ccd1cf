"""Numerical parity of the HRNet-16 trunk against a torch twin.

The twin mirrors the reference's vendored hrnetv2 semantics (stem, 2
bottlenecks, 3 multi-resolution stages with SUM fusion, HR16 channels) AND
its state-dict naming (``stage2.0.branches.0.0.conv1.weight``,
``transition2.2.0.0.weight``, ``fuse_layers.0.1.0.weight``, ...), so
``convert.load_hrnet_torch`` consumes its ``state_dict()`` exactly as it
would the published ``hr16s_4k_slim.pth`` — validating the key translation,
the BatchNorm running-stat loading, and the JAX forward math end to end.
"""

import numpy as np
import jax.numpy as jnp
import torch
import torch.nn as nn
import torch.nn.functional as F
from flax import nnx

from routeformer_tpu.models.video_backbone.convert import load_hrnet_torch
from routeformer_tpu.models.video_backbone.hrnet import (
    HR16_CHANNELS,
    HR16_MODULES,
    HighResolutionNet16,
)


def conv3x3(c_in, c_out, stride=1):
    return nn.Conv2d(c_in, c_out, 3, stride, 1, bias=False)


class TorchBasic(nn.Module):
    def __init__(self, c_in, c, stride=1, downsample=None):
        super().__init__()
        self.conv1 = conv3x3(c_in, c, stride)
        self.bn1 = nn.BatchNorm2d(c)
        self.conv2 = conv3x3(c, c)
        self.bn2 = nn.BatchNorm2d(c)
        self.downsample = downsample

    def forward(self, x):
        r = x if self.downsample is None else self.downsample(x)
        y = F.relu(self.bn1(self.conv1(x)))
        y = self.bn2(self.conv2(y))
        return F.relu(y + r)


class TorchBottleneck(nn.Module):
    def __init__(self, c_in, c, downsample=None):
        super().__init__()
        self.conv1 = nn.Conv2d(c_in, c, 1, bias=False)
        self.bn1 = nn.BatchNorm2d(c)
        self.conv2 = conv3x3(c, c)
        self.bn2 = nn.BatchNorm2d(c)
        self.conv3 = nn.Conv2d(c, 4 * c, 1, bias=False)
        self.bn3 = nn.BatchNorm2d(4 * c)
        self.downsample = downsample

    def forward(self, x):
        r = x if self.downsample is None else self.downsample(x)
        y = F.relu(self.bn1(self.conv1(x)))
        y = F.relu(self.bn2(self.conv2(y)))
        y = self.bn3(self.conv3(y))
        return F.relu(y + r)


class TorchHRModule(nn.Module):
    def __init__(self, channels):
        super().__init__()
        n = len(channels)
        self.branches = nn.ModuleList(
            [
                nn.Sequential(TorchBasic(c, c), TorchBasic(c, c))
                for c in channels
            ]
        )
        fuse_layers = []
        for i in range(n):
            row = []
            for j in range(n):
                if j > i:
                    row.append(
                        nn.Sequential(
                            nn.Conv2d(channels[j], channels[i], 1, bias=False),
                            nn.BatchNorm2d(channels[i]),
                        )
                    )
                elif j == i:
                    row.append(None)
                else:
                    chain = []
                    for k in range(i - j):
                        last = k == i - j - 1
                        out_c = channels[i] if last else channels[j]
                        mods = [
                            conv3x3(channels[j], out_c, 2),
                            nn.BatchNorm2d(out_c),
                        ]
                        if not last:
                            mods.append(nn.ReLU())
                        chain.append(nn.Sequential(*mods))
                    row.append(nn.Sequential(*chain))
            fuse_layers.append(nn.ModuleList(row))
        self.fuse_layers = nn.ModuleList(fuse_layers)

    def forward(self, xs):
        xs = [b(x) for b, x in zip(self.branches, xs)]
        out = []
        for i in range(len(xs)):
            y = xs[i]
            for j in range(len(xs)):
                if i == j:
                    continue
                z = self.fuse_layers[i][j](xs[j])
                if j > i:
                    z = F.interpolate(
                        z, size=y.shape[-2:], mode="bilinear",
                        align_corners=False,
                    )
                y = y + z
            out.append(F.relu(y))
        return out


def make_transition(pre, cur):
    mods = []
    for i in range(len(cur)):
        if i < len(pre):
            if cur[i] != pre[i]:
                mods.append(
                    nn.Sequential(
                        conv3x3(pre[i], cur[i]),
                        nn.BatchNorm2d(cur[i]),
                        nn.ReLU(),
                    )
                )
            else:
                mods.append(None)
        else:
            chain = []
            for j in range(i + 1 - len(pre)):
                out_c = cur[i] if j == i - len(pre) else pre[-1]
                chain.append(
                    nn.Sequential(
                        conv3x3(pre[-1], out_c, 2),
                        nn.BatchNorm2d(out_c),
                        nn.ReLU(),
                    )
                )
            mods.append(nn.Sequential(*chain))
    return nn.ModuleList(mods)


class TorchHRNet16(nn.Module):
    def __init__(self):
        super().__init__()
        ch = HR16_CHANNELS
        self.conv1 = conv3x3(3, 64, 2)
        self.bn1 = nn.BatchNorm2d(64)
        self.conv2 = conv3x3(64, 64, 2)
        self.bn2 = nn.BatchNorm2d(64)
        down = nn.Sequential(
            nn.Conv2d(64, 256, 1, bias=False), nn.BatchNorm2d(256)
        )
        self.layer1 = nn.Sequential(
            TorchBottleneck(64, 64, down), TorchBottleneck(256, 64)
        )
        self.transition1 = make_transition((256,), ch[:2])
        self.stage2 = nn.Sequential(
            *[TorchHRModule(ch[:2]) for _ in range(HR16_MODULES[0])]
        )
        self.transition2 = make_transition(ch[:2], ch[:3])
        self.stage3 = nn.Sequential(
            *[TorchHRModule(ch[:3]) for _ in range(HR16_MODULES[1])]
        )
        self.transition3 = make_transition(ch[:3], ch)
        self.stage4 = nn.Sequential(
            *[TorchHRModule(ch) for _ in range(HR16_MODULES[2])]
        )

    @staticmethod
    def _apply_transition(transition, xs):
        out = []
        for i, mod in enumerate(transition):
            if mod is None:
                out.append(xs[i])
            else:
                out.append(mod(xs[i] if i < len(xs) else xs[-1]))
        return out

    def forward(self, x):
        x = F.relu(self.bn1(self.conv1(x)))
        x = F.relu(self.bn2(self.conv2(x)))
        x = self.layer1(x)
        xs = self._apply_transition(self.transition1, [x])
        for m in self.stage2:
            xs = m(xs)
        xs = self._apply_transition(self.transition2, xs)
        for m in self.stage3:
            xs = m(xs)
        xs = self._apply_transition(self.transition3, xs)
        for m in self.stage4:
            xs = m(xs)
        size = xs[0].shape[-2:]
        ups = [xs[0]] + [
            F.interpolate(f, size=size, mode="bilinear", align_corners=False)
            for f in xs[1:]
        ]
        return torch.cat(ups, 1)


def test_hrnet16_forward_parity():
    torch.manual_seed(0)
    twin = TorchHRNet16().eval()
    with torch.no_grad():
        # non-trivial BN statistics and affine params
        for name, m in twin.named_modules():
            if isinstance(m, nn.BatchNorm2d):
                m.running_mean.normal_(0, 0.2)
                m.running_var.uniform_(0.5, 2.0)
                m.weight.normal_(1.0, 0.1)
                m.bias.normal_(0, 0.1)

    model = HighResolutionNet16(rngs=nnx.Rngs(0))
    model.eval()
    n_loaded, n_total = load_hrnet_torch(model, twin.state_dict())
    assert n_loaded == n_total, f"loaded {n_loaded}/{n_total}"

    x = np.random.RandomState(0).rand(2, 64, 96, 3).astype(np.float32)
    with torch.no_grad():
        t_out = twin(torch.from_numpy(x).permute(0, 3, 1, 2))
    t_out = t_out.permute(0, 2, 3, 1).numpy()

    j_out = np.asarray(model(jnp.asarray(x)))
    assert j_out.shape == t_out.shape == (2, 16, 24, 240)
    np.testing.assert_allclose(j_out, t_out, atol=2e-4, rtol=1e-3)
