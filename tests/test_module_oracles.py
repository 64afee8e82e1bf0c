"""Module numerics vs torch-CPU reimplementations with identical weights
(SURVEY.md §4.2). Validates composition order + weight-import end to end:
build the same topology in torch, import its weights into the Flax module,
assert outputs match."""

import jax
import jax.numpy as jnp
import numpy as np
import torch
import torch.nn as nn
import torch.nn.functional as F

from video_super_resolution_tpu.models import DepthNet, FeaturePyramid
from video_super_resolution_tpu.training.import_torch import (
    conv_kernel_to_hwio,
    import_by_order,
)


class TorchPyramid(nn.Module):
    def __init__(self, channels=(8, 16)):
        super().__init__()
        layers = []
        cin = 3
        for c in channels:
            layers.append(nn.Conv2d(cin, c, 3, stride=2, padding=1))
            layers.append(nn.Conv2d(c, c, 3, padding=1))
            cin = c
        self.convs = nn.ModuleList(layers)

    def forward(self, x):
        feats = []
        h = x
        for i in range(0, len(self.convs), 2):
            h = F.leaky_relu(self.convs[i](h), 0.1)
            h = F.leaky_relu(self.convs[i + 1](h), 0.1)
            feats.append(h)
        return feats


def test_feature_pyramid_matches_torch(rng):
    tm = TorchPyramid((8, 16))
    x = rng.random((2, 16, 24, 3)).astype(np.float32)
    with torch.no_grad():
        want = [
            t.permute(0, 2, 3, 1).numpy()
            for t in tm(torch.from_numpy(x).permute(0, 3, 1, 2))
        ]

    fm = FeaturePyramid(channels=(8, 16))
    variables = fm.init(jax.random.key(0), jnp.asarray(x))
    pairs = [(c.weight, c.bias) for c in tm.convs]
    params = import_by_order(pairs, variables["params"])
    got = fm.apply({"params": params}, jnp.asarray(x))
    assert len(got) == len(want)
    for g, w in zip(got, want):
        np.testing.assert_allclose(np.asarray(g), w, rtol=1e-4, atol=1e-5)


class TorchDepthNet(nn.Module):
    """Mirror of models/depth_net.py with channels=8, levels=2."""

    def __init__(self, c=8, levels=2):
        super().__init__()
        self.levels = levels
        self.stem = nn.Conv2d(3, c, 3, padding=1)
        enc = []
        cin = c
        for l in range(levels):
            cl = min(c * 2 ** (l + 1), 4 * c)
            enc.append(nn.Conv2d(cin, cl, 3, stride=2, padding=1))
            enc.append(nn.Conv2d(cl, cl, 3, padding=1))
            cin = cl
        self.enc = nn.ModuleList(enc)
        dec = []
        # decoder: concat(upsampled, skip) -> conv to skip channels
        skips = [c] + [min(c * 2 ** (l + 1), 4 * c) for l in range(levels - 1)]
        cur = cin
        for l in reversed(range(levels)):
            dec.append(nn.Conv2d(cur + skips[l], skips[l], 3, padding=1))
            cur = skips[l]
        self.dec = nn.ModuleList(dec)
        self.head = nn.Conv2d(cur, 1, 3, padding=1)

    def forward(self, x):
        h = F.leaky_relu(self.stem(x), 0.1)
        skips = []
        for l in range(self.levels):
            skips.append(h)
            h = F.leaky_relu(self.enc[2 * l](h), 0.1)
            h = F.leaky_relu(self.enc[2 * l + 1](h), 0.1)
        for i, l in enumerate(reversed(range(self.levels))):
            skip = skips[l]
            h = F.interpolate(h, size=skip.shape[-2:], mode="bilinear",
                              align_corners=False)
            h = torch.cat([h, skip], dim=1)
            h = F.leaky_relu(self.dec[i](h), 0.1)
        return F.softplus(self.head(h))


def test_depth_net_matches_torch(rng):
    tm = TorchDepthNet(c=8, levels=2)
    x = rng.random((1, 16, 16, 3)).astype(np.float32)
    with torch.no_grad():
        want = tm(torch.from_numpy(x).permute(0, 3, 1, 2)).permute(0, 2, 3, 1).numpy()

    fm = DepthNet(channels=8, levels=2)
    variables = fm.init(jax.random.key(0), jnp.asarray(x))
    # flax sorted-path order: ConvLReLU_0 (stem), ConvLReLU_1..4 (enc),
    # ConvLReLU_5..6 (dec), Conv_0 (head)
    pairs = (
        [(tm.stem.weight, tm.stem.bias)]
        + [(c.weight, c.bias) for c in tm.enc]
        + [(c.weight, c.bias) for c in tm.dec]
        + [(tm.head.weight, tm.head.bias)]
    )
    params = import_by_order(pairs, variables["params"])
    got = np.asarray(fm.apply({"params": params}, jnp.asarray(x)))
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)
