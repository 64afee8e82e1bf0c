"""Strided-conv feature pyramid (SURVEY.md §2.1 #1, PWC-Net design).

Each level: stride-2 conv then a stride-1 conv, both with LeakyReLU(0.1).
Level l has spatial size H/2^(l+1) and ``channels[l]`` features. Returned
finest-first: ``feats[0]`` is the 1/2-resolution level.
"""

from __future__ import annotations

from typing import Any, List, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from video_super_resolution_tpu.models.common import ConvLReLU


class FeaturePyramid(nn.Module):
    channels: Tuple[int, ...] = (16, 32, 64, 96, 128)
    slope: float = 0.1
    use_pallas: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> List[jax.Array]:
        feats = []
        h = x
        for c in self.channels:
            h = ConvLReLU(c, strides=2, slope=self.slope, dtype=self.dtype)(h)
            h = ConvLReLU(c, strides=1, slope=self.slope, dtype=self.dtype,
                          use_pallas=self.use_pallas)(h)
            feats.append(h)
        return feats
