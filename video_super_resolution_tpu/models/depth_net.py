"""Monocular depth branch (SURVEY.md §2.1 #5).

Hourglass encoder-decoder (MegaDepth/monodepth-style topology per the spec's
"depth-guided" contract): stride-2 conv encoder, bilinear-upsample decoder
with skip connections, 1-channel inverse-depth output through softplus
(positive, near-0 = far). The absolute scale is irrelevant — fusion only
uses relative depth agreement (models/fusion.py).
"""

from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax
import jax.numpy as jnp

from video_super_resolution_tpu.models.common import ConvLReLU, SmallOutConv
from video_super_resolution_tpu.ops.resize import resize_bilinear


class DepthNet(nn.Module):
    channels: int = 64
    levels: int = 4
    slope: float = 0.1
    use_pallas: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        """(B, H, W, 3) frame -> (B, H, W, 1) inverse depth. H, W must be
        multiples of 2^levels (caller pads)."""
        # axon-XLA miscompile guard: the fused hourglass program produces
        # NaN column bands when the deepest level has H % 8 != 0 AND
        # W % 4 != 0 (measured on TPU v5lite/axon: 17x30 and 18x30 NaN;
        # 16x30, 17x32, 17x60 clean; CPU always clean, and
        # capture_intermediates also clean — a whole-program fusion bug,
        # not a numerics bug). Replicate-pad W so the deepest level is a
        # multiple of 4, crop after: interior numerics are unchanged and
        # the extra cost is bounded by 4*2^levels-1 columns.
        w_in = x.shape[-2]
        w_mult = 4 * 2 ** self.levels
        if w_in % w_mult:
            pad = [(0, 0)] * x.ndim
            pad[-2] = (0, (-w_in) % w_mult)
            x = jnp.pad(x, pad, mode="edge")
        x = x.astype(self.dtype)
        c = self.channels
        h = ConvLReLU(c, slope=self.slope, dtype=self.dtype,
                      use_pallas=self.use_pallas)(x)
        skips = []
        for l in range(self.levels):
            skips.append(h)
            h = ConvLReLU(min(c * 2 ** (l + 1), 4 * c), strides=2,
                          slope=self.slope, dtype=self.dtype)(h)
            h = ConvLReLU(min(c * 2 ** (l + 1), 4 * c),
                          slope=self.slope, dtype=self.dtype,
                          use_pallas=self.use_pallas)(h)
        for l in reversed(range(self.levels)):
            skip = skips[l]
            h = resize_bilinear(h, skip.shape[1], skip.shape[2]).astype(self.dtype)
            h = jnp.concatenate([h, skip], axis=-1)
            h = ConvLReLU(skip.shape[-1], slope=self.slope, dtype=self.dtype,
                          use_pallas=self.use_pallas)(h)
        # cout=1 conv idles 127/128 MXU lanes -> contraction formulation
        depth = SmallOutConv(1, dtype=jnp.float32,
                             name="Conv_0")(h.astype(jnp.float32))
        return nn.softplus(depth)[..., :, :w_in, :]
