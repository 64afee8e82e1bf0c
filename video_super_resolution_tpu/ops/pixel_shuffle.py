"""Sub-pixel (pixel-shuffle) upsampling — SURVEY.md §2.1 #7.

Depth-to-space with torch ``nn.PixelShuffle`` channel ordering so imported
weights are bit-compatible: for NHWC input with C = c_out * r^2, channel
index c_out * r^2 + ry * r + rx maps to output pixel offset (ry, rx).

Pure reshape/transpose — XLA compiles this to a relayout, typically fused
into the producing conv; the Pallas fused conv→depth-to-space epilogue lives
in ``ops/pallas/`` for when the trunk conv itself is a kernel.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp


@functools.partial(jax.jit, static_argnames=("r",))
def pixel_shuffle(x: jax.Array, r: int) -> jax.Array:
    """(B, H, W, C*r^2) -> (B, H*r, W*r, C), torch channel order."""
    b, h, w, crr = x.shape
    if crr % (r * r) != 0:
        raise ValueError(f"channels {crr} not divisible by r^2={r*r}")
    c = crr // (r * r)
    x = x.reshape(b, h, w, c, r, r)          # (..., c, ry, rx)
    x = x.transpose(0, 1, 4, 2, 5, 3)        # (b, h, ry, w, rx, c)
    return x.reshape(b, h * r, w * r, c)


@functools.partial(jax.jit, static_argnames=("r",))
def pixel_unshuffle(x: jax.Array, r: int) -> jax.Array:
    """(B, H*r, W*r, C) -> (B, H, W, C*r^2), inverse of pixel_shuffle."""
    b, hr, wr, c = x.shape
    if hr % r or wr % r:
        raise ValueError(f"spatial dims ({hr},{wr}) not divisible by r={r}")
    h, w = hr // r, wr // r
    x = x.reshape(b, h, r, w, r, c)
    x = x.transpose(0, 1, 3, 5, 2, 4)        # (b, h, w, c, ry, rx)
    return x.reshape(b, h, w, c * r * r)
