"""Shared building blocks for all model modules.

All convs are NHWC / HWIO (TPU-native layout: C rides the 128 lanes, XLA maps
3x3 convs onto the MXU via implicit im2col). Compute dtype is a module arg
(bf16 by default from the policy), params always fp32.
"""

from __future__ import annotations

from typing import Any, Callable, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

Dtype = Any


def lrelu(x: jax.Array, slope: float = 0.1) -> jax.Array:
    return nn.leaky_relu(x, negative_slope=slope)


class ConvLReLU(nn.Module):
    """3x3 conv + bias + LeakyReLU — the workhorse block.

    The Pallas fused conv+bias+LReLU kernel (ops/pallas/fused_conv.py) is a
    drop-in for this block's math on the hot path; XLA already fuses the
    bias+LReLU epilogue into the conv, so the default path is this module.
    """

    features: int
    strides: int = 1
    kernel: int = 3
    dilation: int = 1
    slope: float = 0.1
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        x = nn.Conv(
            self.features,
            (self.kernel, self.kernel),
            strides=(self.strides, self.strides),
            kernel_dilation=(self.dilation, self.dilation),
            padding="SAME",
            dtype=self.dtype,
            param_dtype=jnp.float32,
        )(x)
        return lrelu(x, self.slope)


class ResBlock(nn.Module):
    """conv-lrelu-conv + identity skip (no BN — SR convention)."""

    features: int
    slope: float = 0.1
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        h = ConvLReLU(self.features, slope=self.slope, dtype=self.dtype)(x)
        h = nn.Conv(self.features, (3, 3), padding="SAME", dtype=self.dtype,
                    param_dtype=jnp.float32)(h)
        return x + h


def pad_to_multiple(x: jax.Array, mult: int) -> Tuple[jax.Array, Tuple[int, int]]:
    """Replicate-pad H, W (axes -3, -2) up to a multiple of ``mult``."""
    h, w = x.shape[-3], x.shape[-2]
    ph = (-h) % mult
    pw = (-w) % mult
    if ph == 0 and pw == 0:
        return x, (h, w)
    pad = [(0, 0)] * x.ndim
    pad[-3] = (0, ph)
    pad[-2] = (0, pw)
    return jnp.pad(x, pad, mode="edge"), (h, w)


def crop_to(x: jax.Array, h: int, w: int) -> jax.Array:
    return x[..., :h, :w, :]
