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

    Owns its kernel/bias params directly (HWIO, fp32) so the Pallas fused
    conv+bias+LReLU kernel (ops/pallas/fused_conv.py) is a drop-in on the
    hot path: same params, same math. use_pallas routes stride-1 dilation-1
    3x3 calls through the kernel; everything else (and the default path)
    uses the XLA conv, whose bias+LReLU epilogue XLA fuses itself.
    """

    features: int
    strides: int = 1
    kernel: int = 3
    dilation: int = 1
    slope: float = 0.1
    use_pallas: bool = False
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        cin = x.shape[-1]
        kern = self.param(
            "kernel",
            nn.initializers.lecun_normal(),
            (self.kernel, self.kernel, cin, self.features),
            jnp.float32,
        )
        bias = self.param("bias", nn.initializers.zeros, (self.features,),
                          jnp.float32)
        fast = (
            self.use_pallas and self.kernel == 3 and self.strides == 1
            and self.dilation == 1
        )
        if fast:
            from video_super_resolution_tpu.ops.pallas.fused_conv import (
                fused_conv3x3,
            )
            from video_super_resolution_tpu.ops.pallas.util import should_interpret

            x = x.astype(self.dtype)
            return fused_conv3x3(
                x, kern.astype(self.dtype), bias.astype(self.dtype),
                self.slope, False, should_interpret(),
            )
        # Explicit symmetric padding = torch Conv2d(padding=k//2) semantics.
        # XLA "SAME" pads asymmetrically for stride 2 (lo=0, hi=1 on even
        # inputs) and would silently break torch-weight parity.
        # NB: no preferred_element_type here — with bf16 operands its conv
        # transpose feeds an f32 cotangent into a bf16 conv and fails; the
        # TPU MXU accumulates bf16 convs in f32 natively anyway.
        p = self.dilation * (self.kernel - 1) // 2
        out = jax.lax.conv_general_dilated(
            x.astype(self.dtype), kern.astype(self.dtype),
            (self.strides, self.strides), ((p, p), (p, p)),
            rhs_dilation=(self.dilation, self.dilation),
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )
        out = (out.astype(jnp.float32) + bias[None, None, None, :]).astype(
            self.dtype
        )
        return lrelu(out, self.slope)


class ResBlock(nn.Module):
    """conv-lrelu-conv + identity skip (no BN — SR convention).

    wide=True inverts to C -> 2C -> C: one wide block carries the MACs of
    TWO narrow blocks (4*9C^2 vs 2*9C^2 each), so halve the block count for
    equal cost — but both convs get a 128-lane side when C=64, which the
    MXU's 128-wide output tile wants (measured on this chip: 33 TF/s at
    64->64 vs 111 at Cout=128)."""

    features: int
    slope: float = 0.1
    use_pallas: bool = False
    dtype: Dtype = jnp.float32
    wide: bool = False

    @nn.compact
    def __call__(self, x):
        mid = 2 * self.features if self.wide else self.features
        h = ConvLReLU(mid, slope=self.slope, dtype=self.dtype,
                      use_pallas=self.use_pallas)(x)
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
