"""Shared building blocks for all model modules.

All convs are NHWC / HWIO (TPU-native layout: C rides the 128 lanes, XLA maps
3x3 convs onto the MXU via implicit im2col). Compute dtype is a module arg
(bf16 by default from the policy), params always fp32.
"""

from __future__ import annotations

import contextlib
import contextvars
import os
from typing import Any, Callable, Optional, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

Dtype = Any


def lrelu(x: jax.Array, slope: float = 0.1) -> jax.Array:
    return nn.leaky_relu(x, negative_slope=slope)


# Scoped (non-global) conv routing override. Programs that must trace with a
# specific impl — e.g. the tensor-parallel forward, whose GSPMD partitioner
# cannot see through opaque Pallas custom calls — enter this context around
# their calls instead of mutating os.environ (which would silently re-route
# every LATER trace in the process; ADVICE r4 medium #1).
_conv_impl_override: contextvars.ContextVar[Optional[str]] = (
    contextvars.ContextVar("vsr_conv_impl_override", default=None))


@contextlib.contextmanager
def force_conv_impl(impl: str):
    """Scoped conv-routing override ("xla" | "pallas" | "auto").

    Takes precedence over the VSR_CONV_IMPL env var inside the context and
    leaves process state untouched on exit."""
    tok = _conv_impl_override.set(impl)
    try:
        yield
    finally:
        _conv_impl_override.reset(tok)


def conv_impl_policy() -> str:
    """Global conv routing policy: "auto" (default), "xla", or "pallas".

    Per-op routing (VERDICT r2 item 3a): instead of one model-wide
    use_pallas flag, each 3x3 conv call site decides from its shape whether
    the hand-written MXU kernel (ops/pallas/fused_conv.py) beats XLA's conv
    emitter — the emitter reaches only ~21-33 TF/s on the large-spatial
    trunk shapes while plain MXU matmuls reach ~175 (measured,
    tools/bench_conv.py). The env var VSR_CONV_IMPL overrides for A/B runs;
    a scoped :func:`force_conv_impl` context overrides both.
    """
    override = _conv_impl_override.get()
    if override is not None:
        return override
    return os.environ.get("VSR_CONV_IMPL", "auto")


def pallas_conv_wins(h: int, w: int, cin: int, cout: int) -> bool:
    """Measured win domain of the Pallas 9-matmul conv vs XLA's emitter.

    Large-spatial convs with MXU-worthy channel counts win; tiny feature
    maps and tiny cin (where 128-lane padding dominates) lose. Calibrated
    on chip via tools/bench_conv.py (artifact: BENCH_KERNELS.md).
    """
    if cin == 64 and cout == 128:
        # Standalone, XLA wins this shape (0.89 ms vs 1.31 pixel-pair /
        # 1.52 padded at (1,544,960,64,128)) — but IN-CONTEXT the XLA conv
        # deoptimizes the whole trunk (+8.6 ms/frame, r5 stage A/B), the
        # same context-sensitivity the r3 correlation finding documented.
        # Routing stays pallas; env knob for re-measurement.
        return os.environ.get("VSR_CONV_64_128", "pallas") == "pallas"
    return cin >= 32 and cout >= 16 and h * w >= 96 * 96


def use_pallas_conv(impl: Optional[str], h: int, w: int, cin: int,
                    cout: int) -> bool:
    """Resolve the routing decision for one 3x3 stride-1 dilation-1 conv."""
    from video_super_resolution_tpu.ops.pallas.util import should_interpret

    impl = impl or conv_impl_policy()
    if impl == "pallas":
        return True
    if impl == "xla":
        return False
    # "auto": the kernel only pays off compiled on the real chip
    return (not should_interpret()) and pallas_conv_wins(h, w, cin, cout)


def thin_conv9(x: jax.Array, k: jax.Array, dtype, pad_mode="constant") -> jax.Array:
    """3x3 SAME conv with a THIN input (cx of 1-2 channels) as im2col +
    ONE matmul: an XLA conv at cin 1-2 deoptimizes in-context (measured
    +7 ms/frame — the r3 correlation context pathology); the 9-tap concat
    of thin maps is small and the dot is a single well-shaped MXU pass.
    pad_mode "edge" replicates the border (the bilinear-skip fold's clamp
    semantics). Returns f32 (B, H, W, Cout)."""
    bx, hx, wx, cx = x.shape
    xp = jnp.pad(x.astype(dtype), ((0, 0), (1, 1), (1, 1), (0, 0)),
                 mode=pad_mode)
    t = jnp.concatenate(
        [xp[:, dy:dy + hx, dx:dx + wx, :]
         for dy in range(3) for dx in range(3)], axis=-1)
    k9 = k.reshape(9 * cx, k.shape[-1])
    return jax.lax.dot_general(
        t.reshape(-1, 9 * cx), k9.astype(dtype),
        (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ).reshape(bx, hx, wx, k.shape[-1])


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
    # pixel-pair-packed activation layout (ops/pallas/fused_conv.py
    # fused_conv3x3_packed): x arrives/leaves as (B, H, W/2, 2C). Param
    # tree is IDENTICAL to the unpacked module — only the activation
    # layout between calls changes (SRHead packed trunk).
    in_packed: bool = False
    out_packed: bool = False
    # in_seg: x is a lane-CONCAT of two packed-(C/2) groups (e.g. the
    # fusion tail's [ref_feat | agg]); the kernel permutes weight rows.
    in_seg: bool = False

    @nn.compact
    def __call__(self, x, guide=None):
        """guide: optional thin (B, H, W, Cg) UNPACKED trailing channels.
        The param kernel keeps the full (k, k, cin + Cg, F) concat shape
        (checkpoint-identical to a conv on the channel concat); the guide
        contribution runs as an im2col matmul (thin_conv9) folded into the
        packed conv's res operand — identical math by linearity."""
        gch = 0 if guide is None else guide.shape[-1]
        cin = (x.shape[-1] // 2 if self.in_packed else x.shape[-1]) + gch
        kern = self.param(
            "kernel",
            nn.initializers.lecun_normal(),
            (self.kernel, self.kernel, cin, self.features),
            jnp.float32,
        )
        bias = self.param("bias", nn.initializers.zeros, (self.features,),
                          jnp.float32)
        if self.in_packed or self.out_packed:
            assert (self.kernel == 3 and self.strides == 1
                    and self.dilation == 1), "packed layout: 3x3 s1 d1 only"
            from video_super_resolution_tpu.ops.pallas.fused_conv import (
                fused_conv3x3_packed,
            )
            from video_super_resolution_tpu.ops.pallas.util import should_interpret

            res = None
            kmain = kern
            if guide is not None:
                kmain = kern[:, :, : cin - gch]
                res = thin_conv9(
                    guide, kern[:, :, cin - gch:], self.dtype
                ).astype(self.dtype)
                if self.out_packed:
                    rb, rh, rw, rc = res.shape
                    res = res.reshape(rb, rh, rw // 2, 2 * rc)
            return fused_conv3x3_packed(
                x.astype(self.dtype), kmain.astype(self.dtype),
                bias.astype(self.dtype), self.slope, self.in_packed,
                self.out_packed, should_interpret(), res, 1, self.in_seg,
            )
        assert guide is None, "guide channels need the packed path"
        # A/B hook: thin-input (cin<=4) stride-1 convs as im2col + one
        # matmul (the frame/pyramid/depth entry convs at cin=3)
        if (self.kernel == 3 and self.strides == 1 and self.dilation == 1
                and cin <= 4
                and os.environ.get("VSR_THIN_CONV_IM2COL", "0") == "1"):
            out = thin_conv9(x, kern, self.dtype)
            out = out + bias[None, None, None, :]
            return lrelu(out, self.slope).astype(self.dtype)
        # dilated kernel support exists (d<=8) but measured neutral vs XLA
        # in-context (flow 18.6->18.9ms with ctx convs routed), so AUTO
        # routing keeps d==1 only; explicit use_pallas opts dilated in.
        routable = (self.kernel == 3 and self.strides == 1
                    and self.dilation <= 8)
        fast = routable and (
            self.use_pallas
            or (self.dilation == 1
                and use_pallas_conv(None, x.shape[1], x.shape[2], cin,
                                    self.features))
        )
        if fast:
            from video_super_resolution_tpu.ops.pallas.fused_conv import (
                fused_conv3x3,
            )
            from video_super_resolution_tpu.ops.pallas.util import should_interpret

            x = x.astype(self.dtype)
            return fused_conv3x3(
                x, kern.astype(self.dtype), bias.astype(self.dtype),
                self.slope, False, should_interpret(), self.dilation,
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


class RoutedConv(nn.Module):
    """3x3 SAME conv with no activation, shape-routed between XLA and the
    Pallas MXU kernel. Drop-in replacement for ``nn.Conv(features, (3, 3),
    padding="SAME")``: same param names ("kernel"/"bias"), shapes, and init
    — instantiate with ``name="Conv_0"`` to keep the param tree (and torch
    weight import + existing checkpoints) byte-identical.

    out_dtype: dtype of the returned activation (defaults to ``dtype``);
    set jnp.float32 for f32-pinned heads."""

    features: int
    dtype: Dtype = jnp.float32
    out_dtype: Optional[Dtype] = None
    in_packed: bool = False     # pixel-pair-packed layout (see ConvLReLU)
    out_packed: bool = False

    @nn.compact
    def __call__(self, x, res=None):
        """res: optional (B, H, W, features) residual added to the conv
        output PRE-cast (the bilinear-skip fold streams through the packed
        kernel's res operand instead of a separate full-size add pass)."""
        cin = x.shape[-1] // 2 if self.in_packed else x.shape[-1]
        kern = self.param("kernel", nn.initializers.lecun_normal(),
                          (3, 3, cin, self.features), jnp.float32)
        bias = self.param("bias", nn.initializers.zeros, (self.features,),
                          jnp.float32)
        odt = self.out_dtype or self.dtype
        if self.in_packed or self.out_packed:
            from video_super_resolution_tpu.ops.pallas.fused_conv import (
                fused_conv3x3_packed,
            )
            from video_super_resolution_tpu.ops.pallas.util import should_interpret

            out = fused_conv3x3_packed(
                x.astype(self.dtype), kern.astype(self.dtype),
                bias.astype(jnp.float32).astype(self.dtype), 1.0,
                self.in_packed, self.out_packed, should_interpret(),
                res, 1,
            )
            return out.astype(odt)
        if use_pallas_conv(None, x.shape[1], x.shape[2], cin, self.features):
            from video_super_resolution_tpu.ops.pallas.fused_conv import (
                fused_conv3x3,
            )
            from video_super_resolution_tpu.ops.pallas.util import should_interpret

            # slope=1.0 makes the in-kernel LReLU epilogue the identity
            out = fused_conv3x3(
                x.astype(self.dtype), kern.astype(self.dtype),
                bias.astype(jnp.float32).astype(self.dtype), 1.0, False,
                should_interpret(), 1, res, 1,
            )
            return out.astype(odt)
        out = jax.lax.conv_general_dilated(
            x.astype(self.dtype), kern.astype(self.dtype), (1, 1),
            ((1, 1), (1, 1)), dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )
        out = out.astype(jnp.float32) + bias[None, None, None, :]
        if res is not None:
            out = out + res.astype(jnp.float32)
        return out.astype(odt)


class SmallOutConv(nn.Module):
    """3x3 SAME conv with a tiny output-channel count (cout <= 4), executed
    as channel contraction + 9 shifted adds.

    A small-cout conv is pathological on the MXU — with cout=1 127/128
    output lanes idle (measured 0.3 TF/s; models/fusion.Score1's original
    motivation). Reordering gives identical math: contract channels with a
    (Cin, 9*cout) matmul (tap t = dy*3+dx on the minor axis, cout-major),
    then sum the 9 taps as shifted slices in f32. Param tree matches
    ``nn.Conv(cout, (3, 3), padding="SAME")`` — instantiate with
    ``name="Conv_0"`` for drop-in compatibility. Output is f32.
    """

    features: int                       # cout
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        b, h, w, f = x.shape
        co = self.features
        kern = self.param("kernel", nn.initializers.lecun_normal(),
                          (3, 3, f, co), jnp.float32)
        bias = self.param("bias", nn.initializers.zeros, (co,), jnp.float32)
        # (3,3,F,co) -> (F, co*9) with tap index dy*3+dx minor, cout major
        k9 = kern.transpose(2, 3, 0, 1).reshape(f, co * 9)
        u = jax.lax.dot_general(
            x.reshape(b * h * w, f).astype(self.dtype), k9.astype(self.dtype),
            (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32,
        ).reshape(b, h, w, co, 9)
        up = jnp.pad(u, ((0, 0), (1, 1), (1, 1), (0, 0), (0, 0)))
        out = bias[None, None, None, :]
        for dy in range(3):
            for dx in range(3):
                out = out + up[:, dy:dy + h, dx:dx + w, :, dy * 3 + dx]
        return out                                           # (B,H,W,co) f32


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
    packed: bool = False    # pixel-pair-packed activations through the block

    @nn.compact
    def __call__(self, x):
        mid = 2 * self.features if self.wide else self.features
        h = ConvLReLU(mid, slope=self.slope, dtype=self.dtype,
                      use_pallas=self.use_pallas, in_packed=self.packed,
                      out_packed=self.packed)(x)
        from video_super_resolution_tpu.ops.pallas.util import should_interpret

        if self.packed and os.environ.get(
                "VSR_RESBLOCK_FUSE",
                "0" if should_interpret() else "1") == "1":
            # identity skip as conv2's res operand: the conv is an opaque
            # Pallas call XLA cannot fuse the add into, so the plain `x+h`
            # costs a separate full-size elementwise pass per block
            return RoutedConv(self.features, dtype=self.dtype, name="Conv_0",
                              in_packed=True, out_packed=True)(h, res=x)
        h = RoutedConv(self.features, dtype=self.dtype, name="Conv_0",
                       in_packed=self.packed, out_packed=self.packed)(h)
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
