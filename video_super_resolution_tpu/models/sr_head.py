"""SR reconstruction head with sub-pixel upsampling (SURVEY.md §2.1 #7).

Residual conv trunk on fused features, then x4 upsampling as two
conv→pixel-shuffle(2)→LReLU stages, a final 3-channel conv, plus a bilinear
x4 skip of the reference frame (the network learns the residual detail).
"""

from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax
import jax.numpy as jnp

from video_super_resolution_tpu.models.common import (
    ConvLReLU,
    ResBlock,
    RoutedConv,
    lrelu,
)
from video_super_resolution_tpu.ops.pixel_shuffle import pixel_shuffle
from video_super_resolution_tpu.ops.resize import resize_bilinear
from video_super_resolution_tpu.ops.pallas.util import should_interpret


def _bilinear_ps_kernel(r: int):
    """(3, 3, 3, 3*r^2) constant HWIO kernel whose conv (with
    edge-replicate padding) equals ``upsample_bilinear_ps(x, r)`` exactly:
    output channel c*r^2 + py*r + px holds the bilinear phase (py, px)
    blend, whose half-pixel tap center (p + 0.5)/r - 0.5 lies within
    (-0.5, 0.5) — so its two taps per axis always fit the 3x3 window."""
    import math as _math

    import numpy as np

    k = np.zeros((3, 3, 3, 3 * r * r), np.float32)
    for py in range(r):
        cy = (py + 0.5) / r - 0.5
        ly = _math.floor(cy)
        fy = cy - ly
        yw = {ly + 1: 1.0 - fy, ly + 2: fy}
        for px in range(r):
            cx = (px + 0.5) / r - 0.5
            lx = _math.floor(cx)
            fx = cx - lx
            xw = {lx + 1: 1.0 - fx, lx + 2: fx}
            for ky, wy in yw.items():
                for kx, wx in xw.items():
                    if wy == 0.0 or wx == 0.0:
                        continue
                    for c in range(3):
                        k[ky, kx, c, c * r * r + py * r + px] = wy * wx
    return k


class SRHead(nn.Module):
    """Two styles (ModelConfig.sr_head_style):

    - "espcn" (default): every conv at LR — trunk, then one conv to
      3*scale^2 channels and a single pixel_shuffle(scale). The only
      full-resolution op is the bilinear-skip add; on TPU this is the
      difference between HBM-bound full-res convs and staying in the
      MXU-friendly LR regime (measured: ~3x faster head).
    - "two_stage": conv→ps2→lrelu twice + a 3-channel conv at full
      resolution — the torch-reference-era layout, kept for weight parity.
    """

    features: int = 64
    blocks: int = 5
    scale: int = 4
    slope: float = 0.1
    wide_blocks: bool = True
    style: str = "espcn"
    espcn_mid: int = 0
    use_pallas: bool = False
    dtype: Any = jnp.float32
    in_packed: bool = False     # `fused` arrives pixel-pair-packed

    @nn.compact
    def __call__(self, fused: jax.Array, ref_frame: jax.Array,
                 stop_stage: str = "") -> jax.Array:
        """fused (B,H,W,F), ref_frame (B,H,W,3) -> (B, H*scale, W*scale, 3).

        stop_stage: profiling hook ("sr_trunk" | "sr_conv" | "sr_skip")."""
        if self.scale not in (2, 4):
            raise ValueError("scale must be 2 or 4")
        dt = self.dtype
        # Packed trunk (round 5): pack the activation layout ONCE at the
        # entry conv, run every trunk conv pixel-pair-packed (the MXU sees
        # N=2*Cout=128-dense sides instead of half-idle N=64 — measured 2x
        # useful rate at the 64->64 shapes), unpack once inside the
        # subpixel conv. Residual adds are layout-invariant; the param tree
        # is byte-identical to the unpacked trunk. Engages at production
        # widths with even W; other shapes keep the unpacked routing.
        packed = self.in_packed or (
            self.style == "espcn" and self.features in (64, 128)
            and fused.shape[2] % 2 == 0)
        h = ConvLReLU(self.features, slope=self.slope, dtype=dt,
                      use_pallas=self.use_pallas, in_packed=self.in_packed,
                      out_packed=packed)(fused.astype(dt))
        trunk_in = h
        for _ in range(self.blocks):
            h = ResBlock(self.features, slope=self.slope, dtype=dt,
                         use_pallas=self.use_pallas, wide=self.wide_blocks,
                         packed=packed)(h)
        h = RoutedConv(self.features, dtype=dt, name="Conv_0",
                       in_packed=packed, out_packed=packed)(h)
        h = h + trunk_in                                  # global trunk skip
        if stop_stage == "sr_trunk":
            return h

        b, hh, ww, _ = ref_frame.shape
        if self.style == "espcn":
            from video_super_resolution_tpu.ops.resize import upsample_bilinear_ps

            if self.espcn_mid:
                h = ConvLReLU(self.espcn_mid, slope=self.slope, dtype=dt,
                              name="espcn_mid", in_packed=packed,
                              out_packed=packed
                              and self.espcn_mid in (64, 128))(h)
                packed = packed and self.espcn_mid in (64, 128)
            import os

            # the subpixel conv runs in the compute dtype on the compiled
            # TPU route (quality-gated: hard-regime serving eval moves
            # -0.0031 dB avg / -0.0048 worst clip vs the f32 conv —
            # QUALITY_serving_r5.json; ~0.5 ms/frame) and f32 under
            # interpret/CPU (oracle + golden fixtures unchanged).
            # VSR_SUBPIX_BF16 overrides either way.
            sdt = (dt if os.environ.get(
                "VSR_SUBPIX_BF16",
                "0" if should_interpret() else "1") == "1"
                   else jnp.float32)
            # Skip fold (round 5): the bilinear x4 skip in pre-shuffle form
            # IS a 3x3 conv of the reference frame with a CONSTANT kernel
            # (half-pixel tap offsets stay within ±1; edge-replicate pad =
            # the resize's clamp, so the identity is exact everywhere
            # including borders). Computing it as thin_conv9 + streaming it
            # through the subpixel conv's res operand replaces the separate
            # upsample + full-size add pass (measured +4.1 ms stage delta).
            fold = os.environ.get(
                "VSR_SKIP_FOLD",
                "0" if should_interpret() else "1") == "1"
            if fold:
                from video_super_resolution_tpu.models.common import thin_conv9

                kmat = jnp.asarray(
                    _bilinear_ps_kernel(self.scale), jnp.float32)
                skip_ps = thin_conv9(ref_frame.astype(jnp.float32), kmat,
                                     jnp.float32, pad_mode="edge")
                out = RoutedConv(3 * self.scale**2, dtype=sdt,
                                 out_dtype=jnp.float32, name="subpixel_conv",
                                 in_packed=packed)(h.astype(sdt),
                                                   res=skip_ps)
                if stop_stage in ("sr_conv", "sr_skip"):
                    return out
                return pixel_shuffle(out, self.scale)
            out = RoutedConv(3 * self.scale**2, dtype=sdt,
                             out_dtype=jnp.float32, name="subpixel_conv",
                             in_packed=packed)(h.astype(sdt))
            if stop_stage == "sr_conv":
                return out
            # bilinear skip in pre-shuffle form: add before the single
            # depth-to-space (commutes exactly with pixel_shuffle; avoids a
            # second 4K-sized interleave + 100 MB add at full res). Channel
            # order (c, py, px) matches pixel_shuffle's (c*r^2 + py*r + px),
            # but the conv output is ordered the same way by construction.
            skip_ps = upsample_bilinear_ps(
                ref_frame.astype(jnp.float32), self.scale
            )
            if stop_stage == "sr_skip":
                return out + skip_ps
            return pixel_shuffle(out + skip_ps, self.scale)
        skip = resize_bilinear(
            ref_frame.astype(jnp.float32), hh * self.scale, ww * self.scale
        )

        # Upsample stages own their params directly so the Pallas fused
        # conv->depth-to-space->lrelu epilogue and the XLA path share one
        # param tree (checkpoint-compatible either way).
        for u in range(self.scale // 2):
            cin = h.shape[-1]
            kern = self.param(
                f"upsample_{u}_kernel", nn.initializers.lecun_normal(),
                (3, 3, cin, self.features * 4), jnp.float32,
            )
            bias = self.param(f"upsample_{u}_bias", nn.initializers.zeros,
                              (self.features * 4,), jnp.float32)
            if self.use_pallas:
                from video_super_resolution_tpu.ops.pallas.fused_conv import (
                    fused_conv3x3,
                )

                h = fused_conv3x3(h.astype(dt), kern.astype(dt),
                                  bias.astype(dt), self.slope, True,
                                  should_interpret())
            else:
                h = jax.lax.conv_general_dilated(
                    h.astype(dt), kern.astype(dt), (1, 1), "SAME",
                    dimension_numbers=("NHWC", "HWIO", "NHWC"),
                )
                h = (h.astype(jnp.float32) + bias[None, None, None, :]).astype(dt)
                h = pixel_shuffle(h, 2)
                h = lrelu(h, self.slope)
        # keep the legacy auto-assigned name (nn.Conv counter would have
        # given the two_stage head Conv_1 after the trunk-end Conv_0)
        out = nn.Conv(3, (3, 3), padding="SAME", dtype=jnp.float32,
                      param_dtype=jnp.float32, name="Conv_1")(
                          h.astype(jnp.float32))
        return out + skip
