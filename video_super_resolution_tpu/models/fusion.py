"""Depth-guided fusion of warped neighbor features (SURVEY.md §2.1 #6).

The capability contract: "a depth-estimation branch whose output guides how
warped-neighbor features are fused with the reference frame's features."
Mechanism (DAIN-family depth-aware weighting, re-designed for one fused XLA
program):

1. Every frame's features come from a shared frame encoder; neighbor features
   and neighbor depth are backward-warped onto the reference frame by the
   estimated flow.
2. Per neighbor, a small conv head scores alignment quality from
   [ref_feat, warped_feat, ref_depth, warped_depth, |Δdepth|] — the |Δdepth|
   term is the explicit depth-consistency (occlusion) cue: a neighbor pixel
   whose warped depth disagrees with the reference depth is likely occluded
   and gets down-weighted.
3. Scores softmax across neighbors -> per-pixel fusion weights; the fused
   neighbor aggregate concats with ref features + depth into the fusion conv.

All neighbors are scored by the same head (folded into batch), so the
program is one big batched conv stack — MXU-friendly, no per-neighbor python
variance.
"""

from __future__ import annotations

import os
from typing import Any

import flax.linen as nn
import jax
import jax.numpy as jnp

from video_super_resolution_tpu.models.common import ConvLReLU
from video_super_resolution_tpu.ops.pallas.util import should_interpret


class ScoreConv(nn.Module):
    """The 3x3 alignment-score conv, split by input-channel linearity:
    conv(concat[ref_in, nbr_in]) == conv_ref + conv_nbr + bias, with the
    reference half computed once per batch element and broadcast over
    neighbors. One (3,3,Cref+Cnbr,F) HWIO kernel (torch-importable), sliced
    per half. Returns ACTIVATED (LeakyReLU) scores (B, N, H, W, F).

    On the TPU kernel route, the broadcast-add of the reference half, the
    bias, and the LReLU all run inside the neighbor conv's Pallas epilogue
    (fused_conv3x3 ``res`` operand, round 4) — the previous layout paid a
    separate full-size f32 broadcast-add + lrelu pass (~0.8 GB at full
    res). The XLA fallback keeps the exact f32-adds-then-lrelu numerics of
    the pre-fusion layout (golden fixtures pin it)."""

    features: int
    slope: float = 0.1
    use_pallas: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, ref_in: jax.Array, nbr_in: jax.Array,
                 stop_stage: str = "", split_at: int = 0) -> jax.Array:
        """stop_stage "fusion:sref": return only the reference-half conv
        (profiling hook — isolates it from the neighbor conv + epilogue).

        split_at > 0: the first ``split_at`` channels of BOTH halves are
        the wide feature block and the remainder are thin guide channels
        (depth / |Δdepth|). On the kernel route the guide channels then
        run as separate tiny XLA convs folded into the ``res`` operand —
        the r4 bisect pinned ~3x score-stage overhang on exactly the
        [feat, depth, ddiff] concats (134+270 MB) and the cin 65/66 -> 128
        pad copies (~270 MB per conv) this split eliminates (VERDICT r4
        next #1a). Identical math: the conv is linear in input channels.
        """
        b, n, h, w, cn = nbr_in.shape
        cr = ref_in.shape[-1]
        dt = self.dtype
        kern = self.param("kernel", nn.initializers.lecun_normal(),
                          (3, 3, cr + cn, self.features), jnp.float32)
        bias = self.param("bias", nn.initializers.zeros, (self.features,),
                          jnp.float32)

        from video_super_resolution_tpu.models.common import use_pallas_conv

        def lrelu32(s):
            s = s.astype(jnp.float32)
            return jnp.where(s >= 0, s, self.slope * s).astype(dt)

        fast = self.use_pallas or use_pallas_conv(
            None, h, w, cn, self.features)

        def conv(x, k, bias_=None, slope=1.0, res=None, res_repeat=1):
            if fast:
                from video_super_resolution_tpu.ops.pallas.fused_conv import (
                    fused_conv3x3,
                )

                bz = (jnp.zeros((k.shape[-1],), dt) if bias_ is None
                      else bias_.astype(dt))
                return fused_conv3x3(
                    x.astype(dt), k.astype(dt), bz, slope, False,
                    should_interpret(), 1, res, res_repeat,
                )
            out = jax.lax.conv_general_dilated(
                x.astype(dt), k.astype(dt), (1, 1), ((1, 1), (1, 1)),
                dimension_numbers=("NHWC", "HWIO", "NHWC"))
            return out

        def xconv(x, k):
            # thin-guide conv (K of 1-2) as im2col + ONE matmul: an XLA
            # conv at cin 1-2 deoptimizes in-context (measured +7 ms/frame
            # — the same context pathology as the r3 correlation finding);
            # tap-concat of the thin maps is ~36 MB and the dot is a
            # single well-shaped MXU pass.
            bx, hx, wx, cx = x.shape
            xp = jnp.pad(x.astype(dt), ((0, 0), (1, 1), (1, 1), (0, 0)))
            t = jnp.concatenate(
                [xp[:, dy:dy + hx, dx:dx + wx, :]
                 for dy in range(3) for dx in range(3)], axis=-1)
            k9 = k.reshape(9 * cx, k.shape[-1])
            return jax.lax.dot_general(
                t.reshape(-1, 9 * cx), k9.astype(dt),
                (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            ).reshape(bx, hx, wx, k.shape[-1]).astype(dt)

        if os.environ.get("VSR_SCORE_SPLIT", "1") == "0":
            # A/B variant: one conv on the concat (the pre-r2 layout).
            # More MACs (the ref half recomputes per neighbor) but a single
            # kernel invocation and no broadcast-add.
            cat = jnp.concatenate([
                jnp.broadcast_to(ref_in[:, None], (b, n, h, w, cr))
                .reshape(b * n, h, w, cr),
                nbr_in.reshape(b * n, h, w, cn),
            ], axis=-1)
            s = conv(cat, kern).reshape(b, n, h, w, self.features)
            return lrelu32(s.astype(jnp.float32)
                           + bias[None, None, None, None, :])
        # MEASURED NEGATIVE (r5, gate off): the guide-split was the r4
        # bisect's named fix for the score stage's ~3x overhang — but
        # in-context it LOSES to the concat+pad layout it replaces
        # (fusion:score delta 18.0 ms with XLA thin convs, 9.5 with the
        # im2col-matmul guide form, vs 8.8 for concat+pad; interleaved
        # stage A/Bs). The ref half's guide-split IS a win in isolation
        # (fusion:sref delta 3.3 -> 2.0 ms) but the neighbor half's
        # res-chain (d_nbr materialize + broadcast-add + kernel res read)
        # costs more than the 270 MB concat+pad it avoids. Kept for
        # re-measurement on future platforms: VSR_SCORE_GUIDE_SPLIT=1.
        if (fast and split_at
                and os.environ.get("VSR_SCORE_GUIDE_SPLIT", "0") == "1"):
            f = split_at
            nbr_flat = nbr_in.reshape(b * n, h, w, cn)
            # guide-channel contributions (tiny K) + the wide ref half,
            # all funneled into the neighbor conv's res operand
            d_ref = xconv(ref_in[..., f:], kern[:, :, f:cr])  # (B,H,W,F)
            s_ref = conv(ref_in[..., :f], kern[:, :, :f], res=d_ref)
            if stop_stage == "fusion:sref":
                return s_ref[:, None]
            # XLA fuses the broadcast-add of s_ref into d_nbr's epilogue
            d_nbr = (xconv(nbr_flat[..., f:], kern[:, :, cr + f:])
                     .reshape(b, n, h, w, self.features)
                     + s_ref[:, None].astype(dt)).reshape(
                         b * n, h, w, self.features)
            s = conv(nbr_flat[..., :f], kern[:, :, cr:cr + f],
                     bias_=bias, slope=self.slope, res=d_nbr)
            return s.reshape(b, n, h, w, self.features)
        # Packed score convs (round 5, VSR_SCORE_PACK): the wide F-channel
        # halves run pixel-pair-packed (dense K=128/N=128 — the measured
        # 2x rate at 64-ch shapes) and the thin guide channels (depth,
        # |ddiff|) fold in through thin_conv9 + the res operand. Differs
        # from the r5 guide-split negative result in that the WIDE convs
        # change rate class, not just the glue. Output stays packed for
        # the packed Score1 + aggregation path.
        if (fast and split_at and split_at == cn - 2 and w % 2 == 0
                and self.features == split_at and split_at in (64, 128)
                and os.environ.get(
                    "VSR_SCORE_PACK",
                    "0" if should_interpret() else "1") == "1"
                and stop_stage != "fusion:sref"):
            from video_super_resolution_tpu.models.common import thin_conv9
            from video_super_resolution_tpu.ops.pallas.fused_conv import (
                fused_conv3x3_packed,
            )

            f = split_at
            wh = w // 2
            nbr_flat = nbr_in.reshape(b * n, h, w, cn)
            d_ref = thin_conv9(ref_in[..., f:], kern[:, :, f:cr], dt)
            s_ref = fused_conv3x3_packed(
                ref_in[..., :f].reshape(b, h, wh, 2 * f).astype(dt),
                kern[:, :, :f].astype(dt),
                jnp.zeros((self.features,), dt), 1.0, True, True,
                should_interpret(),
                d_ref.reshape(b, h, wh, 2 * self.features).astype(dt),
            )                                           # (B, h, wh, 2F)
            d_nbr = thin_conv9(nbr_flat[..., f:], kern[:, :, cr + f:], dt)
            res = (d_nbr.reshape(b, n, h, wh, 2 * self.features)
                   .astype(dt) + s_ref[:, None]).reshape(
                       b * n, h, wh, 2 * self.features)
            s = fused_conv3x3_packed(
                nbr_flat[..., :f].reshape(b * n, h, wh, 2 * f).astype(dt),
                kern[:, :, cr:cr + f].astype(dt), bias.astype(dt),
                self.slope, True, True, should_interpret(), res,
            )
            return s.reshape(b, n, h, wh, 2 * self.features)  # PACKED
        if fast:
            s_ref = conv(ref_in, kern[:, :, :cr])             # (B,H,W,F) dt
            if stop_stage == "fusion:sref":
                return s_ref[:, None]
            s = conv(nbr_in.reshape(b * n, h, w, cn), kern[:, :, cr:],
                     bias_=bias, slope=self.slope, res=s_ref, res_repeat=n)
            return s.reshape(b, n, h, w, self.features)
        s_ref = conv(ref_in, kern[:, :, :cr])                 # (B,H,W,F)
        if stop_stage == "fusion:sref":
            return s_ref[:, None]
        s_nbr = conv(nbr_in.reshape(b * n, h, w, cn),
                     kern[:, :, cr:]).reshape(b, n, h, w, self.features)
        return lrelu32(s_ref[:, None].astype(jnp.float32)
                       + s_nbr.astype(jnp.float32)
                       + bias[None, None, None, None, :])


class Score1(nn.Module):
    """3x3 conv F -> 1 executed as channel-contraction + 9 shifted adds.

    A 1-output-channel conv is pathological on the MXU (127/128 output
    lanes idle: measured 3.9 ms for 0.6 GMAC at (2,544,960,64) — 0.3 TF/s).
    Same math, reordered: contract channels first with a (F, 9) matmul
    (tap t = (dy*3+dx)), then sum the 9 taps as shifted slices. Params keep
    the torch-importable (3,3,F,1) HWIO layout.

    Dtype: the contraction multiplies in the model compute dtype (bf16 in
    production) with f32 accumulation (preferred_element_type), and the 9
    shifted-tap adds run fully in f32. This is the MXU-native formulation;
    the pre-rewrite nn.Conv's all-f32 multiply bought no extra softmax
    stability beyond what the f32 accumulate + f32 adds here provide.
    """

    features: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, packed: bool = False) -> jax.Array:
        """packed: x is (B, H, W/2, 2F) pixel-pair-packed; returns
        (B, H, W/2, 2) — lane 0/1 = even/odd pixel scores. The contraction
        becomes one (2F, 18) block-diagonal matmul and the 9 shifted-tap
        adds split per parity (a horizontal shift of 1 pixel crosses the
        pair boundary, so even/odd pixels read different tap lanes of the
        left/right PAIR)."""
        if packed:
            b, h, wh, f2 = x.shape
            f = f2 // 2
        else:
            b, h, w, f = x.shape
        kern = self.param("kernel", nn.initializers.lecun_normal(),
                          (3, 3, f, 1), jnp.float32)
        bias = self.param("bias", nn.initializers.zeros, (1,), jnp.float32)
        # (3,3,F,1) -> (F, 9) with tap index dy*3+dx on the minor axis
        k9 = kern[..., 0].transpose(2, 0, 1).reshape(f, 9)
        if packed:
            z = jnp.zeros_like(k9)
            k2 = jnp.concatenate([
                jnp.concatenate([k9, z], axis=1),
                jnp.concatenate([z, k9], axis=1),
            ], axis=0)                                       # (2F, 18)
            u = jax.lax.dot_general(
                x.reshape(b * h * wh, f2).astype(self.dtype),
                k2.astype(self.dtype),
                (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            ).reshape(b, h, wh, 18)
            up = jnp.pad(u, ((0, 0), (1, 1), (1, 1), (0, 0)))
            u0 = up[..., :9]
            u1 = up[..., 9:]
            out_e = bias[0]
            out_o = bias[0]
            for dy in range(3):
                ys = slice(dy, dy + h)
                out_e = (out_e + u1[:, ys, 0:wh, dy * 3]
                         + u0[:, ys, 1:wh + 1, dy * 3 + 1]
                         + u1[:, ys, 1:wh + 1, dy * 3 + 2])
                out_o = (out_o + u0[:, ys, 1:wh + 1, dy * 3]
                         + u1[:, ys, 1:wh + 1, dy * 3 + 1]
                         + u0[:, ys, 2:wh + 2, dy * 3 + 2])
            return jnp.stack([out_e, out_o], axis=-1)        # (B,H,W/2,2)
        u = jax.lax.dot_general(
            x.reshape(b * h * w, f).astype(self.dtype), k9.astype(self.dtype),
            (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32,
        ).reshape(b, h, w, 9)
        up = jnp.pad(u, ((0, 0), (1, 1), (1, 1), (0, 0)))
        out = bias[0]
        for dy in range(3):
            for dx in range(3):
                out = out + up[:, dy:dy + h, dx:dx + w, dy * 3 + dx]
        return out[..., None]                                # (B,H,W,1) f32


class DepthGuidedFusion(nn.Module):
    features: int = 64
    slope: float = 0.1
    use_pallas: bool = False
    dtype: Any = jnp.float32
    # emit h2 in the pixel-pair-packed layout (the SR head consumes it
    # packed and the trunk is already packed — saves its entry relayout)
    out_packed: bool = False

    @nn.compact
    def __call__(
        self,
        ref_feat: jax.Array,       # (B, H, W, F)
        warped_feats: jax.Array,   # (B, N, H, W, F) neighbors warped onto ref
        ref_depth: jax.Array,      # (B, H, W, 1)
        warped_depths: jax.Array,  # (B, N, H, W, 1)
        stop_stage: str = "",      # "" | "fusion:score" | "fusion:score1"
                                   # | "fusion:agg" (profiling hooks)
    ) -> jax.Array:
        b, n, h, w, f = warped_feats.shape
        dt = self.dtype
        ref_feat = ref_feat.astype(dt)
        warped_feats = warped_feats.astype(dt)
        ref_depth32 = ref_depth.astype(jnp.float32)
        warped_depths32 = warped_depths.astype(jnp.float32)

        # Per-neighbor alignment scores, neighbors folded into batch. The
        # score conv is linear in its input channels, so the reference-frame
        # half runs ONCE per batch element and broadcasts over neighbors
        # (identical math to a conv on the concat, ~25% fewer score FLOPs;
        # bias lives in the neighbor half, added once).
        ddiff = jnp.abs(warped_depths32 - ref_depth32[:, None])      # (B,N,H,W,1)
        ref_in = jnp.concatenate(
            [ref_feat, ref_depth32.astype(dt)], axis=-1)             # (B,H,W,F+1)
        nbr_in = jnp.concatenate(
            [warped_feats, warped_depths32.astype(dt), ddiff.astype(dt)],
            axis=-1,
        )                                                            # (B,N,H,W,F+2)
        s = ScoreConv(self.features, slope=self.slope, dtype=dt,
                      use_pallas=self.use_pallas)(
                          ref_in, nbr_in,
                          stop_stage=(stop_stage
                                      if stop_stage == "fusion:sref" else ""),
                          split_at=f)
        if stop_stage == "fusion:sref":
            return s
        if stop_stage == "fusion:score":
            return s
        score_packed = s.shape[3] != w                 # (B,N,H,W/2,2F)
        if score_packed:
            wh = s.shape[3]
            scores = Score1(self.features, dtype=dt)(
                s.reshape(b * n, h, wh, 2 * self.features), packed=True
            ).reshape(b, n, h, wh, 2)
            if stop_stage == "fusion:score1":
                return scores
            weights = jax.nn.softmax(scores, axis=1)   # over neighbors
            wf_p = warped_feats.reshape(b, n, h, wh, 2 * f)
            agg = jnp.sum(
                jnp.repeat(weights.astype(jnp.float32), f, axis=-1)
                * wf_p.astype(jnp.float32), axis=1)    # (B,H,W/2,2F) packed
        else:
            s = Score1(self.features, dtype=dt)(
                s.reshape(b * n, h, w, self.features))
            scores = s.reshape(b, n, h, w, 1)
            if stop_stage == "fusion:score1":
                return scores
            weights = jax.nn.softmax(scores, axis=1)              # over neighbors

            agg = jnp.sum(weights.astype(jnp.float32)
                          * warped_feats.astype(jnp.float32), axis=1)  # (B,H,W,F)
        if stop_stage == "fusion:agg":
            return agg
        if score_packed and not (self.out_packed and f == self.features
                                 and f in (64, 128)):
            agg = agg.reshape(b, h, w, f)              # unpacked tail follows
            score_packed = False

        # Packed fusion tail (round 5, VSR_FUSION_PACK): h1's input
        # [ref_feat, agg, depth] is 2F+1 channels — on the kernel route the
        # 129 -> 256 lane pad copies the whole activation AND doubles the
        # MXU K side. Packed instead: [ref_feat | agg] is a lane-concat of
        # two packed-64 arrays (a SEGMENTED packed-128 input, exact K; the
        # kernel permutes weight rows), the depth channel folds in as a
        # thin_conv9 res operand, and h2 + the SR trunk entry stay packed.
        # Param tree byte-identical; math identical by conv linearity.
        if (self.out_packed and f == self.features and w % 2 == 0
                and f in (64, 128)):
            rp = ref_feat.reshape(b, h, w // 2, 2 * f)
            ap = (agg if score_packed
                  else agg.reshape(b, h, w // 2, 2 * f)).astype(dt)
            x = jnp.concatenate([rp, ap], axis=-1)
            h1 = ConvLReLU(self.features, slope=self.slope, dtype=dt,
                           in_packed=True, out_packed=True, in_seg=True,
                           name="ConvLReLU_0")(
                               x, guide=ref_depth32.astype(dt))
            h2 = ConvLReLU(self.features, slope=self.slope, dtype=dt,
                           in_packed=True, out_packed=True,
                           name="ConvLReLU_1")(h1)
            return h2                               # (B, H, W/2, 2F) packed
        fused_in = jnp.concatenate(
            [ref_feat, agg.astype(dt), ref_depth32.astype(dt)], axis=-1
        )
        h1 = ConvLReLU(self.features, slope=self.slope, dtype=dt,
                       use_pallas=self.use_pallas)(fused_in)
        h2 = ConvLReLU(self.features, slope=self.slope, dtype=dt,
                       use_pallas=self.use_pallas)(h1)
        return h2
