"""Coarse-to-fine optical flow with cost-volume correlation (SURVEY.md §2.1 #1-4).

PWC-style design re-thought for XLA: the level loop is a *static* Python loop
(true data dependence across levels, SURVEY.md §3.3 — it stays sequential
inside one jit program; parallelism comes from batch x neighbors x space).
Per level:

    flow_up = 2 * bilinear_up(flow)                  # pixels at this level
    warped  = backward_warp(nbr_feat, flow_up)
    cv      = lrelu(correlation(ref_feat, warped))   # (2d+1)^2 channels
    flow    = flow_up + estimator(cv, ref_feat, flow_up)

with a DenseNet-style estimator (each conv's input concats all previous
outputs) and a dilated-conv context network refining the finest-level flow.
Flow is estimated down to pyramid level ``finest_level`` (default 1 = 1/4
input resolution, the PWC-Net convention) and upsampled to full resolution
at the end (scaled accordingly).
"""

from __future__ import annotations

from typing import Any, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from video_super_resolution_tpu.models.common import ConvLReLU, SmallOutConv, lrelu
from video_super_resolution_tpu.models.feature_pyramid import FeaturePyramid
from video_super_resolution_tpu.ops.correlation import correlation
from video_super_resolution_tpu.ops.resize import resize_bilinear
from video_super_resolution_tpu.ops.warp import backward_warp


class DenseFlowEstimator(nn.Module):
    """DenseNet-connected conv stack predicting a 2-channel flow residual."""

    channels: Tuple[int, ...] = (128, 128, 96, 64, 32)
    slope: float = 0.1
    use_pallas: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> Tuple[jax.Array, jax.Array]:
        import contextlib
        import os

        from video_super_resolution_tpu.models.common import force_conv_impl

        # A/B hook (r5 flow bisect: the finest estimator is 8.4 ms at
        # ~18 TF/s — dense-concat growth + 128-lane pad copies around the
        # kernels): VSR_EST_CONV=xla routes JUST the estimator convs to
        # XLA's emitter for the trace.
        ctx = (force_conv_impl("xla")
               if os.environ.get("VSR_EST_CONV", "") == "xla"
               else contextlib.nullcontext())
        feats = x
        with ctx:
            for c in self.channels:
                out = ConvLReLU(c, slope=self.slope, dtype=self.dtype,
                                use_pallas=self.use_pallas)(feats)
                feats = jnp.concatenate([feats, out], axis=-1)
        # cout=2 convs idle 126/128 MXU lanes; the contraction formulation
        # (models/common.SmallOutConv) keeps the flow residual f32-pinned
        flow = SmallOutConv(2, dtype=jnp.float32,
                            name="Conv_0")(feats.astype(jnp.float32))
        return feats, flow


class ContextNetwork(nn.Module):
    """Dilated-conv refinement of the finest flow (PWC context network)."""

    channels: Tuple[int, ...] = (128, 128, 128, 96, 64, 32)
    dilations: Tuple[int, ...] = (1, 2, 4, 8, 16, 1)
    slope: float = 0.1
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, feat: jax.Array, flow: jax.Array) -> jax.Array:
        h = jnp.concatenate([feat.astype(self.dtype), flow.astype(self.dtype)], -1)
        for c, d in zip(self.channels, self.dilations):
            h = ConvLReLU(c, dilation=d, slope=self.slope, dtype=self.dtype)(h)
        return SmallOutConv(2, dtype=jnp.float32,
                            name="Conv_0")(h.astype(jnp.float32))


class FlowNet(nn.Module):
    """ref, nbr (B,H,W,3) -> flow (B,H,W,2) mapping ref pixels into nbr.

    H, W must be multiples of 2^pyramid_levels (the caller pads — see
    VSRModel). Flow is returned in pixels at full resolution.
    """

    pyramid_channels: Tuple[int, ...] = (16, 32, 64, 96, 128)
    estimator_channels: Tuple[int, ...] = (128, 128, 96, 64, 32)
    context_channels: Tuple[int, ...] = (128, 128, 128, 96, 64, 32)
    max_displacement: int = 4
    slope: float = 0.1
    use_pallas: bool = False
    dtype: Any = jnp.float32
    # finest level that runs an estimator (0 = 1/2 res, 1 = 1/4 res — the
    # PWC-Net convention estimates at 1/4 and upsamples to full).
    finest_level: int = 1
    warp_impl: str = "tiled"

    @nn.compact
    def __call__(self, ref: jax.Array, nbr: jax.Array,
                 stop_stage: str = "") -> jax.Array:
        """stop_stage (profiling hook, tools/bench_model_ab.py): "" or
        "flow:pyr" | "flow:l<level>" | "flow:nocorr" | "flow:noctx".
        "flow:nocorr" replaces every cost volume with a zeros stand-in
        (isolates the correlation's in-context cost; numerics are wrong)."""
        ref = ref.astype(self.dtype)
        nbr = nbr.astype(self.dtype)
        pyramid = FeaturePyramid(self.pyramid_channels, self.slope,
                                 use_pallas=self.use_pallas, dtype=self.dtype)
        if ref.shape[0] != nbr.shape[0]:
            # Deduplicated-reference form (round 5): the caller passes ref
            # at its TRUE batch (B) and neighbors folded to B*N. One
            # pyramid call over [ref; nbrs] (B*(1+N) tower instead of
            # 2*B*N = the ref tower computed once, not once per neighbor —
            # ~25% of the pyramid stage at N=2) and the ref features
            # broadcast per neighbor (a few MB of HBM writes, ~free).
            br, bn = ref.shape[0], nbr.shape[0]
            n = bn // br
            assert br * n == bn, (ref.shape, nbr.shape)
            pyr_all = pyramid(jnp.concatenate([ref, nbr], axis=0))
            pyr_r = [
                jnp.broadcast_to(p[:br, None], (br, n) + p.shape[1:])
                .reshape((bn,) + p.shape[1:])
                for p in pyr_all
            ]
            pyr_n = [p[br:] for p in pyr_all]
            ref = jnp.broadcast_to(
                ref[:, None], (br, n) + ref.shape[1:]
            ).reshape((bn,) + ref.shape[1:])
        else:
            pyr_r = pyramid(ref)
            pyr_n = pyramid(nbr)
        levels = len(pyr_r)
        if stop_stage == "flow:pyr":
            return jnp.stack([jnp.mean(p.astype(jnp.float32))
                              for p in pyr_r + pyr_n])

        flow = None
        feat = None
        finest = min(self.finest_level, levels - 1)
        for l in reversed(range(finest, levels)):  # coarsest -> finest estimated
            fr, fn = pyr_r[l], pyr_n[l]
            b, h, w, _ = fr.shape
            if flow is None:
                flow_up = jnp.zeros((b, h, w, 2), jnp.float32)
                warped = fn
            else:
                flow_up = 2.0 * resize_bilinear(flow, h, w)
                warped = backward_warp(fn, flow_up, use_pallas=self.use_pallas,
                                       impl=self.warp_impl)
            if stop_stage == "flow:nocorr":
                cv = jnp.zeros(fr.shape[:3] + ((2 * self.max_displacement + 1) ** 2,),
                               self.dtype) + 1e-20 * jnp.mean(warped).astype(self.dtype)
            elif stop_stage == "flow:cheapcorr":
                # nonconstant 81-ch stand-in at ~zero cost: discriminates
                # "the corr sweep is slow" from "nocorr's zeros let XLA
                # constant-fold channels out of every estimator conv"
                k81 = (2 * self.max_displacement + 1) ** 2
                cv = jnp.repeat(
                    jnp.sum(fr * warped, axis=-1, keepdims=True)
                    .astype(self.dtype), k81, axis=-1)
            else:
                cv = lrelu(
                    correlation(fr, warped, self.max_displacement,
                                use_pallas=self.use_pallas),
                    self.slope,
                ).astype(self.dtype)
            est_in = jnp.concatenate(
                [cv, fr, flow_up.astype(self.dtype)], axis=-1
            )
            feat, residual = DenseFlowEstimator(
                self.estimator_channels, self.slope, dtype=self.dtype,
                use_pallas=self.use_pallas, name=f"estimator_l{l}",
            )(est_in)
            flow = flow_up + residual
            if stop_stage == f"flow:l{l}":
                # barrier: a mid-graph cut changes XLA's fusion choices and
                # has produced axon miscompiles (NaN) in prefix programs;
                # decoupling the return from producer fusions avoids it
                return jax.lax.optimization_barrier(
                    flow + jnp.float32(1e-20) * jnp.mean(
                        feat.astype(jnp.float32)))

        if stop_stage != "flow:noctx":
            flow = flow + ContextNetwork(
                self.context_channels, slope=self.slope, dtype=self.dtype
            )(feat, flow)

        # level `finest` is 1/2^(finest+1) resolution: upsample to full res
        # and scale the pixel displacements accordingly.
        full_h, full_w = ref.shape[1], ref.shape[2]
        scale = float(2 ** (finest + 1))
        return scale * resize_bilinear(flow, full_h, full_w)
