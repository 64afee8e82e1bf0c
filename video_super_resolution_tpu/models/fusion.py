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

from typing import Any

import flax.linen as nn
import jax
import jax.numpy as jnp

from video_super_resolution_tpu.models.common import ConvLReLU


class DepthGuidedFusion(nn.Module):
    features: int = 64
    slope: float = 0.1
    use_pallas: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(
        self,
        ref_feat: jax.Array,       # (B, H, W, F)
        warped_feats: jax.Array,   # (B, N, H, W, F) neighbors warped onto ref
        ref_depth: jax.Array,      # (B, H, W, 1)
        warped_depths: jax.Array,  # (B, N, H, W, 1)
    ) -> jax.Array:
        b, n, h, w, f = warped_feats.shape
        dt = self.dtype
        ref_feat = ref_feat.astype(dt)
        warped_feats = warped_feats.astype(dt)
        ref_depth32 = ref_depth.astype(jnp.float32)
        warped_depths32 = warped_depths.astype(jnp.float32)

        # Per-neighbor alignment scores, neighbors folded into batch.
        ddiff = jnp.abs(warped_depths32 - ref_depth32[:, None])      # (B,N,H,W,1)
        score_in = jnp.concatenate(
            [
                jnp.broadcast_to(ref_feat[:, None], (b, n, h, w, f)),
                warped_feats,
                jnp.broadcast_to(ref_depth32[:, None].astype(dt), (b, n, h, w, 1)),
                warped_depths32.astype(dt),
                ddiff.astype(dt),
            ],
            axis=-1,
        ).reshape(b * n, h, w, -1)
        s = ConvLReLU(self.features, slope=self.slope, dtype=dt,
                      use_pallas=self.use_pallas)(score_in)
        s = nn.Conv(1, (3, 3), padding="SAME", dtype=jnp.float32,
                    param_dtype=jnp.float32)(s.astype(jnp.float32))
        scores = s.reshape(b, n, h, w, 1)
        weights = jax.nn.softmax(scores, axis=1)                      # over neighbors

        agg = jnp.sum(weights.astype(jnp.float32)
                      * warped_feats.astype(jnp.float32), axis=1)     # (B,H,W,F)

        fused_in = jnp.concatenate(
            [ref_feat, agg.astype(dt), ref_depth32.astype(dt)], axis=-1
        )
        h1 = ConvLReLU(self.features, slope=self.slope, dtype=dt,
                       use_pallas=self.use_pallas)(fused_in)
        h2 = ConvLReLU(self.features, slope=self.slope, dtype=dt,
                       use_pallas=self.use_pallas)(h1)
        return h2
