"""Full VSR model: flow -> warp -> depth-guided fusion -> SR (SURVEY.md §3.1).

One jit-compiled forward over a temporal window (B, T, H, W, 3) -> the x4
HR center frame (B, 4H, 4W, 3). TPU-first structure:

- All per-neighbor work (flow estimation, warping) folds the neighbor axis
  into the batch axis — one big batched program fills the MXU instead of a
  python loop over neighbors (SURVEY.md §7.2-4).
- All per-frame work (frame encoder, depth net) folds the T axis likewise.
- Inputs are replicate-padded to a multiple of 2^max(pyramid, depth levels)
  once at the top; everything inside is static-shaped.
"""

from __future__ import annotations

from typing import Any, Dict, Union

import flax.linen as nn
import jax
import jax.numpy as jnp

from video_super_resolution_tpu.config import ModelConfig
from video_super_resolution_tpu.models.common import ConvLReLU, crop_to, pad_to_multiple
from video_super_resolution_tpu.models.depth_net import DepthNet
from video_super_resolution_tpu.models.flow_net import FlowNet
from video_super_resolution_tpu.models.fusion import DepthGuidedFusion
from video_super_resolution_tpu.models.sr_head import SRHead
from video_super_resolution_tpu.ops.warp import backward_warp


class VSRModel(nn.Module):
    cfg: ModelConfig = ModelConfig()
    use_pallas: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(
        self,
        window: jax.Array,
        return_aux: bool = False,
        stop_stage: str = "",
    ) -> Union[jax.Array, Dict[str, jax.Array]]:
        """stop_stage: "" (full forward) or one of "flow" | "depth" | "warp"
        | "encode" | "fusion" — return that stage's output instead of HR.
        Profiling hook (tools/profile_prefix.py): timing each prefix of the
        REAL composed program localizes cost that per-module timing misses
        (fusion decisions differ inside the full program)."""
        cfg = self.cfg
        b, t, h0, w0, _ = window.shape
        center = t // 2
        mult = 2 ** max(len(cfg.pyramid_channels), cfg.depth_levels)
        window, (h0, w0) = pad_to_multiple(window, mult)
        _, _, h, w, _ = window.shape
        n = t - 1

        ref = window[:, center]                                        # (B,H,W,3)
        nbr_idx = [i for i in range(t) if i != center]
        nbrs = jnp.stack([window[:, i] for i in nbr_idx], axis=1)      # (B,N,H,W,3)

        # ---- flow: all neighbors in one batched program; ref passed at
        # its true batch so FlowNet builds its pyramid once (not once per
        # neighbor — the dedup path in FlowNet.__call__) ----
        nbrs_flat = nbrs.reshape(b * n, h, w, 3)
        flow_stop = stop_stage if stop_stage.startswith("flow:") else ""
        flows = FlowNet(
            pyramid_channels=cfg.pyramid_channels,
            estimator_channels=cfg.flow_estimator_channels,
            context_channels=cfg.context_channels,
            max_displacement=cfg.max_displacement,
            slope=cfg.lrelu_slope,
            use_pallas=self.use_pallas,
            dtype=self.dtype,
            finest_level=cfg.flow_finest_level,
            warp_impl=cfg.warp_impl,
            name="flow_net",
        )(ref, nbrs_flat, stop_stage=flow_stop)                        # (B*N,H,W,2)
        if stop_stage == "flow" or flow_stop:
            return flows

        # ---- depth for all T frames in one batched program ----
        frames_flat = window.reshape(b * t, h, w, 3)
        depth_net = DepthNet(
            channels=cfg.depth_channels, levels=cfg.depth_levels,
            slope=cfg.lrelu_slope, dtype=self.dtype,
            use_pallas=self.use_pallas, name="depth_net",
        )
        ddiv = cfg.depth_res_divisor or (2 if cfg.depth_at_half_res else 1)
        if ddiv > 1:
            from video_super_resolution_tpu.ops.resize import resize_bilinear

            d_low = depth_net(
                resize_bilinear(frames_flat, h // ddiv, w // ddiv))
            depths = resize_bilinear(d_low, h, w).reshape(b, t, h, w, 1)
        else:
            depths = depth_net(frames_flat).reshape(b, t, h, w, 1)
        ref_depth = depths[:, center]
        nbr_depths = jnp.stack([depths[:, i] for i in nbr_idx], 1)
        if stop_stage == "depth":
            # tiny (unfoldable) term keeps the flow stage live in the prefix
            return ref_depth + jnp.float32(1e-20) * jnp.mean(flows)

        def encode(frames):  # shared frame encoder, any folded batch
            # Packed-encoder experiment (round 5, MEASURED NEGATIVE —
            # gate stays off): encoder conv2 is the chip's worst conv
            # shape (64->64 at full res, 23 TF/s both impls) and packed
            # it standalone runs 4.40 -> 1.90 ms at b=3 — but each
            # pack/unpack relayout costs ~0.7 ms (not the ~0.25 HBM
            # bound) and in-context they do not fuse: full model 63.41
            # vs 62.20 ms/frame (interleaved A/B). The relayouts around
            # an isolated packed pair eat the win; the SR trunk pays them
            # once across 11 packed convs, which is why it stays packed.
            import os

            packed = (cfg.fusion_channels in (64, 128)
                      and frames.shape[2] % 2 == 0
                      and os.environ.get("VSR_ENC_PACK", "0") == "1")
            e = ConvLReLU(cfg.fusion_channels, slope=cfg.lrelu_slope,
                          dtype=self.dtype, use_pallas=self.use_pallas,
                          out_packed=packed,
                          name="frame_encoder_0")(frames)
            if stop_stage == "encode:conv1":
                return e
            e = ConvLReLU(cfg.fusion_channels, slope=cfg.lrelu_slope,
                          dtype=self.dtype, use_pallas=self.use_pallas,
                          in_packed=packed,
                          name="frame_encoder_1")(e)
            return e

        if cfg.warp_features:
            # reference-era layout: encode every frame, warp 64ch features
            feats = encode(frames_flat).reshape(b, t, h, w, cfg.fusion_channels)
            ref_feat = feats[:, center]
            nbr_feats = jnp.stack([feats[:, i] for i in nbr_idx], 1)
            fd = jnp.concatenate(
                [nbr_feats, nbr_depths.astype(nbr_feats.dtype)], axis=-1
            ).reshape(b * n, h, w, cfg.fusion_channels + 1)
            warped = backward_warp(fd, flows, use_pallas=self.use_pallas,
                                   impl=cfg.warp_impl)
            warped = warped.reshape(b, n, h, w, cfg.fusion_channels + 1)
            warped_feats = warped[..., : cfg.fusion_channels]
            warped_depths = warped[..., cfg.fusion_channels:]
        else:
            # TPU layout: warp 4 channels (frame+depth) — the gather is
            # HBM-bound, so 16x less traffic — then encode aligned frames.
            fd = jnp.concatenate(
                [nbrs_flat,
                 jnp.stack([depths[:, i] for i in nbr_idx], 1)
                 .reshape(b * n, h, w, 1).astype(nbrs_flat.dtype)],
                axis=-1,
            )
            if stop_stage == "fd":
                return fd + jnp.float32(1e-20) * jnp.mean(flows)
            warped = backward_warp(fd, flows, use_pallas=self.use_pallas,
                                   impl=cfg.warp_impl)
            if stop_stage == "warp":
                return warped
            warped_frames = warped[..., :3]
            warped_depths = warped[..., 3:].reshape(b, n, h, w, 1)
            enc_in = jnp.concatenate([ref, warped_frames.astype(ref.dtype)], 0)
            enc = encode(enc_in)
            ref_feat = enc[:b]
            warped_feats = enc[b:].reshape(b, n, h, w, cfg.fusion_channels)
        if stop_stage == "encode":
            return ref_feat + jnp.float32(1e-20).astype(ref_feat.dtype) * (
                jnp.mean(warped_feats) + jnp.mean(warped_depths)
            ).astype(ref_feat.dtype)

        import os as _os

        # packed fusion tail -> packed SR-head entry (one less relayout;
        # gated while being A/B-measured on chip)
        from video_super_resolution_tpu.ops.pallas.util import should_interpret

        # default ON on the compiled TPU route (A/B: 62.07 -> 61.38
        # ms/frame with the packed score conv path on top taking it to
        # 58.8); OFF under interpret/CPU so the golden fixtures and CPU
        # tests keep the reference layout (the packed tail is f32-exact
        # but rounds differently in bf16).
        _pack_default = "0" if should_interpret() else "1"
        fusion_packed = (
            cfg.sr_head_style == "espcn"
            and cfg.fusion_channels in (64, 128)
            and cfg.sr_channels == cfg.fusion_channels
            and w % 2 == 0 and w0 % 2 == 0
            and _os.environ.get("VSR_FUSION_PACK", _pack_default) == "1")
        fused = DepthGuidedFusion(
            features=cfg.fusion_channels, slope=cfg.lrelu_slope,
            dtype=self.dtype, use_pallas=self.use_pallas, name="fusion",
            out_packed=fusion_packed,
        )(ref_feat, warped_feats, ref_depth, warped_depths,
          stop_stage=stop_stage if stop_stage.startswith("fusion:") else "")
        if stop_stage == "fusion" or stop_stage.startswith("fusion:"):
            return fused
        fusion_packed = fusion_packed and fused.ndim == 4 and (
            fused.shape[-1] == 2 * cfg.fusion_channels)

        # crop padding off before the SR head so HR output is exactly 4x
        # input (packed layout: the W crop halves)
        if fusion_packed:
            fused = fused[:, :h0, : w0 // 2, :]
        else:
            fused = crop_to(fused, h0, w0)
        ref_c = crop_to(ref, h0, w0)
        hr = SRHead(
            features=cfg.sr_channels, blocks=cfg.sr_blocks, scale=cfg.scale,
            slope=cfg.lrelu_slope, style=cfg.sr_head_style,
            wide_blocks=cfg.sr_wide_blocks, espcn_mid=cfg.sr_espcn_mid,
            dtype=self.dtype, use_pallas=self.use_pallas, name="sr_head",
            in_packed=fusion_packed,
        )(fused, ref_c, stop_stage=stop_stage)

        if return_aux:
            return {
                "hr": hr,
                "flows": flows.reshape(b, n, h, w, 2)[:, :, :h0, :w0],
                "depth": ref_depth[:, :h0, :w0],
            }
        return hr
