"""Full-stack torch-CPU oracles: flow net (correlation + grid_sample
inside), depth-guided fusion, ESPCN SR head, and the COMPOSED VSRModel
(SURVEY.md §4.2 "module numerics"; VERDICT r1 item 4).

Each torch mirror re-implements the topology independently (unfold-style
cost volume, grid_sample warp, F.interpolate resizes); weights transfer via
training.import_torch.import_by_order, so these tests pin composition
order, conv/padding conventions, resize/warp semantics, and the weight
importer at once. Small widths keep runtimes down and module counts
single-digit (flax sorted-path order is lexicographic, so >=10 same-named
modules would interleave).
"""

import jax
import jax.numpy as jnp
import numpy as np
import torch
import torch.nn as nn
import torch.nn.functional as F

from video_super_resolution_tpu.config import ModelConfig
from video_super_resolution_tpu.models.flow_net import FlowNet
from video_super_resolution_tpu.models.fusion import DepthGuidedFusion
from video_super_resolution_tpu.models.sr_head import SRHead
from video_super_resolution_tpu.models.vsr import VSRModel
from video_super_resolution_tpu.training.import_torch import import_by_order

LR = 0.1  # lrelu slope everywhere


def lrelu(x):
    return F.leaky_relu(x, LR)


def t_corr(f1, f2, d):
    """PWC cost volume, zeros OOB, 1/C normalized, row-major (dy, dx)."""
    b, c, h, w = f1.shape
    f2p = F.pad(f2, (d, d, d, d))
    outs = []
    for dy in range(-d, d + 1):
        for dx in range(-d, d + 1):
            win = f2p[:, :, d + dy : d + dy + h, d + dx : d + dx + w]
            outs.append((f1 * win).sum(1) / c)
    return torch.stack(outs, 1)


def t_warp(img, flow):
    """Backward warp, zeros padding, align_corners=True pixel convention."""
    b, c, h, w = img.shape
    ys, xs = torch.meshgrid(torch.arange(h, dtype=torch.float32),
                            torch.arange(w, dtype=torch.float32),
                            indexing="ij")
    gx = (xs[None] + flow[:, 0]) * 2 / max(w - 1, 1) - 1
    gy = (ys[None] + flow[:, 1]) * 2 / max(h - 1, 1) - 1
    return F.grid_sample(img, torch.stack([gx, gy], -1), mode="bilinear",
                         padding_mode="zeros", align_corners=True)


def t_up(x, size_or_scale):
    if isinstance(size_or_scale, tuple):
        return F.interpolate(x, size=size_or_scale, mode="bilinear",
                             align_corners=False)
    return F.interpolate(x, scale_factor=size_or_scale, mode="bilinear",
                         align_corners=False)


class TPyramid(nn.Module):
    def __init__(self, channels, cin=3):
        super().__init__()
        convs = []
        for c in channels:
            convs += [nn.Conv2d(cin, c, 3, stride=2, padding=1),
                      nn.Conv2d(c, c, 3, padding=1)]
            cin = c
        self.convs = nn.ModuleList(convs)

    def forward(self, x):
        feats = []
        h = x
        for i in range(0, len(self.convs), 2):
            h = lrelu(self.convs[i](h))
            h = lrelu(self.convs[i + 1](h))
            feats.append(h)
        return feats


class TEstimator(nn.Module):
    def __init__(self, cin, channels):
        super().__init__()
        convs = []
        for c in channels:
            convs.append(nn.Conv2d(cin, c, 3, padding=1))
            cin += c
        self.convs = nn.ModuleList(convs)
        self.flow = nn.Conv2d(cin, 2, 3, padding=1)

    def forward(self, x):
        feats = x
        for conv in self.convs:
            feats = torch.cat([feats, lrelu(conv(feats))], 1)
        return feats, self.flow(feats)


class TContext(nn.Module):
    def __init__(self, cin, channels, dilations):
        super().__init__()
        convs = []
        for c, d in zip(channels, dilations):
            convs.append(nn.Conv2d(cin, c, 3, padding=d, dilation=d))
            cin = c
        self.convs = nn.ModuleList(convs)
        self.flow = nn.Conv2d(cin, 2, 3, padding=1)

    def forward(self, feat, flow):
        h = torch.cat([feat, flow], 1)
        for conv in self.convs:
            h = lrelu(conv(h))
        return self.flow(h)


class TFlowNet(nn.Module):
    def __init__(self, pyr_ch, est_ch, ctx_ch, ctx_dil, d, finest=1):
        super().__init__()
        self.d, self.finest = d, finest
        self.pyr = TPyramid(pyr_ch)
        k = (2 * d + 1) ** 2
        ests = {}
        for l in range(finest, len(pyr_ch)):
            cin = k + pyr_ch[l] + 2
            ests[str(l)] = TEstimator(cin, est_ch)
        self.ests = nn.ModuleDict(ests)
        cin_ctx = k + pyr_ch[finest] + 2 + sum(est_ch)
        self.ctx = TContext(cin_ctx + 2, ctx_ch, ctx_dil)

    def forward(self, ref, nbr):
        pr, pn = self.pyr(ref), self.pyr(nbr)
        flow, feat = None, None
        for l in reversed(range(self.finest, len(pr))):
            fr, fn = pr[l], pn[l]
            if flow is None:
                flow_up = torch.zeros(fr.shape[0], 2, *fr.shape[-2:])
                warped = fn
            else:
                flow_up = 2.0 * t_up(flow, tuple(fr.shape[-2:]))
                warped = t_warp(fn, flow_up)
            cv = lrelu(t_corr(fr, warped, self.d))
            feat, res = self.ests[str(l)](torch.cat([cv, fr, flow_up], 1))
            flow = flow_up + res
        flow = flow + self.ctx(feat, flow)
        scale = float(2 ** (self.finest + 1))
        return scale * t_up(flow, tuple(s * 2 ** (self.finest + 1)
                                        for s in flow.shape[-2:]))


PYR = (8, 16, 32)
EST = (16, 12)
CTX = (16, 12)
DIL = (1, 2)


def _flow_pairs(tm):
    """(weight, bias) pairs in flax sorted-path order:
    ContextNetwork_0 < FeaturePyramid_0 < estimator_l1 < estimator_l2."""
    pairs = [(c.weight, c.bias) for c in tm.ctx.convs]
    pairs += [(tm.ctx.flow.weight, tm.ctx.flow.bias)]
    pairs += [(c.weight, c.bias) for c in tm.pyr.convs]
    for l in sorted(tm.ests):
        est = tm.ests[l]
        pairs += [(c.weight, c.bias) for c in est.convs]
        pairs += [(est.flow.weight, est.flow.bias)]
    return pairs


def test_flow_net_matches_torch(rng):
    tm = TFlowNet(PYR, EST, CTX, DIL, d=2, finest=1)
    fm = FlowNet(pyramid_channels=PYR, estimator_channels=EST,
                 context_channels=CTX, max_displacement=2,
                 finest_level=1, warp_impl="gather")
    # context dilations are positional in the flax module: override to match
    fm = FlowNet(pyramid_channels=PYR, estimator_channels=EST,
                 context_channels=CTX, max_displacement=2,
                 finest_level=1, warp_impl="gather")
    x = rng.random((2, 32, 48, 3)).astype(np.float32)
    y = rng.random((2, 32, 48, 3)).astype(np.float32)
    variables = fm.init(jax.random.key(0), jnp.asarray(x), jnp.asarray(y))
    params = import_by_order(_flow_pairs(tm), variables["params"])
    got = np.asarray(fm.apply({"params": params}, jnp.asarray(x),
                              jnp.asarray(y)))
    with torch.no_grad():
        want = tm(torch.from_numpy(x).permute(0, 3, 1, 2),
                  torch.from_numpy(y).permute(0, 3, 1, 2))
    want = want.permute(0, 2, 3, 1).numpy()
    np.testing.assert_allclose(got, want, rtol=2e-3, atol=2e-4)


class TFusion(nn.Module):
    def __init__(self, f):
        super().__init__()
        self.f = f
        self.score = nn.Conv2d(2 * f + 3, f, 3, padding=1)
        self.score1 = nn.Conv2d(f, 1, 3, padding=1)
        self.fuse1 = nn.Conv2d(2 * f + 1, f, 3, padding=1)
        self.fuse2 = nn.Conv2d(f, f, 3, padding=1)

    def forward(self, ref_feat, warped_feats, ref_depth, warped_depths):
        b, n = warped_feats.shape[:2]
        scores = []
        for i in range(n):
            ddiff = (warped_depths[:, i] - ref_depth).abs()
            s_in = torch.cat([ref_feat, ref_depth, warped_feats[:, i],
                              warped_depths[:, i], ddiff], 1)
            scores.append(self.score1(lrelu(self.score(s_in))))
        scores = torch.stack(scores, 1)                    # (B,N,1,H,W)
        wts = torch.softmax(scores, dim=1)
        agg = (wts * warped_feats).sum(1)
        h = lrelu(self.fuse1(torch.cat([ref_feat, agg, ref_depth], 1)))
        return lrelu(self.fuse2(h))


def _fusion_pairs(tm):
    """flax order: ConvLReLU_0 (fuse1) < ConvLReLU_1 (fuse2) < Score1_0
    (score->1) < ScoreConv_0."""
    return [(tm.fuse1.weight, tm.fuse1.bias),
            (tm.fuse2.weight, tm.fuse2.bias),
            (tm.score1.weight, tm.score1.bias),
            (tm.score.weight, tm.score.bias)]


def test_fusion_matches_torch(rng):
    f = 16
    tm = TFusion(f)
    fm = DepthGuidedFusion(features=f)
    b, n, h, w = 2, 2, 12, 16
    ref_feat = rng.random((b, h, w, f)).astype(np.float32)
    warped = rng.random((b, n, h, w, f)).astype(np.float32)
    ref_d = rng.random((b, h, w, 1)).astype(np.float32)
    warp_d = rng.random((b, n, h, w, 1)).astype(np.float32)
    variables = fm.init(jax.random.key(0), *map(jnp.asarray,
                        (ref_feat, warped, ref_d, warp_d)))
    params = import_by_order(_fusion_pairs(tm), variables["params"])
    got = np.asarray(fm.apply({"params": params}, *map(jnp.asarray,
                              (ref_feat, warped, ref_d, warp_d))))
    with torch.no_grad():
        want = tm(torch.from_numpy(ref_feat).permute(0, 3, 1, 2),
                  torch.from_numpy(warped).permute(0, 1, 4, 2, 3),
                  torch.from_numpy(ref_d).permute(0, 3, 1, 2),
                  torch.from_numpy(warp_d).permute(0, 1, 4, 2, 3))
    want = want.permute(0, 2, 3, 1).numpy()
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


class TSRHead(nn.Module):
    """espcn style: trunk at LR + subpixel conv + pixel_shuffle + bilinear
    skip (skip added pre-shuffle in flax == post-shuffle here: they commute)."""

    def __init__(self, f, blocks, scale, cin):
        super().__init__()
        self.scale = scale
        self.first = nn.Conv2d(cin, f, 3, padding=1)
        self.res = nn.ModuleList(
            [nn.ModuleList([nn.Conv2d(f, f, 3, padding=1),
                            nn.Conv2d(f, f, 3, padding=1)])
             for _ in range(blocks)])
        self.trunk_end = nn.Conv2d(f, f, 3, padding=1)
        self.subpixel = nn.Conv2d(f, 3 * scale ** 2, 3, padding=1)

    def forward(self, fused, ref):
        h = lrelu(self.first(fused))
        trunk_in = h
        for c1, c2 in self.res:
            h = h + c2(lrelu(c1(h)))
        h = self.trunk_end(h) + trunk_in
        out = F.pixel_shuffle(self.subpixel(h), self.scale)
        return out + t_up(ref, float(self.scale))


def _sr_pairs(tm):
    """flax order: ConvLReLU_0 (first) < Conv_0 (trunk end) < ResBlock_i
    {ConvLReLU_0, Conv_0} < subpixel_conv."""
    pairs = [(tm.first.weight, tm.first.bias),
             (tm.trunk_end.weight, tm.trunk_end.bias)]
    for c1, c2 in tm.res:
        pairs += [(c1.weight, c1.bias), (c2.weight, c2.bias)]
    pairs += [(tm.subpixel.weight, tm.subpixel.bias)]
    return pairs


def test_sr_head_matches_torch(rng):
    f, blocks, scale, cin = 16, 3, 4, 16
    tm = TSRHead(f, blocks, scale, cin)
    fm = SRHead(features=f, blocks=blocks, scale=scale, style="espcn",
                wide_blocks=False)
    fused = rng.random((1, 12, 16, cin)).astype(np.float32)
    ref = rng.random((1, 12, 16, 3)).astype(np.float32)
    variables = fm.init(jax.random.key(0), jnp.asarray(fused),
                        jnp.asarray(ref))
    params = import_by_order(_sr_pairs(tm), variables["params"])
    got = np.asarray(fm.apply({"params": params}, jnp.asarray(fused),
                              jnp.asarray(ref)))
    with torch.no_grad():
        want = tm(torch.from_numpy(fused).permute(0, 3, 1, 2),
                  torch.from_numpy(ref).permute(0, 3, 1, 2))
    want = want.permute(0, 2, 3, 1).numpy()
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


# ---------------------------------------------------------------------------
# composed model
# ---------------------------------------------------------------------------

class TDepth(nn.Module):
    def __init__(self, c, levels):
        super().__init__()
        self.levels = levels
        self.stem = nn.Conv2d(3, c, 3, padding=1)
        enc, cin = [], c
        for l in range(levels):
            cl = min(c * 2 ** (l + 1), 4 * c)
            enc += [nn.Conv2d(cin, cl, 3, stride=2, padding=1),
                    nn.Conv2d(cl, cl, 3, padding=1)]
            cin = cl
        self.enc = nn.ModuleList(enc)
        skips = [c] + [min(c * 2 ** (l + 1), 4 * c) for l in range(levels - 1)]
        dec, cur = [], cin
        for l in reversed(range(levels)):
            dec.append(nn.Conv2d(cur + skips[l], skips[l], 3, padding=1))
            cur = skips[l]
        self.dec = nn.ModuleList(dec)
        self.head = nn.Conv2d(cur, 1, 3, padding=1)

    def forward(self, x):
        # mirror DepthNet's axon-miscompile guard: replicate-pad W so the
        # deepest level is a multiple of 4, crop after
        w_in = x.shape[-1]
        w_mult = 4 * 2 ** self.levels
        if w_in % w_mult:
            x = F.pad(x, (0, (-w_in) % w_mult, 0, 0), mode="replicate")
        h = lrelu(self.stem(x))
        skips = []
        for l in range(self.levels):
            skips.append(h)
            h = lrelu(self.enc[2 * l](h))
            h = lrelu(self.enc[2 * l + 1](h))
        for i, l in enumerate(reversed(range(self.levels))):
            h = t_up(h, tuple(skips[l].shape[-2:]))
            h = lrelu(self.dec[i](torch.cat([h, skips[l]], 1)))
        return F.softplus(self.head(h))[..., :, :w_in]


class TVSR(nn.Module):
    """Mirror of models/vsr.py with warp_features=False, espcn head,
    depth_at_half_res=True."""

    def __init__(self, cfg: ModelConfig):
        super().__init__()
        self.cfg = cfg
        self.flow = TFlowNet(cfg.pyramid_channels,
                             cfg.flow_estimator_channels,
                             cfg.context_channels,
                             (1, 2, 4, 8, 16, 1)[: len(cfg.context_channels)],
                             cfg.max_displacement, cfg.flow_finest_level)
        self.depth = TDepth(cfg.depth_channels, cfg.depth_levels)
        self.enc0 = nn.Conv2d(3, cfg.fusion_channels, 3, padding=1)
        self.enc1 = nn.Conv2d(cfg.fusion_channels, cfg.fusion_channels, 3,
                              padding=1)
        self.fusion = TFusion(cfg.fusion_channels)
        self.sr = TSRHead(cfg.sr_channels, cfg.sr_blocks, cfg.scale,
                          cfg.fusion_channels)

    def encode(self, x):
        return lrelu(self.enc1(lrelu(self.enc0(x))))

    def forward(self, window):
        cfg = self.cfg
        b, t, c, h0, w0 = window.shape
        center = t // 2
        mult = 2 ** max(len(cfg.pyramid_channels), cfg.depth_levels)
        ph, pw = (-h0) % mult, (-w0) % mult
        x = F.pad(window.reshape(b * t, c, h0, w0), (0, pw, 0, ph),
                  mode="replicate").reshape(b, t, c, h0 + ph, w0 + pw)
        h, w = h0 + ph, w0 + pw
        ref = x[:, center]
        nbrs = [x[:, i] for i in range(t) if i != center]

        flows = [self.flow(ref, nb) for nb in nbrs]
        # depth at half res for all frames
        depths = []
        for i in range(t):
            d = self.depth(t_up(x[:, i], (h // 2, w // 2)))
            depths.append(t_up(d, (h, w)))
        ref_depth = depths[center]
        nbr_depths = [depths[i] for i in range(t) if i != center]

        warped = [t_warp(torch.cat([nb, nd], 1), fl)
                  for nb, nd, fl in zip(nbrs, nbr_depths, flows)]
        warped_frames = [wp[:, :3] for wp in warped]
        warped_depths = torch.stack([wp[:, 3:] for wp in warped], 1)

        ref_feat = self.encode(ref)
        warped_feats = torch.stack([self.encode(wf) for wf in warped_frames], 1)
        fused = self.fusion(ref_feat, warped_feats, ref_depth, warped_depths)
        fused = fused[:, :, :h0, :w0]
        return self.sr(fused, ref[:, :, :h0, :w0])


def _vsr_pairs(tm):
    """flax top-level sorted order: depth_net < flow_net < frame_encoder_0 <
    frame_encoder_1 < fusion < sr_head."""
    dm = tm.depth
    pairs = ([(dm.stem.weight, dm.stem.bias)]
             + [(c.weight, c.bias) for c in dm.enc]
             + [(c.weight, c.bias) for c in dm.dec]
             + [(dm.head.weight, dm.head.bias)])
    pairs += _flow_pairs(tm.flow)
    pairs += [(tm.enc0.weight, tm.enc0.bias), (tm.enc1.weight, tm.enc1.bias)]
    pairs += _fusion_pairs(tm.fusion)
    pairs += _sr_pairs(tm.sr)
    return pairs


def small_cfg():
    return ModelConfig(
        window=3, pyramid_levels=3, pyramid_channels=PYR,
        max_displacement=2, flow_finest_level=1,
        flow_estimator_channels=EST, context_channels=CTX,
        depth_channels=8, depth_levels=2, fusion_channels=16,
        sr_channels=16, sr_blocks=3, sr_wide_blocks=False,
        warp_impl="gather",
    )


def test_composed_vsr_matches_torch(rng):
    cfg = small_cfg()
    tm = TVSR(cfg)
    fm = VSRModel(cfg=cfg, dtype=jnp.float32)
    x = rng.random((1, 3, 36, 52, 3)).astype(np.float32)  # odd -> padding
    variables = fm.init(jax.random.key(0), jnp.asarray(x))
    params = import_by_order(_vsr_pairs(tm), variables["params"])
    got = np.asarray(fm.apply({"params": params}, jnp.asarray(x)))
    with torch.no_grad():
        want = tm(torch.from_numpy(x).permute(0, 1, 4, 2, 3))
    want = want.permute(0, 2, 3, 1).numpy()
    assert got.shape == want.shape
    np.testing.assert_allclose(got, want, rtol=2e-3, atol=5e-4)
