"""Per-component on-chip timing for the VSR model (SURVEY.md §5.1).

Times each stage of the pipeline as its own chained-scan program on the real
device (same device-honest methodology as bench.py: N iterations inside one
program with a scalar data dependence; one scalar pulled at the end), so the
axon tunnel's dispatch semantics can't distort per-call numbers.

Usage:  python tools/profile_model.py [--h 540 --w 960 --n 8] [--cpu]
"""

from __future__ import annotations

import argparse
import functools
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--h", type=int, default=540)
    ap.add_argument("--w", type=int, default=960)
    ap.add_argument("--n", type=int, default=8, help="iterations per timing")
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--pallas", action="store_true")
    args = ap.parse_args()

    from video_super_resolution_tpu.runtime.cache import enable_cache

    enable_cache("/tmp/jax_cache_bench")
    import jax

    if args.cpu and jax.config.jax_platforms != "cpu":
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    import numpy as np

    from video_super_resolution_tpu import VSRConfig
    from video_super_resolution_tpu.models.common import pad_to_multiple
    from video_super_resolution_tpu.models.depth_net import DepthNet
    from video_super_resolution_tpu.models.flow_net import FlowNet
    from video_super_resolution_tpu.models.fusion import DepthGuidedFusion
    from video_super_resolution_tpu.models.sr_head import SRHead
    from video_super_resolution_tpu.ops.correlation import correlation
    from video_super_resolution_tpu.ops.resize import resize_bilinear
    from video_super_resolution_tpu.ops.warp import backward_warp
    from video_super_resolution_tpu.runtime.dtypes import DTypePolicy
    from video_super_resolution_tpu.training.state import create_train_state

    cfg = VSRConfig().replace(use_pallas=args.pallas)
    mc = cfg.model
    policy = DTypePolicy.from_strings(cfg.train.compute_dtype,
                                      cfg.train.param_dtype)
    dt = policy.compute_dtype
    state = create_train_state(cfg)
    p = state.params

    rng = np.random.default_rng(0)
    window = jnp.asarray(rng.random((1, mc.window, args.h, args.w, 3)),
                         jnp.float32)
    mult = 2 ** max(len(mc.pyramid_channels), mc.depth_levels)
    padded, _ = pad_to_multiple(window, mult)
    _, t, h, w, _ = padded.shape
    n_nbr = t - 1
    hw2 = (h // 2, w // 2)

    ref = padded[:, t // 2]
    ref_rep = jnp.broadcast_to(ref[:, None], (1, n_nbr, h, w, 3)).reshape(
        n_nbr, h, w, 3)
    nbrs = jnp.concatenate([padded[:, : t // 2], padded[:, t // 2 + 1:]],
                           1).reshape(n_nbr, h, w, 3)
    frames = padded.reshape(t, h, w, 3)

    flow_mod = FlowNet(mc.pyramid_channels, mc.flow_estimator_channels,
                       mc.context_channels, mc.max_displacement,
                       mc.lrelu_slope, args.pallas, dt)
    depth_mod = DepthNet(mc.depth_channels, mc.depth_levels, mc.lrelu_slope,
                         args.pallas, dtype=dt)
    fusion_mod = DepthGuidedFusion(mc.fusion_channels, mc.lrelu_slope,
                                   args.pallas, dt)
    sr_mod = SRHead(features=mc.sr_channels, blocks=mc.sr_blocks,
                    scale=mc.scale, slope=mc.lrelu_slope,
                    wide_blocks=mc.sr_wide_blocks, style=mc.sr_head_style,
                    use_pallas=args.pallas, dtype=dt)

    flows = jax.jit(lambda a, b: flow_mod.apply({"params": p["flow_net"]},
                                                a, b))(ref_rep, nbrs)
    f16 = jnp.asarray(rng.random((n_nbr, h // 2, w // 2, 16)), dt)
    fused_feat = jnp.asarray(rng.random((1, h, w, mc.fusion_channels)), dt)
    warped_feats = jnp.asarray(
        rng.random((1, n_nbr, h, w, mc.fusion_channels)), dt)
    depth1 = jnp.asarray(rng.random((1, h, w, 1)), jnp.float32)
    depthn = jnp.asarray(rng.random((1, n_nbr, h, w, 1)), jnp.float32)
    frames4 = jnp.asarray(rng.random((n_nbr, h, w, 4)), jnp.float32)

    # Every host-visible float() costs a fixed tunnel round trip (~25-30 ms
    # on axon). Measure it once and subtract per rep — without this, every
    # stage is overstated by pull/n ms (which buried the real ratios in r1).
    trivial = jax.jit(lambda x: jnp.sum(x) * 0 + 1.0)
    zpull = jnp.zeros((8, 128), jnp.float32)
    float(trivial(zpull))
    t0 = time.time()
    for _ in range(10):
        float(trivial(zpull))
    pull_s = (time.time() - t0) / 10

    def timed(name, fn, *xs):
        """Chain fn n times with a scalar dep; report per-iteration ms."""

        @functools.partial(jax.jit, static_argnames=())
        def chained(*xs):
            def body(c, _):
                out = fn(*[x + c.astype(x.dtype) if x.dtype.kind == "f" else x
                           for x in xs])
                leaf = out[0] if isinstance(out, (tuple, list)) else out
                return jnp.mean(leaf).astype(jnp.float32) * 1e-20, \
                    jnp.mean(leaf).astype(jnp.float32)
            _, means = jax.lax.scan(body, jnp.float32(0), None, length=args.n)
            return jnp.sum(means)

        t0 = time.time()
        s = float(chained(*xs))
        compile_s = time.time() - t0
        assert np.isfinite(s), name
        float(chained(*xs))
        reps = 3
        t0 = time.time()
        for _ in range(reps):
            float(chained(*xs))
        per_ms = ((time.time() - t0) / reps - pull_s) / args.n * 1000
        print(json.dumps({"stage": name, "ms": round(per_ms, 3),
                          "compile_s": round(compile_s, 1)}), flush=True)
        return per_ms

    full = timed("full_model", lambda wdw: state.apply_fn(
        {"params": p}, wdw), window)
    parts = {}
    parts["flow_net"] = timed(
        "flow_net(2 nbrs)",
        lambda a, b: flow_mod.apply({"params": p["flow_net"]}, a, b),
        ref_rep, nbrs)
    if mc.depth_at_half_res:
        parts["depth_net"] = timed(
            "depth_net(T frames, half-res)",
            lambda f: resize_bilinear(
                depth_mod.apply({"params": p["depth_net"]},
                                resize_bilinear(f, *hw2)), h, w),
            frames)
    else:
        parts["depth_net"] = timed(
            "depth_net(T frames)",
            lambda f: depth_mod.apply({"params": p["depth_net"]}, f), frames)
    parts["warp_full(4ch)"] = timed(
        "warp_full(4ch x nbrs)", lambda f, fl: backward_warp(
            f, fl, use_pallas=args.pallas, impl=mc.warp_impl),
        frames4, flows)

    def enc(x):
        from video_super_resolution_tpu.models.common import ConvLReLU

        e = ConvLReLU(mc.fusion_channels, slope=mc.lrelu_slope, dtype=dt,
                      use_pallas=args.pallas, name="frame_encoder_0")
        # bind both encoder convs through the parent param dict
        import flax.linen as nn

        class Enc(nn.Module):
            @nn.compact
            def __call__(self, z):
                z = ConvLReLU(mc.fusion_channels, slope=mc.lrelu_slope,
                              dtype=dt, use_pallas=args.pallas,
                              name="frame_encoder_0")(z)
                return ConvLReLU(mc.fusion_channels, slope=mc.lrelu_slope,
                                 dtype=dt, use_pallas=args.pallas,
                                 name="frame_encoder_1")(z)

        return Enc().apply({"params": {
            "frame_encoder_0": p["frame_encoder_0"],
            "frame_encoder_1": p["frame_encoder_1"]}}, z=x)

    parts["encoder"] = timed("encoder(T frames)", enc, frames)
    parts["fusion"] = timed(
        "fusion", lambda a, b, c, d: fusion_mod.apply(
            {"params": p["fusion"]}, a, b, c, d),
        fused_feat, warped_feats, depth1, depthn)
    parts["sr_head"] = timed(
        "sr_head", lambda f, r: sr_mod.apply({"params": p["sr_head"]}, f, r),
        fused_feat[:, : args.h, : args.w], ref[:, : args.h, : args.w])

    # micro-ops inside flow_net, finest level
    parts_corr = timed(
        "corr_level0(16ch, 1/2res)",
        lambda a, b: correlation(a, b, mc.max_displacement,
                                 use_pallas=args.pallas), f16, f16)
    timed("resize_skip(3ch x4)",
          lambda r: resize_bilinear(r, args.h * 4, args.w * 4),
          ref[:, : args.h, : args.w])

    acc = sum(parts.values())
    print(json.dumps({
        "stage": "SUM(parts)", "ms": round(acc, 3),
        "full_ms": round(full, 3),
        "unaccounted_ms": round(full - acc, 3),
        "corr_in_flow_ms": round(parts_corr, 3),
        "device": str(jax.devices()[0]),
    }))


if __name__ == "__main__":
    main()
