"""Bisect why the Pallas warp costs ~5 ms standalone but ~29 ms in-context.

Each variant is one chained-scan program on the chip; the warp operands are
either carried constants or computed per-iteration by progressively more of
the real model. Tunnel-pull subtracted.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from video_super_resolution_tpu.runtime.cache import enable_cache
enable_cache("/tmp/jax_cache_bench")
import jax
import jax.numpy as jnp
import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=8)
    ap.add_argument("--variants", default="carried,flow,depth,flowdepth")
    args = ap.parse_args()

    from video_super_resolution_tpu import VSRConfig
    from video_super_resolution_tpu.models.depth_net import DepthNet
    from video_super_resolution_tpu.models.flow_net import FlowNet
    from video_super_resolution_tpu.ops.warp import backward_warp
    from video_super_resolution_tpu.runtime.dtypes import DTypePolicy
    from video_super_resolution_tpu.training.state import create_train_state

    cfg = VSRConfig()
    mc = cfg.model
    dt = DTypePolicy.from_strings(cfg.train.compute_dtype,
                                  cfg.train.param_dtype).compute_dtype
    state = create_train_state(cfg)
    p = state.params
    flow_mod = FlowNet(mc.pyramid_channels, mc.flow_estimator_channels,
                       mc.context_channels, mc.max_displacement,
                       mc.lrelu_slope, False, dt, warp_impl="tiled")
    depth_mod = DepthNet(mc.depth_channels, mc.depth_levels, mc.lrelu_slope,
                         False, dtype=dt)

    rng = np.random.default_rng(0)
    h, w = 544, 960
    ref = jnp.asarray(rng.random((2, h, w, 3)), jnp.float32)
    nbr = jnp.asarray(rng.random((2, h, w, 3)), jnp.float32)
    fd0 = jnp.asarray(rng.random((2, h, w, 4)), jnp.float32)
    coarse = jnp.asarray(rng.standard_normal((2, 9, 15, 2)) * 6, jnp.float32)
    flows0 = jax.image.resize(coarse, (2, h, w, 2), "linear")

    trivial = jax.jit(lambda x: jnp.sum(x) * 0 + 1.0)
    z = jnp.zeros((8, 128), jnp.float32)
    float(trivial(z))
    t0 = time.time()
    for _ in range(10):
        float(trivial(z))
    pull_s = (time.time() - t0) / 10

    def warp(fd, fl):
        return backward_warp(fd, fl, impl="pallas")

    def body_carried(c):
        return warp(fd0 + c, flows0 + c)

    def body_flow(c):
        fl = flow_mod.apply({"params": p["flow_net"]}, ref + c, nbr + c)
        return warp(fd0 + c, fl)

    def body_depth(c):
        d = depth_mod.apply({"params": p["depth_net"]},
                            (ref + c)[:, ::2, ::2])
        d = jax.image.resize(d, (2, h, w, 1), "linear")
        fd = jnp.concatenate([nbr + c, d.astype(jnp.float32)], -1)
        return warp(fd, flows0 + c)

    def body_flowdepth(c):
        fl = flow_mod.apply({"params": p["flow_net"]}, ref + c, nbr + c)
        d = depth_mod.apply({"params": p["depth_net"]},
                            (ref + c)[:, ::2, ::2])
        d = jax.image.resize(d, (2, h, w, 1), "linear")
        fd = jnp.concatenate([nbr + c, d.astype(jnp.float32)], -1)
        return warp(fd, fl)

    def body_flowbar(c):
        fl = flow_mod.apply({"params": p["flow_net"]}, ref + c, nbr + c)
        fl = jax.lax.optimization_barrier(fl)
        return warp(jax.lax.optimization_barrier(fd0 + c), fl)

    def body_flownowarp(c):
        fl = flow_mod.apply({"params": p["flow_net"]}, ref + c, nbr + c)
        return fl

    flow_gather = FlowNet(mc.pyramid_channels, mc.flow_estimator_channels,
                          mc.context_channels, mc.max_displacement,
                          mc.lrelu_slope, False, dt, warp_impl="gather")
    flow_ident = FlowNet(mc.pyramid_channels, mc.flow_estimator_channels,
                         mc.context_channels, mc.max_displacement,
                         mc.lrelu_slope, False, dt, warp_impl="identity")

    def body_flowgather(c):
        fl = flow_gather.apply({"params": p["flow_net"]}, ref + c, nbr + c)
        return warp(fd0 + c, fl)

    def body_flowident(c):
        fl = flow_ident.apply({"params": p["flow_net"]}, ref + c, nbr + c)
        return warp(fd0 + c, fl)

    def body_flowident_nowarp(c):
        return flow_ident.apply({"params": p["flow_net"]}, ref + c, nbr + c)

    bodies = {"carried": body_carried, "flow": body_flow,
              "depth": body_depth, "flowdepth": body_flowdepth,
              "flowbar": body_flowbar, "flownowarp": body_flownowarp,
              "flowgather": body_flowgather, "flowident": body_flowident,
              "flowident_nowarp": body_flowident_nowarp}

    for name in args.variants.split(","):
        fn = bodies[name]

        @jax.jit
        def chained(_c0):
            def body(c, _):
                out = fn(c)
                m = jnp.mean(out).astype(jnp.float32)
                return m * 1e-20, m
            _, means = jax.lax.scan(body, _c0, None, length=args.n)
            return jnp.sum(means)

        t0 = time.time()
        s = float(chained(jnp.float32(0)))
        cs = time.time() - t0
        assert np.isfinite(s), name
        float(chained(jnp.float32(0)))
        reps = 3
        t0 = time.time()
        for _ in range(reps):
            float(chained(jnp.float32(0)))
        per = ((time.time() - t0) / reps - pull_s) / args.n * 1e3
        print(json.dumps({"variant": name, "ms": round(per, 2),
                          "compile_s": round(cs, 1)}), flush=True)


if __name__ == "__main__":
    main()
