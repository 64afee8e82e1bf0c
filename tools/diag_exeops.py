"""Executable-size probes for individual ops + FlowNet, to find what makes
the model executable 150 MB (axon first-run load ~ exe size)."""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from video_super_resolution_tpu.runtime.cache import enable_cache

enable_cache("/tmp/jax_cache_bench")

import jax
import jax.numpy as jnp
import numpy as np


def exe_mb(fn, *args):
    t0 = time.time()
    co = jax.jit(fn).lower(*args).compile()
    dt = time.time() - t0
    n = len(co.runtime_executable().serialize()) / 1e6
    return n, dt


rng = np.random.default_rng(0)
B, H, W = 2, 136, 240  # flow level-1 shape at 540p


def t(shape):
    return jnp.asarray(rng.random(shape), jnp.float32)


which = set(sys.argv[1:]) or {"conv", "corr", "warp", "est", "flownet",
                              "flownet180"}

if "conv" in which:
    from video_super_resolution_tpu.models.common import ConvLReLU

    m = ConvLReLU(128, dtype=jnp.bfloat16)
    x = t((B, H, W, 128))
    p = m.init(jax.random.key(0), x)
    mb, dt = exe_mb(lambda pp, xx: m.apply(pp, xx), p, x)
    print(f"conv3x3 128->128 @{B}x{H}x{W}: exe={mb:.2f}MB compile={dt:.1f}s",
          flush=True)

if "corr" in which:
    from video_super_resolution_tpu.ops.correlation import _correlation_xla

    f = t((B, H, W, 32))
    mb, dt = exe_mb(lambda a, b: _correlation_xla(a, b, 4), f, f)
    print(f"correlation d=4 @{B}x{H}x{W}x32: exe={mb:.2f}MB compile={dt:.1f}s",
          flush=True)

if "warp" in which:
    from video_super_resolution_tpu.ops.warp_tiled import warp_tiled

    f = t((B, H, W, 32))
    fl = t((B, H, W, 2))
    mb, dt = exe_mb(lambda a, b: warp_tiled(a, b, rd=12), f, fl)
    print(f"warp_tiled rd12 @{B}x{H}x{W}x32: exe={mb:.2f}MB compile={dt:.1f}s",
          flush=True)
    mb, dt = exe_mb(lambda a, b: warp_tiled(a, b, rd=4), f, fl)
    print(f"warp_tiled rd4  @{B}x{H}x{W}x32: exe={mb:.2f}MB compile={dt:.1f}s",
          flush=True)

if "est" in which:
    from video_super_resolution_tpu.models.flow_net import DenseFlowEstimator

    m = DenseFlowEstimator(dtype=jnp.bfloat16)
    x = t((B, H, W, 81 + 32 + 2))
    p = m.init(jax.random.key(0), x)
    mb, dt = exe_mb(lambda pp, xx: m.apply(pp, xx), p, x)
    print(f"estimator @{B}x{H}x{W}x115: exe={mb:.2f}MB compile={dt:.1f}s",
          flush=True)

if "flownet" in which or "flownet180" in which:
    from video_super_resolution_tpu.models.flow_net import FlowNet

    m = FlowNet(dtype=jnp.bfloat16, warp_impl="tiled")
    for name, (h, w) in (("flownet", (544, 960)), ("flownet180", (192, 320))):
        if name not in which:
            continue
        r = t((B, h, w, 3))
        n = t((B, h, w, 3))
        p = m.init(jax.random.key(0), r, n)
        mb, dt = exe_mb(lambda pp, a, b: m.apply(pp, a, b), p, r, n)
        print(f"{name} @{B}x{h}x{w}: exe={mb:.2f}MB compile={dt:.1f}s",
              flush=True)
