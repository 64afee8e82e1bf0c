"""Chip roofline calibration: measured matmul/conv/elementwise rates.

What fraction of peak can THIS device (axon TPU v5e tunnel) actually reach
on the op shapes the model uses? Chained-scan methodology (bench.py).
Informs every kernel-optimization decision: if a plain big matmul tops out
at X TFLOP/s, X is the real ceiling, not the datasheet number.
"""

from __future__ import annotations

import argparse
import functools
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


_PULL_S = None


def _pull():
    """Fixed host-visible result cost (axon tunnel round trip), measured."""
    global _PULL_S
    if _PULL_S is None:
        trivial = jax.jit(lambda x: jnp.sum(x) * 0 + 1.0)
        z = jnp.zeros((8, 128), jnp.float32)
        float(trivial(z))
        t0 = time.time()
        for _ in range(10):
            float(trivial(z))
        _PULL_S = (time.time() - t0) / 10
    return _PULL_S


def timed(name, fn, args, flops, bytes_acc, n=16, reps=3):
    @functools.partial(jax.jit, static_argnames=())
    def chained(*xs):
        def body(c, _):
            out = fn(*[x + c.astype(x.dtype) for x in xs])
            m = jnp.mean(out).astype(jnp.float32)
            return m * 1e-20, m
        _, means = jax.lax.scan(body, jnp.float32(0), None, length=n)
        return jnp.sum(means)

    t0 = time.time()
    s = float(chained(*args))
    compile_s = time.time() - t0
    assert np.isfinite(s), name
    float(chained(*args))
    t0 = time.time()
    for _ in range(reps):
        float(chained(*args))
    per_s = ((time.time() - t0) / reps - _pull()) / n
    print(json.dumps({
        "op": name, "ms": round(per_s * 1e3, 3),
        "tflops": round(flops / per_s / 1e12, 1),
        "gbps": round(bytes_acc / per_s / 1e9, 1),
        "compile_s": round(compile_s, 1),
    }), flush=True)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args()
    if args.cpu and jax.config.jax_platforms != "cpu":
        jax.config.update("jax_platforms", "cpu")
    rng = np.random.default_rng(0)

    def mk(shape, dt=jnp.bfloat16):
        return jnp.asarray(rng.standard_normal(shape) * 0.1, dt)

    # --- MXU: square matmuls ---
    for m in (4096, 8192):
        a, bm = mk((m, m)), mk((m, m))
        timed(f"matmul_{m}_bf16", lambda x, y: jnp.dot(x, y), (a, bm),
              2 * m**3, 3 * m * m * 2, n=4)
    # conv-like matmul: (HW, 9*Cin) x (9*Cin, Cout)
    hw, cin, cout = 544 * 960, 64, 64
    a, bm = mk((hw, 9 * cin)), mk((9 * cin, cout))
    timed("matmul_im2col_522240x576x64", lambda x, y: jnp.dot(x, y), (a, bm),
          2 * hw * 9 * cin * cout, (hw * 9 * cin + hw * cout) * 2, n=8)

    # --- convs at model shapes (bf16, NHWC) ---
    def conv(x, k):
        return jax.lax.conv_general_dilated(
            x, k, (1, 1), ((1, 1), (1, 1)),
            dimension_numbers=("NHWC", "HWIO", "NHWC"))

    shapes = [
        (1, 544, 960, 64, 64),     # fusion/sr trunk conv
        (2, 544, 960, 131, 64),    # fusion score conv
        (1, 540, 960, 64, 64),     # unaligned spatial
        (2, 136, 240, 243, 128),   # flow estimator dense conv
        (3, 272, 480, 192, 64),    # depth decoder conv
        (3, 272, 480, 3, 64),      # first conv (tiny Cin)
    ]
    for (b, h, w, ci, co) in shapes:
        x, k = mk((b, h, w, ci)), mk((3, 3, ci, co))
        fl = 2 * 9 * ci * co * b * h * w
        by = (b * h * w * (ci + co) + 9 * ci * co) * 2
        timed(f"conv3x3_{b}x{h}x{w}x{ci}-{co}", conv, (x, k), fl, by, n=8)

    # --- HBM bandwidth: elementwise ---
    x = mk((64 * 1024 * 1024,), jnp.float32)  # 256 MB
    timed("axpy_256MB_f32", lambda v: v * 1.5 + 2.0, (x,),
          2 * x.size, x.size * 8, n=8)
    # transpose relayout cost
    t = mk((2, 544, 960, 64))
    timed("transpose_BHWC-BCHW", lambda v: v.transpose(0, 3, 1, 2), (t,),
          0, t.size * 4, n=8)
    print(json.dumps({"device": str(jax.devices()[0])}))


if __name__ == "__main__":
    main()
