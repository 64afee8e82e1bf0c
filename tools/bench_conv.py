"""Micro-bench: Pallas fused conv3x3 vs XLA conv at model shapes, on chip.

Chained-scan methodology with tunnel-pull subtraction (see bench.py).
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


def bench_one(fn, args_, n=16, reps=3):
    @jax.jit
    def chained(*xs):
        def body(c, _):
            # Nonlinear, value-preserving iteration dependence: max(x, c-1e30)
            # == x numerically, but maximum does NOT distribute through the
            # conv. The previous additive form (x + c) let XLA split
            # conv(x+c) = conv(x) + c*ksum and hoist the conv out of the
            # scan — measured "509 TF/s" (chip peak is 197) before this fix.
            xi = jnp.maximum(xs[0], (c - jnp.float32(1e30)).astype(xs[0].dtype))
            out = fn(xi, *xs[1:])
            m = jnp.mean(out).astype(jnp.float32)
            return m * 1e-20, m
        _, means = jax.lax.scan(body, jnp.float32(0), None, length=n)
        return jnp.sum(means)

    t0 = time.time()
    s = float(chained(*args_))
    compile_s = time.time() - t0
    assert np.isfinite(s)
    float(chained(*args_))
    t0 = time.time()
    for _ in range(reps):
        float(chained(*args_))
    per = ((time.time() - t0) / reps - _pull()) / n
    return per, compile_s


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--n", type=int, default=16)
    ap.add_argument("--shapes", default="",
                    help="override shape list: 'b,h,w,ci,co;b,h,w,ci,co;...'")
    ap.add_argument("--impls", default="pallas,xla")
    args = ap.parse_args()
    if args.cpu and jax.config.jax_platforms != "cpu":
        jax.config.update("jax_platforms", "cpu")

    from video_super_resolution_tpu.ops.pallas.fused_conv import (
        _xla_conv, fused_conv3x3)

    rng = np.random.default_rng(0)
    shapes = [
        (1, 544, 960, 64, 64),     # SR trunk / fusion conv
        (2, 544, 960, 131, 64),    # fusion score conv
        (2, 136, 240, 243, 128),   # flow estimator dense conv
        (3, 272, 480, 192, 64),    # depth decoder conv
    ]
    if args.shapes:
        shapes = [tuple(int(v) for v in s.split(","))
                  for s in args.shapes.split(";") if s]
    for (b, h, w, ci, co) in shapes:
        x = jnp.asarray(rng.standard_normal((b, h, w, ci)) * 0.1, jnp.bfloat16)
        k = jnp.asarray(rng.standard_normal((3, 3, ci, co)) * 0.05,
                        jnp.bfloat16)
        bias = jnp.asarray(rng.standard_normal((co,)) * 0.1, jnp.bfloat16)
        fl = 2 * 9 * ci * co * b * h * w
        impls = {
            "pallas": lambda a, kk, bb: fused_conv3x3(a, kk, bb, 0.1, False,
                                                      False),
            "xla": lambda a, kk, bb: _xla_conv(a, kk, bb, 0.1, False),
        }
        for name in args.impls.split(","):
            fn = impls[name]
            try:
                per, cs = bench_one(fn, (x, k, bias), n=args.n)
                print(json.dumps({
                    "impl": name, "shape": [b, h, w, ci, co],
                    "ms": round(per * 1e3, 3),
                    "tflops": round(fl / per / 1e12, 1),
                    "compile_s": round(cs, 1),
                }), flush=True)
            except Exception as e:  # noqa: BLE001
                print(json.dumps({
                    "impl": name, "shape": [b, h, w, ci, co],
                    "error": str(e)[:300],
                }), flush=True)
    print(json.dumps({"device": str(jax.devices()[0])}))


if __name__ == "__main__":
    main()
