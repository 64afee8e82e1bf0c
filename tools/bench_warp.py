"""Micro-bench: warp implementations on the real chip at model shapes.

Chained-scan methodology (same as bench.py): N dependent iterations inside
one program, single scalar pulled at the end.
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


def bench_one(fn, img, flow, n=32, reps=3):
    @functools.partial(jax.jit, static_argnames=("n",))
    def chained(im, fl, n):
        def body(carry, _):
            im, fl = carry
            out = fn(im, fl)
            dep = jnp.mean(out).astype(im.dtype) * 1e-20
            # thread the dep through BOTH inputs: a loop-invariant flow lets
            # XLA hoist the implementation's flow-derived prep (per-tile
            # bases etc.) out of the scan and under-report per-call cost
            return (im + dep, fl + dep.astype(fl.dtype)), jnp.mean(out)
        (_, _), means = jax.lax.scan(body, (im, fl), None, length=n)
        return jnp.sum(means)

    t0 = time.time()
    s = float(chained(img, flow, n))
    compile_s = time.time() - t0
    assert np.isfinite(s), "non-finite output"
    float(chained(img, flow, n))
    t0 = time.time()
    for _ in range(reps):
        float(chained(img, flow, n))
    per = ((time.time() - t0) / reps - _pull()) / n * 1e3
    return per, compile_s


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--impls", default="tiled,pallas")
    ap.add_argument("--shapes", default="2,544,960,4;2,136,240,32")
    ap.add_argument("--n", type=int, default=32)
    ap.add_argument("--check", action="store_true",
                    help="compare each impl's COMPILED output against the "
                         "exact gather (catches Mosaic miscompiles that "
                         "interpret-mode tests cannot)")
    ap.add_argument("--flow-scale", type=float, default=6.0,
                    help="std of the coarse flow grid (6.0 ~ 0.13 px/px "
                         "gradients; 1.5 ~ smooth serving content; 0 = "
                         "pure subpixel translation)")
    args = ap.parse_args()
    if args.cpu and jax.config.jax_platforms != "cpu":
        jax.config.update("jax_platforms", "cpu")

    from video_super_resolution_tpu.ops.warp import backward_warp

    rng = np.random.default_rng(0)
    for shp in args.shapes.split(";"):
        b, h, w, c = map(int, shp.split(","))
        # f32 frames + smooth flow: the model's hot call is the f32
        # frame+depth warp with a 1/4-res-upsampled (smooth) flow field.
        img = jnp.asarray(rng.random((b, h, w, c)), jnp.float32)
        coarse = jnp.asarray(
            rng.standard_normal((b, 9, 15, 2)) * args.flow_scale
            + rng.standard_normal((b, 1, 1, 2)) * 3.0,      # global shift
            jnp.float32)
        flow = jax.image.resize(coarse, (b, h, w, 2), "linear")
        hbm_ms = (b * h * w * (c * 2 * 2 + 2 * 4)) / 819e9 * 1e3  # v5e ~819GB/s
        want = (np.asarray(backward_warp(img, flow, impl="gather"))
                if args.check else None)
        for impl in args.impls.split(","):
            fn = functools.partial(backward_warp, impl=impl)
            rec = {"impl": impl, "shape": [b, h, w, c]}
            if args.check:
                got = np.asarray(fn(img, flow))
                rec["max_abs_diff_vs_gather"] = round(
                    float(np.max(np.abs(got - want))), 8)
            per, cs = bench_one(fn, img, flow, n=args.n)
            rec.update({
                "ms": round(per, 3), "hbm_bound_ms": round(hbm_ms, 3),
                "compile_s": round(cs, 1),
                "device": str(jax.devices()[0]),
            })
            print(json.dumps(rec), flush=True)


if __name__ == "__main__":
    main()
