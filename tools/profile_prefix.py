"""Prefix timing of the REAL composed VSR forward (tools/profile_model.py's
per-module numbers miss glue + in-context fusion differences; this times
progressively longer prefixes of one composed program and reports deltas).

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


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--h", type=int, default=540)
    ap.add_argument("--w", type=int, default=960)
    ap.add_argument("--n", type=int, default=8)
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--stages", default="",
                    help="comma list; empty = all ('full' = '')")
    ap.add_argument("--warp-impl", default="",
                    help="override ModelConfig.warp_impl")
    args = ap.parse_args()
    if args.cpu and jax.config.jax_platforms != "cpu":
        jax.config.update("jax_platforms", "cpu")

    from video_super_resolution_tpu import VSRConfig
    from video_super_resolution_tpu.training.state import create_train_state

    cfg = VSRConfig()
    if args.warp_impl:
        import dataclasses

        cfg = cfg.replace(
            model=dataclasses.replace(cfg.model, warp_impl=args.warp_impl))
    state = create_train_state(cfg)
    rng = np.random.default_rng(0)
    window = jnp.asarray(
        rng.random((1, cfg.model.window, args.h, args.w, 3)), jnp.float32)

    trivial = jax.jit(lambda x: jnp.sum(x) * 0 + 1.0)
    z = jnp.zeros((8, 128), jnp.float32)
    float(trivial(z))
    t0 = time.time()
    for _ in range(10):
        float(trivial(z))
    pull_s = (time.time() - t0) / 10
    print(json.dumps({"pull_ms": round(pull_s * 1e3, 1)}), flush=True)

    def timed(stage):
        @jax.jit
        def chained(params, w0):
            def body(w, _):
                out = state.apply_fn({"params": params}, w, stop_stage=stage)
                dep = jnp.mean(out).astype(jnp.float32) * jnp.float32(1e-20)
                return w + dep, jnp.mean(out)
            w, means = jax.lax.scan(body, w0, None, length=args.n)
            return jnp.sum(means)

        t0 = time.time()
        s = float(chained(state.params, window))
        compile_s = time.time() - t0
        assert np.isfinite(s), stage
        float(chained(state.params, window))
        reps = 3
        t0 = time.time()
        for _ in range(reps):
            float(chained(state.params, window))
        per_ms = ((time.time() - t0) / reps - pull_s) / args.n * 1e3
        return per_ms, compile_s

    stages = (args.stages.split(",") if args.stages else
              ["flow", "depth", "fd", "warp", "encode", "fusion",
               "sr_trunk", "sr_conv", "sr_skip", ""])
    prev = 0.0
    for st in stages:
        ms, cs = timed(st)
        print(json.dumps({
            "prefix": st or "full", "ms": round(ms, 2),
            "delta_ms": round(ms - prev, 2), "compile_s": round(cs, 1),
        }), flush=True)
        prev = ms


if __name__ == "__main__":
    main()
