"""Isolate what makes the bench program's FIRST EXECUTION slow on the axon
platform (diag_cache.py: COMPILE 1.2 s on cache hit, first run > 566 s).

Variants (--what):
  warp   : just the Pallas shift-select warp at the bench shape (2,544,960,4)
  warpt  : the XLA tiled warp, same shape
  model1 : full model forward, NO scan (one call), warp_impl from --warp
  scan   : full model under lax.scan length --n
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

T0 = time.time()


def mark(msg):
    print(f"[{time.time() - T0:7.1f}s] {msg}", flush=True)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--what", default="warp")
    ap.add_argument("--warp", default="pallas")
    ap.add_argument("--n", type=int, default=16)
    ap.add_argument("--h", type=int, default=540)
    ap.add_argument("--w", type=int, default=960)
    ap.add_argument("--cache", default="/tmp/jax_cache_bench")
    args = ap.parse_args()

    from video_super_resolution_tpu.runtime.cache import enable_cache

    enable_cache(args.cache)
    import functools

    import jax
    import jax.numpy as jnp
    import numpy as np

    mark(f"devices: {jax.devices()}")
    rng = np.random.default_rng(0)

    if args.what in ("warp", "warpt"):
        img = jnp.asarray(rng.random((2, 544, 960, 4)), jnp.float32)
        flow = jnp.asarray(rng.standard_normal((2, 544, 960, 2)) * 2,
                           jnp.float32)
        if args.what == "warp":
            from video_super_resolution_tpu.ops.pallas.warp_shift_tpu import (
                warp_shift_pallas,
            )
            fn = jax.jit(lambda i, f: warp_shift_pallas(i, f))
        else:
            from video_super_resolution_tpu.ops.warp_tiled import warp_tiled
            fn = jax.jit(lambda i, f: warp_tiled(i, f, rd=12))
        t0 = time.time()
        lo = fn.lower(img, flow)
        mark(f"LOWER {time.time()-t0:.1f}s")
        t0 = time.time()
        co = lo.compile()
        mark(f"COMPILE {time.time()-t0:.1f}s")
        t0 = time.time()
        out = co(img, flow)
        out.block_until_ready()
        mark(f"RUN1 {time.time()-t0:.2f}s sum={float(jnp.sum(out)):.3f}")
        t0 = time.time()
        for _ in range(5):
            co(img, flow)[0, 0, 0, 0].block_until_ready()
        mark(f"RUN2-6 {(time.time()-t0)/5*1e3:.1f}ms avg")
        return

    from video_super_resolution_tpu import VSRConfig
    from video_super_resolution_tpu.training.state import create_train_state
    import dataclasses

    cfg = VSRConfig()
    cfg = cfg.replace(model=dataclasses.replace(cfg.model,
                                                warp_impl=args.warp))
    t0 = time.time()
    state = create_train_state(cfg)
    jax.block_until_ready(state.params)
    mark(f"create_train_state {time.time()-t0:.1f}s")
    window = jnp.asarray(
        rng.random((1, cfg.model.window, args.h, args.w, 3)), jnp.float32)
    apply_fn = state.apply_fn

    if args.what == "model1":
        fn = jax.jit(lambda p, w: jnp.mean(apply_fn({"params": p}, w)))

        def call(c):
            return c(state.params, window)
    else:
        @functools.partial(jax.jit, static_argnames=("n",))
        def fn(params, w0, n):
            def body(w, _):
                hr = apply_fn({"params": params}, w)
                dep = jnp.mean(hr).astype(jnp.float32) * jnp.float32(1e-12)
                return w + dep, jnp.mean(hr)
            w, means = jax.lax.scan(body, w0, None, length=n)
            return jnp.sum(means)

        def call(c):
            return c(state.params, window)

    t0 = time.time()
    lo = (fn.lower(state.params, window) if args.what == "model1"
          else fn.lower(state.params, window, args.n))
    mark(f"LOWER {time.time()-t0:.1f}s")
    t0 = time.time()
    co = lo.compile()
    mark(f"COMPILE {time.time()-t0:.1f}s")
    t0 = time.time()
    out = call(co)
    jax.block_until_ready(out)
    mark(f"RUN1 {time.time()-t0:.2f}s val={float(out):.4f}")
    t0 = time.time()
    for _ in range(3):
        jax.block_until_ready(call(co))
    mark(f"RUN2-4 {(time.time()-t0)/3*1e3:.1f}ms avg")


if __name__ == "__main__":
    main()
