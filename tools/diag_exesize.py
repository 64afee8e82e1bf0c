"""Measure serialized-executable size of bench-program variants WITHOUT
executing (first execution ships the exe through the slow axon relay, so
size ~ load time; diag: 147 MB exe -> >566 s first run, tiny exe -> fast).

Variants isolate what bloats the image: scan vs no-scan, warp impl, spatial
size, resize constants.
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from video_super_resolution_tpu.runtime.cache import enable_cache

enable_cache("/tmp/jax_cache_bench")

import dataclasses
import functools

import jax
import jax.numpy as jnp
import numpy as np

from video_super_resolution_tpu import VSRConfig
from video_super_resolution_tpu.training.state import create_train_state


def exe_mb(fn, *args, **lower_kw):
    t0 = time.time()
    co = fn.lower(*args, **lower_kw).compile()
    dt = time.time() - t0
    try:
        n = len(co.runtime_executable().serialize())
    except Exception:
        try:
            n = len(co._executable.xla_executable.serialize())
        except Exception as e:
            return -1.0, dt, str(e)
    return n / 1e6, dt, ""


def build(warp_impl, h, w, scan_n):
    cfg = VSRConfig()
    cfg = cfg.replace(model=dataclasses.replace(cfg.model, warp_impl=warp_impl))
    state = create_train_state(cfg)
    rng = np.random.default_rng(0)
    window = jnp.asarray(rng.random((1, 3, h, w, 3)), jnp.float32)
    apply_fn = state.apply_fn
    if scan_n:
        @functools.partial(jax.jit, static_argnames=("n",))
        def fn(params, w0, n):
            def body(wd, _):
                hr = apply_fn({"params": params}, wd)
                dep = jnp.mean(hr).astype(jnp.float32) * jnp.float32(1e-12)
                return wd + dep, jnp.mean(hr)
            wv, means = jax.lax.scan(body, w0, None, length=n)
            return jnp.sum(means)
        return fn, (state.params, window), {"n": scan_n}
    fn = jax.jit(lambda p, wd: jnp.mean(apply_fn({"params": p}, wd)))
    return fn, (state.params, window), {}


CASES = [
    ("scan16_pallas_540", "pallas", 540, 960, 16),
    ("scan16_tiled_540", "tiled", 540, 960, 16),
    ("one_tiled_540", "tiled", 540, 960, 0),
    ("one_pallas_540", "pallas", 540, 960, 0),
    ("one_tiled_180", "tiled", 180, 320, 0),
]

only = sys.argv[1:] if len(sys.argv) > 1 else None
for name, wi, h, w, n in CASES:
    if only and name not in only:
        continue
    fn, args, kw = build(wi, h, w, n)
    mb, dt, err = exe_mb(fn, *args, **kw)
    print(f"{name}: exe={mb:.1f}MB compile={dt:.1f}s {err}", flush=True)
