"""Diagnose persistent-cache behavior + compile-time breakdown of the bench
program (VERDICT r2 weak #4: 297 s compile with a warm 1.6 GB cache).

Prints timestamped stage lines; run with unbuffered output and NO grep
filtering (cache-miss explanations log at WARNING level).
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

T0 = time.time()


def mark(msg):
    print(f"[{time.time() - T0:7.1f}s] {msg}", flush=True)


from video_super_resolution_tpu.runtime.cache import enable_cache

enable_cache("/tmp/jax_cache_bench")

import jax

jax.config.update("jax_explain_cache_misses", True)

import functools

import jax.numpy as jnp
import numpy as np

from video_super_resolution_tpu import VSRConfig
from video_super_resolution_tpu.training.state import create_train_state

H, W = (int(sys.argv[1]), int(sys.argv[2])) if len(sys.argv) > 2 else (540, 960)

mark("imports done")
mark(f"devices: {jax.devices()}")

cfg = VSRConfig()
t0 = time.time()
state = create_train_state(cfg)
jax.block_until_ready(state.params)
mark(f"create_train_state: {time.time() - t0:.1f}s")

rng = np.random.default_rng(0)
window = jnp.asarray(rng.random((1, cfg.model.window, H, W, 3)), jnp.float32)
model_apply = state.apply_fn


@functools.partial(jax.jit, static_argnames=("n",))
def chained(params, w0, n):
    def body(w, _):
        hr = model_apply({"params": params}, w)
        dep = jnp.mean(hr).astype(jnp.float32) * jnp.float32(1e-12)
        return w + dep, jnp.mean(hr)
    w, means = jax.lax.scan(body, w0, None, length=n)
    return jnp.sum(means)


t0 = time.time()
lowered = chained.lower(state.params, window, 16)
mark(f"LOWER: {time.time() - t0:.1f}s")

t0 = time.time()
compiled = lowered.compile()
mark(f"COMPILE: {time.time() - t0:.1f}s")

t0 = time.time()
out = compiled(state.params, window)
out.block_until_ready()
mark(f"RUN1: {time.time() - t0:.2f}s  value={float(out):.4f}")
