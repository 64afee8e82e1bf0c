"""Localize executable bloat by compiling stop_stage prefixes of the model
(no execution; exe size ~ axon first-run load time)."""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from video_super_resolution_tpu.runtime.cache import enable_cache

enable_cache("/tmp/jax_cache_bench")

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from video_super_resolution_tpu import VSRConfig
from video_super_resolution_tpu.training.state import create_train_state

cfg = VSRConfig()
cfg = cfg.replace(model=dataclasses.replace(cfg.model, warp_impl="tiled"))
state = create_train_state(cfg)
rng = np.random.default_rng(0)
window = jnp.asarray(rng.random((1, 3, 540, 960, 3)), jnp.float32)
apply_fn = state.apply_fn

stages = sys.argv[1:] or ["flow", "depth", "warp", "encode", "fusion",
                          "sr_trunk", "sr_conv", "sr_skip", ""]
for st in stages:
    st = "" if st == "full" else st
    fn = jax.jit(lambda p, wd, s=st: jnp.mean(
        apply_fn({"params": p}, wd, stop_stage=s).astype(jnp.float32)))
    t0 = time.time()
    co = fn.lower(state.params, window).compile()
    dt = time.time() - t0
    try:
        n = len(co.runtime_executable().serialize()) / 1e6
    except Exception as e:
        n = -1
    print(f"{st or 'full'}: exe={n:.1f}MB compile={dt:.1f}s", flush=True)
