"""Dispatch-overhead control + scan amortization (VERDICT r4 next #4).

Round 4 measured host-driven training at 10.4 steps/s vs 49.9 device-side
(ratio 0.208) and ATTRIBUTED the gap to the axon tunnel's per-dispatch
overhead without isolating it. This tool produces the missing controls, all
in one process with the same train step:

1. ``device_side``: N steps chained inside ONE lax.scan program on a
   constant batch — the device-compute bound (bench.py --train method).
2. ``dispatch_only``: a python loop of N single-step dispatches on a
   PRE-STAGED constant device batch (no loader, no host->device transfer),
   one value fetch at the end. If this ceilings at the same ~10 steps/s as
   the full host-driven loop, the input pipeline is exonerated and the gap
   is pure per-dispatch overhead.
3. ``host_driven_k1``: the python loop fed by the REAL native C++ loader
   through the production stream (the r4 measurement, reproduced).
4. ``host_driven_k{K}``: the scan-amortized path — the host stacks K
   loader batches and dispatches ONE make_multi_train_step program per K
   steps (training/step.py). Per-dispatch overhead divides by K.

Writes artifacts/BENCH_dispatch_r5.json.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from video_super_resolution_tpu.runtime.cache import enable_cache  # noqa: E402

enable_cache("/tmp/jax_cache_bench")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--root", default="/tmp/vsr_loader_bench")
    ap.add_argument("--steps", type=int, default=600)
    ap.add_argument("--k", type=int, default=16)
    ap.add_argument("--out", default=os.path.join(
        REPO, "artifacts", "BENCH_dispatch_r5.json"))
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np

    from video_super_resolution_tpu import VSRConfig
    from video_super_resolution_tpu.data.dataset import ClipDataset
    from video_super_resolution_tpu.training.loop import (
        _device_prefetch,
        _make_batch_stream,
    )
    from video_super_resolution_tpu.training.state import create_train_state
    from video_super_resolution_tpu.training.step import (
        make_multi_train_step,
        make_train_step,
    )
    from bench_loader import make_png_clips

    make_png_clips(args.root)
    cfg = VSRConfig()
    b, t, c = cfg.data.batch_size, cfg.model.window, cfg.data.crop_size
    state0 = create_train_state(cfg)
    step_fn = make_train_step(cfg.train.charbonnier_eps, donate=False)
    multi_fn = make_multi_train_step(cfg.train.charbonnier_eps, donate=False)

    rng = np.random.default_rng(0)
    const = {
        "lr": jnp.asarray(rng.random((b, t, c, c, 3)), jnp.float32),
        "hr": jnp.asarray(rng.random((b, 4 * c, 4 * c, 3)), jnp.float32),
    }
    const = jax.tree.map(jax.device_put, const)
    rec = {"batch": b, "crop": c, "steps": args.steps, "k": args.k,
           "device": str(jax.devices()[0])}

    # -- 1. device-side bound: N steps inside one scan program ------------
    import functools

    @functools.partial(jax.jit, static_argnames=("n",))
    def chained(state, batch, n):
        # step_fn is itself jitted; calling it inside jit inlines the
        # traced body (no nested dispatch)
        def body(s, _):
            s2, m = step_fn(s, batch)
            return s2, m["loss"]

        state, losses = jax.lax.scan(body, state, None, length=n)
        return losses[-1]

    t0 = time.time()
    float(chained(state0, const, args.steps))
    rec["compile_device_side_s"] = round(time.time() - t0, 1)
    t0 = time.time()
    float(chained(state0, const, args.steps))
    dev_sps = args.steps / (time.time() - t0)
    rec["device_side_steps_per_s"] = round(dev_sps, 2)
    print(json.dumps({"device_side_steps_per_s": rec["device_side_steps_per_s"]}),
          flush=True)

    # -- 2. dispatch-only control: python loop, pre-staged constant batch -
    state = state0
    for _ in range(20):                       # warm
        state, metrics = step_fn(state, const)
    float(metrics["loss"])
    state = state0
    t0 = time.time()
    for _ in range(args.steps):
        state, metrics = step_fn(state, const)
    float(metrics["loss"])                    # honest end sync
    disp_sps = args.steps / (time.time() - t0)
    rec["dispatch_only_steps_per_s"] = round(disp_sps, 2)
    print(json.dumps({"dispatch_only_steps_per_s": rec["dispatch_only_steps_per_s"]}),
          flush=True)

    # -- 3. host-driven, real loader, 1 step per dispatch -----------------
    ds = ClipDataset(hr_root=args.root, window=t, scale=cfg.model.scale,
                     crop_size=c, augment=True, seed=0)
    raw, close, name = _make_batch_stream(cfg, ds)
    batches = _device_prefetch(raw, None)
    state = state0
    for _ in range(40):                       # warm (fills loader caches)
        state, metrics = step_fn(state, next(batches))
    float(metrics["loss"])
    t0 = time.time()
    for _ in range(args.steps):
        state, metrics = step_fn(state, next(batches))
    float(metrics["loss"])
    k1_sps = args.steps / (time.time() - t0)
    rec["host_driven_k1_steps_per_s"] = round(k1_sps, 2)
    rec["loader"] = name
    print(json.dumps({"host_driven_k1_steps_per_s": rec["host_driven_k1_steps_per_s"]}),
          flush=True)

    # -- 3b. host-driven + COMPACT transfer (uint8 HR / bf16 LR) ----------
    from video_super_resolution_tpu.training.loop import _compact_batches

    batches_c = _device_prefetch(_compact_batches(raw), None)
    state = state0
    for _ in range(20):
        state, metrics = step_fn(state, next(batches_c))
    float(metrics["loss"])
    t0 = time.time()
    for _ in range(args.steps):
        state, metrics = step_fn(state, next(batches_c))
    float(metrics["loss"])
    kc_sps = args.steps / (time.time() - t0)
    rec["host_driven_k1_compact_steps_per_s"] = round(kc_sps, 2)
    print(json.dumps(
        {"host_driven_k1_compact_steps_per_s": rec["host_driven_k1_compact_steps_per_s"]}),
        flush=True)

    # -- 4. host-driven, scan-amortized: K steps per dispatch -------------
    def stack_k(it, k):
        bs = [next(it) for _ in range(k)]
        return {key: np.stack([bb[key] for bb in bs]) for key in bs[0]}

    it = iter(raw)
    state = state0
    stacked = jax.tree.map(jnp.asarray, stack_k(it, args.k))
    state, metrics = multi_fn(state, stacked)            # compile
    float(metrics["loss"])
    n_disp = max(1, args.steps // args.k)
    state = state0
    t0 = time.time()
    for _ in range(n_disp):
        stacked = jax.tree.map(jnp.asarray, stack_k(it, args.k))
        state, metrics = multi_fn(state, stacked)
    float(metrics["loss"])
    kk_sps = n_disp * args.k / (time.time() - t0)
    close()
    rec[f"host_driven_k{args.k}_steps_per_s"] = round(kk_sps, 2)
    rec["ratio_k1_vs_device"] = round(k1_sps / dev_sps, 3)
    rec["ratio_dispatch_only_vs_device"] = round(disp_sps / dev_sps, 3)
    rec["ratio_k1_compact_vs_device"] = round(kc_sps / dev_sps, 3)
    rec[f"ratio_k{args.k}_vs_device"] = round(kk_sps / dev_sps, 3)
    rec["verdict"] = (
        "tunnel-bound: dispatch_only ceilings with host_driven_k1 despite "
        "zero input work" if abs(disp_sps - k1_sps) < 0.35 * max(disp_sps, k1_sps)
        else "transfer-bound: dispatch_only reaches device-side; the gap is "
             "the host->device batch transfer (compact transfer recovers "
             "part of it)")

    os.makedirs(os.path.dirname(args.out), exist_ok=True)
    with open(args.out, "w") as f:
        json.dump(rec, f, indent=2)
    print(json.dumps(rec), flush=True)


if __name__ == "__main__":
    main()
