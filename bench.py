"""Headline benchmark: frames/s/chip for 540p->4K x4 VSR inference.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": "frames/s/chip", "vs_baseline": N}

The BASELINE metric is "frames/s/chip at 720p→4K x4" (BASELINE.md); x4 from
960x540 LR yields exactly 3840x2160 (4K), so the bench input is 960x540
(the "720p-class to 4K" configuration that is self-consistent with x4).
The reference publishes no numbers (BASELINE.json.published == {}), so
vs_baseline is measured against this repo's own recorded first measurement
(bench_baseline.json) — ratio > 1.0 means faster than round-1.

Runs on whatever jax.devices()[0] is (the real TPU chip under the driver;
CPU with --cpu). Uses bf16 compute, fp32 params, window=3, batch=1 windows
streamed sequentially — the serving configuration.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

BASELINE_FILE = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                             "bench_baseline.json")


def bench_train(args, cfg, state):
    """Device-side training-step throughput (input pipeline excluded):
    chain N full steps (fwd+bwd+optimizer) with a data dependence through
    the params inside one program."""
    import functools
    import time

    import jax
    import jax.numpy as jnp
    import numpy as np

    from video_super_resolution_tpu.ops.losses import charbonnier_loss

    b, crop = 4, 64
    rng = np.random.default_rng(0)
    batch = {
        "lr": jnp.asarray(rng.random((b, cfg.model.window, crop, crop, 3)),
                          jnp.float32),
        "hr": jnp.asarray(rng.random((b, 4 * crop, 4 * crop, 3)), jnp.float32),
    }

    def loss_fn(params):
        pred = state.apply_fn({"params": params}, batch["lr"])
        return charbonnier_loss(pred, batch["hr"], cfg.train.charbonnier_eps)

    @functools.partial(jax.jit, static_argnames=("n",))
    def chained(params, opt_state, n):
        def body(carry, _):
            p, o = carry
            loss, grads = jax.value_and_grad(loss_fn)(p)
            updates, o = state.tx.update(grads, o, p)
            import optax

            p = optax.apply_updates(p, updates)
            return (p, o), loss
        (p, o), losses = jax.lax.scan(body, (params, opt_state), None, length=n)
        return jnp.sum(losses)

    n = max(4, args.frames // 2)
    t0 = time.time()
    s = float(chained(state.params, state.opt_state, n))
    compile_s = time.time() - t0
    assert np.isfinite(s)
    # Measure the fixed host-visible-result round trip (axon tunnel) and
    # subtract it — same methodology as the inference path, no magic numbers.
    trivial = jax.jit(lambda x: jnp.sum(x) * 0 + 1.0)
    z = jnp.zeros((8, 128), jnp.float32)
    float(trivial(z))
    t0 = time.time()
    for _ in range(5):
        float(trivial(z))
    pull_s = (time.time() - t0) / 5
    reps = 2
    t0 = time.time()
    for _ in range(reps):
        float(chained(state.params, state.opt_state, n))
    elapsed = (time.time() - t0) / reps - pull_s
    sps = n / max(elapsed, 1e-9)
    metric = f"train_steps_per_sec_b{b}_crop{crop}"
    baseline = None
    if os.path.exists(BASELINE_FILE):
        try:
            baseline = json.load(open(BASELINE_FILE)).get(metric)
        except Exception:
            pass
    if args.record_baseline:
        rec = {}
        if os.path.exists(BASELINE_FILE):
            try:
                rec = json.load(open(BASELINE_FILE))
            except Exception:
                rec = {}
        rec[metric] = sps
        json.dump(rec, open(BASELINE_FILE, "w"), indent=2)
    print(json.dumps({
        "metric": metric,
        "value": round(sps, 4),
        "unit": "steps/s",
        "vs_baseline": round(sps / baseline, 4) if baseline else 1.0,
        "frames_per_s": round(sps * b, 2),
        "compile_s": round(compile_s, 1),
    }))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--cpu", action="store_true", help="force CPU backend")
    ap.add_argument("--h", type=int, default=540)
    ap.add_argument("--w", type=int, default=960)
    ap.add_argument("--frames", type=int, default=16, help="timed windows")
    ap.add_argument("--warmup", type=int, default=2)
    ap.add_argument("--quick", action="store_true",
                    help="180x320 shape for smoke runs")
    ap.add_argument("--pallas", action="store_true",
                    help="use Pallas kernels for correlation/warp")
    ap.add_argument("--train", action="store_true",
                    help="benchmark the training step (batch 4, crop 64) "
                         "instead of inference")
    ap.add_argument("--window", type=int, default=None,
                    help="temporal window override (e.g. 5 for config #3)")
    ap.add_argument("--batch", type=int, default=1, help="batch size")
    ap.add_argument("--record-baseline", action="store_true",
                    help="store this run as the vs_baseline reference")
    args = ap.parse_args()
    if args.quick:
        args.h, args.w = 180, 320

    from video_super_resolution_tpu.runtime.cache import enable_cache

    enable_cache(os.environ.get("VSR_BENCH_CACHE", "/tmp/jax_cache_bench"))
    import jax

    if args.cpu and jax.config.jax_platforms != "cpu":
        jax.config.update("jax_platforms", "cpu")

    import jax.numpy as jnp
    import numpy as np

    from video_super_resolution_tpu.config import serving_config
    from video_super_resolution_tpu.training.state import create_train_state
    from video_super_resolution_tpu.training.step import make_eval_step

    # serving_config: dataclass defaults + the quality-gated serving knobs
    # (quarter-res depth); the bench measures what serves.
    cfg = serving_config().replace(use_pallas=args.pallas)
    if args.window:
        import dataclasses

        cfg = cfg.replace(model=dataclasses.replace(cfg.model,
                                                    window=args.window))
    state = create_train_state(cfg)
    eval_step = make_eval_step(state.apply_fn)

    if args.train:
        return bench_train(args, cfg, state)

    import functools

    import jax.numpy as jnp  # noqa: F811

    rng = np.random.default_rng(0)
    window = jnp.asarray(
        rng.random((args.batch, cfg.model.window, args.h, args.w, 3)),
        jnp.float32,
    )

    # Device-honest timing: the axon tunnel's block_until_ready does not
    # serialize queued work, so host-side per-call timing under-reports.
    # Instead run N model invocations inside ONE program with a scalar data
    # dependence chaining iteration i -> i+1 (forces sequential execution
    # on-device), and transfer a single scalar at the end. total/N is the
    # per-frame latency, immune to tunnel/dispatch semantics.
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
    s = float(chained(state.params, window, args.frames))
    compile_s = time.time() - t0
    assert np.isfinite(s)
    for _ in range(args.warmup):
        float(chained(state.params, window, args.frames))

    # The axon tunnel charges a fixed ~25ms round trip on every host-visible
    # result; measure it and subtract so fps reflects device time.
    trivial = jax.jit(lambda x: jnp.sum(x) * 0 + 1.0)
    float(trivial(window))
    t0 = time.time()
    for _ in range(5):
        float(trivial(window))
    pull_s = (time.time() - t0) / 5

    reps = 3
    t0 = time.time()
    for _ in range(reps):
        s = float(chained(state.params, window, args.frames))
    elapsed = (time.time() - t0) / reps - pull_s
    fps = args.frames / max(elapsed, 1e-9)

    fps = fps * args.batch
    metric = f"frames_per_sec_per_chip_{args.h}x{args.w}_to_x4"
    if args.batch > 1 or (args.window or 3) != 3:
        metric += f"_b{args.batch}_w{args.window or 3}"
    baseline = None
    if os.path.exists(BASELINE_FILE):
        try:
            rec = json.load(open(BASELINE_FILE))
            baseline = rec.get(metric)
        except Exception:
            pass
    if args.record_baseline:
        rec = {}
        if os.path.exists(BASELINE_FILE):
            try:
                rec = json.load(open(BASELINE_FILE))
            except Exception:
                rec = {}
        rec[metric] = fps
        json.dump(rec, open(BASELINE_FILE, "w"), indent=2)
    vs_baseline = (fps / baseline) if baseline else 1.0

    print(json.dumps({
        "metric": metric,
        "value": round(fps, 4),
        "unit": "frames/s/chip",
        "vs_baseline": round(vs_baseline, 4),
        "compile_s": round(compile_s, 1),
        "device": str(jax.devices()[0]),
        "out_shape": [args.batch, args.h * 4, args.w * 4, 3],
    }))


if __name__ == "__main__":
    main()
