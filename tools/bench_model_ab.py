"""In-process interleaved A/B of full-model variants on the chip.

Cross-process comparisons through the axon tunnel drift +-20% (the same
prefix program measured 36.7-50.7 ms across four round-3 processes), which
is far larger than most routing deltas. This tool compiles every variant
in ONE process and interleaves timed reps (A,B,C,A,B,C,...) so slow drift
cancels; use it for all conv/warp routing decisions.

Variants: label=conv_impl/warp_impl, e.g. xla/pallas, auto/pallas.
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
    ap.add_argument("--batch", type=int, default=1)
    ap.add_argument("--window", type=int, default=0,
                    help="temporal window override (0 = config default)")
    ap.add_argument("--n", type=int, default=8, help="scan length per chain")
    ap.add_argument("--reps", type=int, default=6, help="interleaved rounds")
    ap.add_argument("--variants", default="xla/pallas,auto/pallas",
                    help="comma list of conv_impl/warp_impl")
    ap.add_argument("--stages", default="",
                    help="instead of impl variants, interleave stop_stage "
                         "prefixes of ONE config (comma list; 'full'='')")
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args()
    if args.cpu and jax.config.jax_platforms != "cpu":
        jax.config.update("jax_platforms", "cpu")

    import dataclasses

    from video_super_resolution_tpu.config import serving_config
    from video_super_resolution_tpu.training.state import create_train_state

    rng = np.random.default_rng(0)
    base = serving_config()
    if args.window:
        base = base.replace(
            model=dataclasses.replace(base.model, window=args.window))
    window = jnp.asarray(
        rng.random((args.batch, base.model.window, args.h, args.w, 3)),
        jnp.float32)

    trivial = jax.jit(lambda x: jnp.sum(x) * 0 + 1.0)
    z = jnp.zeros((8, 128), jnp.float32)
    float(trivial(z))
    t0 = time.time()
    for _ in range(10):
        float(trivial(z))
    pull_s = (time.time() - t0) / 10
    print(json.dumps({"pull_ms": round(pull_s * 1e3, 1)}), flush=True)

    if args.stages:
        items = [("stage:" + (s or "full"), "" if s == "full" else s, None)
                 for s in args.stages.split(",")]
    else:
        items = [(v, None, v) for v in args.variants.split(",")]

    progs = []
    state = None
    for label, stage, v in items:
        if v is not None:
            parts = v.split("/")
            conv_impl, warp_impl = parts[0], parts[1]
            os.environ["VSR_CONV_IMPL"] = conv_impl
            # optional extra tokens toggle env knobs for this variant's
            # trace (env is read at trace time): "kcat", "noppack",
            # "tr128xla" (route the 64->128 trunk conv to XLA)
            os.environ["VSR_CONV_KCAT"] = (
                "1" if "kcat" in parts[2:] else "0")
            os.environ["VSR_CONV_PPACK"] = (
                "0" if "noppack" in parts[2:] else "1")
            os.environ["VSR_CONV_64_128"] = (
                "xla" if "tr128xla" in parts[2:] else "pallas")
            # "vmemN" / "thN" tokens sweep the kernel VMEM budget / strip
            # height for this variant's trace (defaults 6 MB / 8 rows)
            os.environ["VSR_CONV_VMEM_MB"] = next(
                (t[4:] for t in parts[2:] if t.startswith("vmem")), "6")
            os.environ["VSR_CONV_TH"] = next(
                (t[2:] for t in parts[2:] if t.startswith("th")), "8")
            os.environ["VSR_ENC_PACK"] = (
                "1" if "encpack" in parts[2:] else "0")
            os.environ["VSR_CONV_PPKCAT"] = (
                "1" if "ppkcat" in parts[2:] else "0")
            os.environ["VSR_FUSION_PACK"] = (
                "1" if "fusepack" in parts[2:] else "0")
            os.environ["VSR_SCORE_PACK"] = (
                "1" if "scorepack" in parts[2:] else "0")
            os.environ["VSR_EST_CONV"] = (
                "xla" if "estxla" in parts[2:] else "")
            os.environ["VSR_SUBPIX_BF16"] = (
                "1" if "subpixbf16" in parts[2:] else "0")
            os.environ["VSR_THIN_CONV_IM2COL"] = (
                "1" if "im2col" in parts[2:] else "0")
            os.environ["VSR_SKIP_FOLD"] = (
                "0" if "noskipfold" in parts[2:] else "1")
            os.environ["VSR_RESBLOCK_FUSE"] = (
                "1" if "resfuse" in parts[2:] else "0")
            os.environ["VSR_SUBPIX_BF16"] = (
                "0" if "nosubpixbf16" in parts[2:] else
                os.environ["VSR_SUBPIX_BF16"])
            cfg = base.replace(
                model=dataclasses.replace(base.model, warp_impl=warp_impl))
            state = create_train_state(cfg)
        elif state is None:
            state = create_train_state(base)
        apply_fn = state.apply_fn

        @functools.partial(jax.jit, static_argnames=("n",))
        def chained(params, w0, n, apply_fn=apply_fn, stage=stage or ""):
            def body(w, _):
                out = apply_fn({"params": params}, w, stop_stage=stage)
                dep = jnp.mean(out).astype(jnp.float32) * jnp.float32(1e-12)
                return w + dep, jnp.mean(out)
            w, means = jax.lax.scan(body, w0, None, length=n)
            return jnp.sum(means)

        t0 = time.time()
        s = float(chained(state.params, window, args.n))
        cs = time.time() - t0
        if not np.isfinite(s):
            # axon prefix-program miscompiles can NaN a graph cut that is
            # finite inside the full program (and on CPU); timing is still
            # valid — flag it rather than aborting the whole sweep.
            print(json.dumps({"variant": label, "compile_s": round(cs, 1),
                              "nonfinite": True}), flush=True)
        else:
            print(json.dumps({"variant": label, "compile_s": round(cs, 1)}),
                  flush=True)
        float(chained(state.params, window, args.n))      # warm
        progs.append((label, chained, state.params))
    os.environ.pop("VSR_CONV_IMPL", None)

    times = {v: [] for v, _, _ in progs}
    for _ in range(args.reps):
        for v, chained, params in progs:
            t0 = time.time()
            float(chained(params, window, args.n))
            times[v].append(time.time() - t0)
    for v, ts in times.items():
        per = (np.mean(ts) - pull_s) / args.n * 1e3
        std = np.std(ts) / args.n * 1e3
        print(json.dumps({
            "variant": v, "ms_per_frame": round(float(per), 2),
            "std_ms": round(float(std), 2),
            "fps": round(1e3 / per, 2),
        }), flush=True)


if __name__ == "__main__":
    main()
