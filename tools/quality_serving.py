"""Production-path quality evidence (VERDICT r3 missing #1 / next #1).

The ±0.05 dB clause (BASELINE.json `metric`) is judged on what SERVES:
bf16 compute + Pallas warp/correlation/conv routing on chip. Every quality
number recorded before round 4 ran f32 on CPU through the exact-gather
warp — this tool produces the first serving-vs-oracle comparison:

1. `train` (chip): train the PRODUCTION-WIDTH config (64-ch defaults,
   bf16 compute, Pallas routing — i.e. training itself runs the serving
   stack) on synthetic moving-texture + zooming clips; save the fp32
   param tree.
2. `eval --path serving` (chip): eval held-out clips through the real
   serving stack (bf16, warp_impl="pallas", auto conv routing, Pallas
   correlation).
3. `eval --path f32_pallas` (chip): same kernels, f32 compute — isolates
   dtype from kernel effects if serving deviates.
4. `eval --path oracle` (CPU process, JAX_PLATFORMS=cpu): f32 +
   warp_impl="gather" + XLA correlation/convs — the exact reference
   numerics.

All phases share one artifact (artifacts/QUALITY_serving_r4.json, merged
incrementally) and regenerate the identical clip set from fixed seeds.

Eval resolution 288x512 LR (HR 1152x2048): large enough that the full-res
warp routes to the Pallas kernel (B*H*W > 2^17, ops/warp.py routing) with
level warps on the gather path — the same routing as the 540x960 serving
configuration. The zoom eval clip has a spatially varying flow (nonzero
flow gradient), exercising the warp kernel's tap budgets, which pure
translation never does.
"""

from __future__ import annotations

import argparse
import dataclasses
import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

ARTIFACT = os.path.join(REPO, "artifacts", "QUALITY_serving_r4.json")
# hard-regime (25-32 dB) runs land in the r5 artifact (VERDICT r4 next #3)
ARTIFACT_R5 = os.path.join(REPO, "artifacts", "QUALITY_serving_r5.json")
CKPT_ROOT = "/tmp/vsr_quality_r4"

EVAL_HR_H, EVAL_HR_W = 1152, 2048     # LR 288x512
TRAIN_HR_H, TRAIN_HR_W = 384, 512
FRAMES = 7


def production_cfg(variant: str, steps: int):
    from video_super_resolution_tpu import VSRConfig

    cfg = VSRConfig()
    # NB: every variant pins depth_res_divisor EXPLICITLY so the divisor-2
    # vs divisor-4 A/B that justified the serving default stays reproducible
    # regardless of the dataclass default (ADVICE r4 low #2: after the r4
    # default flip, "espcn_d4" had become identical to "espcn").
    model_kw = {"depth_res_divisor": 2}
    if variant == "two_stage":
        model_kw["sr_head_style"] = "two_stage"
    elif variant == "espcn_mid":
        model_kw["sr_espcn_mid"] = 64
    elif variant == "espcn_d4":
        model_kw["depth_res_divisor"] = 4
    elif variant == "hard":
        # hard-regime run on the SERVING configuration (divisor 4 =
        # serving_config default)
        model_kw["depth_res_divisor"] = 4
    elif variant == "hard_d2":
        pass                      # hard-regime control at divisor 2
    elif variant != "espcn":
        raise ValueError(f"unknown variant {variant}")
    model = dataclasses.replace(cfg.model, **model_kw)
    train = dataclasses.replace(
        cfg.train, steps=steps, warmup_steps=min(500, steps // 10),
        lr=2e-4, lr_schedule="cosine",
    )
    data = dataclasses.replace(cfg.data, crop_size=64, batch_size=4)
    return cfg.replace(model=model, train=train, data=data)


def make_train_clips():
    """8 clips at 384x512 HR: 6 translations (up to ±6 HR px/frame), 2 zooms."""
    import numpy as np

    from video_super_resolution_tpu.data.synthetic import (
        moving_gradient_clip,
        zooming_clip,
    )

    rng = np.random.default_rng(1234)
    clips = {}
    for i in range(6):
        dx = float(rng.uniform(-6, 6))
        dy = float(rng.uniform(-6, 6))
        hr, _ = moving_gradient_clip(FRAMES, TRAIN_HR_H, TRAIN_HR_W, dx, dy,
                                     seed=100 + i)
        clips[f"train_t{i}"] = hr
    clips["train_z0"] = zooming_clip(FRAMES, TRAIN_HR_H, TRAIN_HR_W, 1.015,
                                     seed=200)
    clips["train_z1"] = zooming_clip(FRAMES, TRAIN_HR_H, TRAIN_HR_W, 0.985,
                                     seed=201)
    return clips


def make_train_clips_hard():
    """9 hard-regime clips at 384x512 HR (full-spectrum textures so the
    converged model lives in the 25-32 dB regime — VERDICT r4 next #3):
    3 occlusion/layered, 2 detail translations, 2 shears at flow gradients
    0.33 / 0.71 px/px-per-frame (at and beyond the warp tap budget), 1
    hard zoom, 1 noisy translation."""
    import numpy as np

    from video_super_resolution_tpu.data.synthetic import (
        add_noise,
        detail_clip,
        layered_clip,
        shear_clip,
        zooming_clip,
    )

    # rough=1.1 (fine octaves DOMINATE): the first hard-regime training
    # run used the 0.85 default and the converged model evaluated at ~37 dB
    # — multi-frame fusion recovers ~6 dB of aliased detail over bicubic,
    # so the content must be harder than single-frame reasoning suggests.
    # At 1.1 the eval-resolution bicubic baseline is ~25 dB.
    R = 1.1
    rng = np.random.default_rng(4321)
    clips = {}
    for i in range(3):
        clips[f"htrain_occ{i}"] = layered_clip(
            FRAMES, TRAIN_HR_H, TRAIN_HR_W, seed=500 + i, n_layers=3,
            max_speed=3.0, rough=R)
    for i in range(2):
        dx = float(rng.uniform(-5, 5))
        dy = float(rng.uniform(-5, 5))
        clips[f"htrain_tex{i}"] = detail_clip(
            FRAMES, TRAIN_HR_H, TRAIN_HR_W, dx, dy, seed=510 + i, rough=R)
    clips["htrain_shear0"] = shear_clip(FRAMES, TRAIN_HR_H, TRAIN_HR_W,
                                        amp=2.5, wavelength=48, seed=520,
                                        rough=R)
    clips["htrain_shear1"] = shear_clip(FRAMES, TRAIN_HR_H, TRAIN_HR_W,
                                        amp=3.5, wavelength=31, seed=521,
                                        rough=R)
    clips["htrain_zoom"] = zooming_clip(FRAMES, TRAIN_HR_H, TRAIN_HR_W,
                                        1.02, seed=530, rough=R)
    clips["htrain_noise"] = add_noise(
        detail_clip(FRAMES, TRAIN_HR_H, TRAIN_HR_W, 2.0, 1.0, seed=540,
                    rough=R),
        0.04, seed=541)
    return clips


def make_eval_clips():
    """3 held-out clips at 1152x2048 HR: slow + fast translation, zoom."""
    from video_super_resolution_tpu.data.synthetic import (
        moving_gradient_clip,
        zooming_clip,
    )

    slow, _ = moving_gradient_clip(FRAMES, EVAL_HR_H, EVAL_HR_W, 1.7, -1.1,
                                   seed=300)
    fast, _ = moving_gradient_clip(FRAMES, EVAL_HR_H, EVAL_HR_W, -7.0, 4.5,
                                   seed=301)
    zoom = zooming_clip(FRAMES, EVAL_HR_H, EVAL_HR_W, 1.012, seed=302)
    return {"eval_slow": slow, "eval_fast": fast, "eval_zoom": zoom}


def make_eval_clips_hard():
    """6 held-out hard-regime clips at 1152x2048 HR. Flow-gradient figures
    are px/px per frame step; 0.71 is ~2x the warp kernel's in-tile tap
    budget (the clamping regime)."""
    from video_super_resolution_tpu.data.synthetic import (
        add_noise,
        detail_clip,
        layered_clip,
        shear_clip,
        zooming_clip,
    )

    R = 1.1      # see make_train_clips_hard
    return {
        "heval_tex": detail_clip(FRAMES, EVAL_HR_H, EVAL_HR_W, 1.7, -1.1,
                                 seed=600, rough=R),
        "heval_occ": layered_clip(FRAMES, EVAL_HR_H, EVAL_HR_W, seed=601,
                                  n_layers=3, max_speed=3.0, rough=R),
        "heval_shear033": shear_clip(FRAMES, EVAL_HR_H, EVAL_HR_W, amp=2.5,
                                     wavelength=48, seed=602, rough=R),
        "heval_shear071": shear_clip(FRAMES, EVAL_HR_H, EVAL_HR_W, amp=3.5,
                                     wavelength=31, seed=603, rough=R),
        "heval_noise": add_noise(
            detail_clip(FRAMES, EVAL_HR_H, EVAL_HR_W, 2.0, 1.0, seed=604,
                        rough=R),
            0.04, seed=605),
        "heval_zoom": zooming_clip(FRAMES, EVAL_HR_H, EVAL_HR_W, 1.012,
                                   seed=606, rough=R),
    }


def merge_artifact(update: dict, path: str = ARTIFACT):
    os.makedirs(os.path.dirname(path), exist_ok=True)
    rec = {}
    if os.path.exists(path):
        with open(path) as f:
            rec = json.load(f)
    # one-level-deep merge per variant
    for k, v in update.items():
        if isinstance(v, dict) and isinstance(rec.get(k), dict):
            rec[k].update(v)
        else:
            rec[k] = v
    with open(path, "w") as f:
        json.dump(rec, f, indent=2, sort_keys=True)


def artifact_for(variant: str) -> str:
    return ARTIFACT_R5 if variant.startswith("hard") else ARTIFACT


def ckpt_path(variant: str) -> str:
    return os.path.join(CKPT_ROOT, variant, "params.msgpack")


def cmd_train(args):
    import flax.serialization
    import jax
    import jax.numpy as jnp
    import numpy as np

    from video_super_resolution_tpu.data.dataset import ClipDataset
    from video_super_resolution_tpu.training.state import create_train_state
    from video_super_resolution_tpu.training.step import make_train_step

    cfg = production_cfg(args.variant, args.steps)
    clips = (make_train_clips_hard() if args.variant.startswith("hard")
             else make_train_clips())
    ds = ClipDataset(clips_hr=clips, window=cfg.model.window,
                     scale=cfg.model.scale, crop_size=cfg.data.crop_size,
                     augment=True, seed=0)
    state = create_train_state(cfg)
    step = make_train_step(cfg.train.charbonnier_eps)

    t0 = time.time()
    it = ds.batches(cfg.data.batch_size)
    losses, log = [], []
    metrics = None
    for i in range(args.steps):
        batch = next(it)
        state, metrics = step(state, {
            "lr": jnp.asarray(batch["lr"]), "hr": jnp.asarray(batch["hr"])})
        if (i + 1) % args.log_every == 0:
            # fetching metrics syncs; do it only at log points
            losses.append(float(metrics["loss"]))
            log.append({"step": i + 1, "loss": losses[-1],
                        "psnr_proxy": round(float(metrics["psnr_proxy"]), 3),
                        "s": round(time.time() - t0, 1)})
            print(json.dumps(log[-1]), flush=True)
    train_s = time.time() - t0

    path = ckpt_path(args.variant)
    os.makedirs(os.path.dirname(path), exist_ok=True)
    params = jax.device_get(state.params)
    with open(path, "wb") as f:
        f.write(flax.serialization.to_bytes(params))
    with open(os.path.join(os.path.dirname(path), "config.json"), "w") as f:
        f.write(cfg.to_json())
    merge_artifact({args.variant: {"train": {
        "steps": args.steps,
        "device": str(jax.devices()[0]),
        "compute_dtype": cfg.train.compute_dtype,
        "final_loss": losses[-1] if losses else None,
        "final_psnr_proxy": round(float(metrics["psnr_proxy"]), 3),
        "train_s": round(train_s, 1),
        "steps_per_s": round(args.steps / train_s, 2),
        "loss_curve": log[:: max(1, len(log) // 20)],
    }}}, artifact_for(args.variant))
    print(f"saved {path} ({train_s:.0f}s)", flush=True)


EVAL_PATHS = {
    # (compute_dtype, warp_impl, env overrides)
    "serving": ("bfloat16", "pallas", {}),
    "f32_pallas": ("float32", "pallas", {}),
    "bf16_oracle_ops": ("bfloat16", "gather",
                        {"VSR_CORR_IMPL": "xla", "VSR_CONV_IMPL": "xla"}),
    "oracle": ("float32", "gather",
               {"VSR_CORR_IMPL": "xla", "VSR_CONV_IMPL": "xla"}),
}


def cmd_eval(args):
    dt, warp_impl, env = EVAL_PATHS[args.path]
    for k, v in env.items():
        os.environ[k] = v

    import flax.serialization
    import jax
    import jax.numpy as jnp
    import numpy as np

    from video_super_resolution_tpu import VSRConfig
    from video_super_resolution_tpu.data.dataset import ClipDataset
    from video_super_resolution_tpu.evaluation.evaluate import evaluate_all
    from video_super_resolution_tpu.models.vsr import VSRModel
    from video_super_resolution_tpu.runtime.dtypes import DTypePolicy
    from video_super_resolution_tpu.training.step import make_eval_step

    cdir = os.path.dirname(ckpt_path(args.variant))
    with open(os.path.join(cdir, "config.json")) as f:
        cfg = VSRConfig.from_json(f.read())
    model_cfg = dataclasses.replace(cfg.model, warp_impl=warp_impl)
    policy = DTypePolicy.from_strings(dt, "float32")
    model = VSRModel(cfg=model_cfg, use_pallas=False,
                     dtype=policy.compute_dtype)
    with open(ckpt_path(args.variant), "rb") as f:
        raw = f.read()
    # target tree: init a tiny instance for structure
    import jax.numpy as jnp  # noqa: F811

    tmpl = jax.eval_shape(
        lambda: VSRModel(cfg=model_cfg, dtype=jnp.float32).init(
            jax.random.key(0),
            jnp.zeros((1, cfg.model.window, 32, 32, 3), jnp.float32)),
    )["params"]
    params = flax.serialization.from_bytes(tmpl, raw)
    params = jax.tree.map(jnp.asarray, params)

    clips = (make_eval_clips_hard() if args.variant.startswith("hard")
             else make_eval_clips())
    ds = ClipDataset(clips_hr=clips, window=cfg.model.window,
                     scale=cfg.model.scale, augment=False)
    t0 = time.time()
    res = evaluate_all(make_eval_step(model.apply), params, ds,
                       y_channel=True, border_crop=4,
                       batch_windows=args.batch_windows)
    eval_s = time.time() - t0
    out = {
        "psnr": round(res["__average__"]["psnr"], 4),
        "ssim": round(res["__average__"]["ssim"], 5),
        "per_clip": {k: {"psnr": round(v["psnr"], 4),
                         "ssim": round(v["ssim"], 5)}
                     for k, v in res.items() if k != "__average__"},
        "device": str(jax.devices()[0]),
        "compute_dtype": dt,
        "warp_impl": warp_impl,
        "env": env,
        "eval_s": round(eval_s, 1),
        "lr_shape": [288, 512],
    }
    merge_artifact({args.variant: {f"eval_{args.path}": out}},
                   artifact_for(args.variant))
    print(json.dumps({args.path: out}), flush=True)


def main():
    ap = argparse.ArgumentParser()
    sub = ap.add_subparsers(dest="cmd", required=True)
    tp = sub.add_parser("train")
    tp.add_argument("--variant", default="espcn",
                    choices=("espcn", "two_stage", "espcn_mid", "espcn_d4",
                             "hard", "hard_d2"))
    tp.add_argument("--steps", type=int, default=12000)
    tp.add_argument("--log-every", type=int, default=200)
    tp.set_defaults(fn=cmd_train)
    ep = sub.add_parser("eval")
    ep.add_argument("--variant", default="espcn",
                    choices=("espcn", "two_stage", "espcn_mid", "espcn_d4",
                             "hard", "hard_d2"))
    ep.add_argument("--path", default="serving", choices=tuple(EVAL_PATHS))
    ep.add_argument("--batch-windows", type=int, default=4)
    ep.set_defaults(fn=cmd_eval)
    args = ap.parse_args()

    from video_super_resolution_tpu.runtime.cache import enable_cache

    enable_cache("/tmp/jax_cache_quality")
    args.fn(args)


if __name__ == "__main__":
    main()
