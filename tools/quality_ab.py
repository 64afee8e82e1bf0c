"""Trained-quality A/B of the TPU-motivated model deviations (VERDICT r2 #5).

The parity clause (BASELINE.md, ±0.05 dB) will eventually be judged on a
converged model; this tool de-risks the four deviations the TPU build made
from the torch-reference-era layout by training small configs to
convergence on synthetic clips and comparing eval PSNR:

  - warp_features=False   (warp 4ch frame+depth, encode after) vs True
  - sr_head_style=espcn   (all-LR convs + one shuffle) vs two_stage
  - depth_at_half_res=True vs False
  - flow_finest_level=1   (PWC convention, 1/4 res) vs 0 (1/2 res)

Protocol: identical data (8 synthetic moving-texture clips, 2 held out),
identical steps/optimizer/seed; f32 on CPU so numerics are not a
confounder. Results -> QUALITY.md (run with --write-md).
"""

from __future__ import annotations

import argparse
import dataclasses
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_PLATFORMS", "cpu")

import jax
import jax.numpy as jnp
import numpy as np


def small_cfg(**model_overrides):
    from video_super_resolution_tpu import VSRConfig

    cfg = VSRConfig()
    model = dataclasses.replace(
        cfg.model,
        pyramid_levels=3, pyramid_channels=(8, 16, 32),
        flow_estimator_channels=(24, 16), context_channels=(24, 16),
        max_displacement=3, depth_channels=12, depth_levels=2,
        fusion_channels=24, sr_channels=24, sr_blocks=2,
        sr_wide_blocks=True, warp_impl="gather",
        **model_overrides,
    )
    train = dataclasses.replace(
        cfg.train, compute_dtype="float32", lr=4e-4, warmup_steps=50,
        steps=1000, grad_clip=1.0,
    )
    data = dataclasses.replace(cfg.data, crop_size=24, batch_size=4)
    return cfg.replace(model=model, train=train, data=data)


def make_data(seed=0, n_clips=8, frames=7, hr=96, wr=128):
    from video_super_resolution_tpu.data.synthetic import moving_gradient_clip

    rng = np.random.default_rng(seed)
    clips = {}
    for i in range(n_clips):
        dx = float(rng.uniform(-3, 3))
        dy = float(rng.uniform(-3, 3))
        hr_clip, _ = moving_gradient_clip(frames, hr, wr, dx, dy, seed=i)
        clips[f"clip{i}"] = hr_clip
    return clips


def run_variant(name, cfg, clips, steps, log_every=200):
    from video_super_resolution_tpu.data.dataset import ClipDataset
    from video_super_resolution_tpu.evaluation.evaluate import evaluate_all
    from video_super_resolution_tpu.training.state import create_train_state
    from video_super_resolution_tpu.training.step import (
        make_eval_step,
        make_train_step,
    )

    train_clips = {k: v for k, v in clips.items()
                   if k not in ("clip6", "clip7")}
    eval_clips = {k: v for k, v in clips.items() if k in ("clip6", "clip7")}
    ds = ClipDataset(clips_hr=train_clips, window=cfg.model.window,
                     scale=cfg.model.scale, crop_size=cfg.data.crop_size,
                     augment=True, seed=0)
    ds_eval = ClipDataset(clips_hr=eval_clips, window=cfg.model.window,
                          scale=cfg.model.scale, augment=False)

    state = create_train_state(cfg)
    step = make_train_step(cfg.train.charbonnier_eps)
    t0 = time.time()
    it = ds.batches(cfg.data.batch_size)
    losses = []
    for i in range(steps):
        batch = next(it)
        state, metrics = step(state, {
            "lr": jnp.asarray(batch["lr"]), "hr": jnp.asarray(batch["hr"])})
        losses.append(float(metrics["loss"]))
        if (i + 1) % log_every == 0:
            print(json.dumps({
                "variant": name, "step": i + 1,
                "loss": round(float(np.mean(losses[-50:])), 5),
                "s": round(time.time() - t0),
            }), flush=True)
    res = evaluate_all(make_eval_step(state.apply_fn), state.params, ds_eval,
                       y_channel=True, border_crop=4)
    out = {
        "variant": name,
        "psnr": round(res["__average__"]["psnr"], 3),
        "ssim": round(res["__average__"]["ssim"], 4),
        "final_loss": round(float(np.mean(losses[-50:])), 5),
        "train_s": round(time.time() - t0),
    }
    print(json.dumps(out), flush=True)
    return out


VARIANTS = {
    "tpu_defaults": {},
    "espcn_mid4x": {"sr_espcn_mid": 96},      # 4x sr_channels at toy scale
    "espcn_mid2x": {"sr_espcn_mid": 48},
    "warp_features": {"warp_features": True},
    "two_stage_head": {"sr_head_style": "two_stage"},
    "depth_full_res": {"depth_at_half_res": False},
    "flow_finest_l0": {"flow_finest_level": 0},
}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=1000)
    ap.add_argument("--variants", default=",".join(VARIANTS))
    ap.add_argument("--out", default="artifacts/QUALITY_ab.jsonl")
    args = ap.parse_args()

    clips = make_data()
    results = []
    for name in args.variants.split(","):
        cfg = small_cfg(**VARIANTS[name])
        results.append(run_variant(name, cfg, clips, args.steps))
    os.makedirs(os.path.dirname(args.out), exist_ok=True)
    with open(args.out, "w") as f:
        for r in results:
            f.write(json.dumps(r) + "\n")
    base = next(r for r in results if r["variant"] == "tpu_defaults")
    for r in results:
        r["dpsnr_vs_tpu_defaults"] = round(r["psnr"] - base["psnr"], 3)
        print(json.dumps(r))


if __name__ == "__main__":
    main()
