"""Clip evaluation loop: sliding windows -> PSNR/SSIM (SURVEY.md §3.2).

Forward every window through the jit program, metrics host-side on numpy,
per-clip averages — the Vid4/REDS4 protocol with Y-channel + border-crop
conventions from DataConfig.
"""

from __future__ import annotations

from typing import Callable, Dict

import numpy as np

from video_super_resolution_tpu.data.dataset import ClipDataset
from video_super_resolution_tpu.evaluation.metrics import psnr, ssim


def evaluate_clip(
    eval_step: Callable,
    params,
    dataset: ClipDataset,
    clip: str,
    y_channel: bool = True,
    border_crop: int = 4,
) -> Dict[str, float]:
    """Average PSNR/SSIM over all frames of one clip."""
    psnrs, ssims = [], []
    for batch in dataset.eval_windows(clip):
        pred = np.asarray(eval_step(params, batch["lr"]))[0]
        gt = batch["hr"][0]
        psnrs.append(psnr(pred, gt, y_channel, border_crop))
        ssims.append(ssim(pred, gt, y_channel, border_crop))
    return {
        "psnr": float(np.mean(psnrs)),
        "ssim": float(np.mean(ssims)),
        "frames": len(psnrs),
    }


def evaluate_all(
    eval_step: Callable, params, dataset: ClipDataset,
    y_channel: bool = True, border_crop: int = 4,
) -> Dict[str, Dict[str, float]]:
    results = {}
    for clip in dataset.clip_names:
        results[clip] = evaluate_clip(
            eval_step, params, dataset, clip, y_channel, border_crop
        )
    avg_p = float(np.mean([r["psnr"] for r in results.values()]))
    avg_s = float(np.mean([r["ssim"] for r in results.values()]))
    results["__average__"] = {"psnr": avg_p, "ssim": avg_s,
                              "frames": sum(r["frames"] for r in results.values())}
    return results
