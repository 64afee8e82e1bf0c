"""Training loop (SURVEY.md §2.2 #10): steps, periodic eval, async ckpt.

The reference family's epoch loop over a torch DataLoader becomes: an
infinite host-side batch stream feeding ONE compiled pjit step; validation
and async Orbax checkpoints on step cadence; metrics to MetricsLogger.
Resume: restore-latest on startup (crash story, SURVEY.md §5.3).
"""

from __future__ import annotations

from typing import Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import NamedSharding, PartitionSpec as P

from video_super_resolution_tpu.config import VSRConfig
from video_super_resolution_tpu.data.dataset import ClipDataset
from video_super_resolution_tpu.evaluation.evaluate import evaluate_all
from video_super_resolution_tpu.runtime.mesh import AXIS_DATA, build_mesh
from video_super_resolution_tpu.training.checkpoint import CheckpointManager
from video_super_resolution_tpu.training.state import create_train_state
from video_super_resolution_tpu.training.step import make_eval_step, make_train_step
from video_super_resolution_tpu.utils.logging import MetricsLogger


def _make_batch_stream(cfg: VSRConfig, train_ds: ClipDataset):
    """Host input stream: the native C++ loader (libpng decode + bicubic
    degrade + pthread prefetch, data/native_loader.py) when the dataset is
    path-backed HR-only and the .so is built; the Python ClipDataset
    otherwise. Returns (iterator, closer, name)."""
    if train_ds._paths_hr is not None and train_ds._paths_lr is None:
        from video_super_resolution_tpu.data import native_loader

        if native_loader.available():
            loader = native_loader.NativeClipLoader(
                train_ds._paths_hr, window=cfg.model.window,
                scale=cfg.model.scale, crop_size=cfg.data.crop_size,
                batch_size=cfg.data.batch_size, augment=cfg.data.augment,
                seed=cfg.train.seed,
            )
            return iter(loader), loader.close, "native"
    return train_ds.batches(cfg.data.batch_size), (lambda: None), "python"


def _compact_batches(batches):
    """Shrink the host->device transfer 3.3x: HR f32 -> uint8 (EXACT for
    the native PNG pipeline — the loader produced f32 as u8/255, and
    round(x*255) inverts it bit-perfectly; the device step divides back),
    LR f32 -> bf16 (the model casts inputs to its bf16 compute dtype
    anyway). Motivation: the r5 dispatch-control experiment
    (BENCH_dispatch_r5.json) showed host-driven training is NOT
    dispatch-bound (dispatch-only = 99% of device-side) but
    TRANSFER-bound (~3.7 MB/step at tunnel bandwidth)."""
    import ml_dtypes
    import numpy as np

    for b in batches:
        yield {
            "lr": np.asarray(b["lr"]).astype(ml_dtypes.bfloat16),
            "hr": np.round(np.asarray(b["hr"]) * 255.0).astype(np.uint8),
        }


def _device_prefetch(batches, sharding, depth: int = 2):
    """Keep `depth` batches in flight on-device ahead of the consumer.

    jax.device_put is async: transferring batch t+1 (and letting the host
    loader produce t+2) overlaps the device's step t. Without this the host
    path serializes decode -> transfer -> step (measured r1: 10.6 steps/s
    host-driven vs 73 device-side)."""
    from collections import deque

    buf = deque()
    for batch in batches:
        if sharding is not None:
            batch = {k: jax.device_put(v, sharding) for k, v in batch.items()}
        else:
            batch = {k: jax.device_put(jnp.asarray(v))
                     for k, v in batch.items()}
        buf.append(batch)
        if len(buf) >= depth:
            yield buf.popleft()
    while buf:
        yield buf.popleft()


def train(
    cfg: VSRConfig,
    train_ds: ClipDataset,
    eval_ds: Optional[ClipDataset] = None,
    max_steps: Optional[int] = None,
    eval_every: Optional[int] = None,
) -> Dict:
    steps = max_steps or cfg.train.steps
    mesh = build_mesh(cfg.mesh) if cfg.mesh.num_devices > 1 else None

    state = create_train_state(cfg)
    mgr = CheckpointManager(cfg.train.ckpt_dir, keep=cfg.train.keep_ckpts)
    restored, at = mgr.restore(state)
    if restored is not None:
        state = restored
    start_step = int(state.step)

    step_fn = make_train_step(cfg.train.charbonnier_eps, mesh=mesh)
    eval_step = make_eval_step(state.apply_fn)
    logger = MetricsLogger(cfg.train.ckpt_dir, "train")

    bsharding = (
        NamedSharding(mesh, P(AXIS_DATA)) if mesh is not None else None
    )
    raw_batches, close_loader, loader_name = _make_batch_stream(cfg, train_ds)
    # compact transfer: exact for the 8-bit-sourced native pipeline and
    # bf16 compute (see _compact_batches); float-clip datasets (synthetic
    # tests) and f32-compute configs keep full-precision transfers
    import os as _os

    if (loader_name == "native" and cfg.train.compute_dtype == "bfloat16"
            and _os.environ.get("VSR_COMPACT_TRANSFER", "1") == "1"):
        raw_batches = _compact_batches(raw_batches)
    batches = _device_prefetch(raw_batches, bsharding)
    logger.log(start_step,
               {"native_loader": 1.0 if loader_name == "native" else 0.0})
    last_eval: Dict = {}
    import time as _time

    t_last = _time.time()
    for step in range(start_step, steps):
        batch = next(batches)
        state, metrics = step_fn(state, batch)

        if (step + 1) % cfg.train.log_every == 0:
            now = _time.time()
            sps = cfg.train.log_every / (now - t_last)
            t_last = now
            fps = sps * cfg.data.batch_size
            logger.log(step + 1, {**{k: float(v) for k, v in metrics.items()},
                                  "steps_per_s": sps, "frames_per_s": fps})
        if (step + 1) % cfg.train.ckpt_every == 0 or step + 1 == steps:
            mgr.save(step + 1, state, cfg)
        if eval_ds is not None and eval_every and (step + 1) % eval_every == 0:
            last_eval = evaluate_all(
                eval_step, state.params, eval_ds,
                cfg.data.y_channel_eval, cfg.data.border_crop,
            )
            avg = last_eval["__average__"]
            logger.log(step + 1, {"eval_psnr": avg["psnr"],
                                  "eval_ssim": avg["ssim"]}, prefix="eval/")

    close_loader()
    mgr.wait()
    logger.close()
    return {"state": state, "eval": last_eval, "ckpt": mgr}
