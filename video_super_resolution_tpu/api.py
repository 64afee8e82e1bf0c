"""High-level API mapping the driver's eval configs to single calls.

The five capability configs (BASELINE.md):

1. upscale_window      — x4 SR forward on one temporal window
2. estimate_and_align  — optical flow + warp of neighbors onto the reference
3. fuse_and_reconstruct (inside upscale_window; exposed via return_aux)
4. training step       — training/step.py + training/loop.py
5. stream_upscale      — multi-host timeline-sharded streaming inference
"""

from __future__ import annotations

from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from video_super_resolution_tpu.config import VSRConfig
from video_super_resolution_tpu.models import FlowNet, VSRModel
from video_super_resolution_tpu.models.common import pad_to_multiple
from video_super_resolution_tpu.ops.warp import backward_warp
from video_super_resolution_tpu.runtime.dtypes import DTypePolicy


def build_model(cfg: Optional[VSRConfig] = None) -> VSRModel:
    cfg = cfg or VSRConfig()
    policy = DTypePolicy.from_strings(cfg.train.compute_dtype)
    return VSRModel(cfg=cfg.model, use_pallas=cfg.use_pallas,
                    dtype=policy.compute_dtype)


def upscale_window(params, window: jax.Array,
                   cfg: Optional[VSRConfig] = None,
                   return_aux: bool = False):
    """Config #1: (B, T, h, w, 3) LR window -> (B, h*scale, w*scale, 3)."""
    model = build_model(cfg)
    return model.apply({"params": params}, window, return_aux=return_aux)


def estimate_and_align(
    flow_params, ref: jax.Array, neighbors: jax.Array,
    cfg: Optional[VSRConfig] = None, padding_mode: str = "zeros",
) -> Tuple[jax.Array, jax.Array]:
    """Config #2: flow of each neighbor onto ref + warped neighbors.

    ref: (B, H, W, 3); neighbors: (B, N, H, W, 3).
    Returns (flows (B, N, H, W, 2), warped (B, N, H, W, 3)).
    """
    cfg = cfg or VSRConfig()
    b, n, h0, w0, _ = neighbors.shape
    mult = 2 ** len(cfg.model.pyramid_channels)
    ref_p, (h0, w0) = pad_to_multiple(ref, mult)
    nbr_p, _ = pad_to_multiple(neighbors, mult)
    h, w = ref_p.shape[1:3]
    flow_net = FlowNet(
        pyramid_channels=cfg.model.pyramid_channels,
        estimator_channels=cfg.model.flow_estimator_channels,
        context_channels=cfg.model.context_channels,
        max_displacement=cfg.model.max_displacement,
        slope=cfg.model.lrelu_slope,
        use_pallas=cfg.use_pallas,
    )
    ref_rep = jnp.broadcast_to(ref_p[:, None], (b, n, h, w, 3)).reshape(
        b * n, h, w, 3)
    nbr_flat = nbr_p.reshape(b * n, h, w, 3)
    flows = flow_net.apply({"params": flow_params}, ref_rep, nbr_flat)
    warped = backward_warp(nbr_flat, flows, padding_mode,
                           use_pallas=cfg.use_pallas)
    flows = flows.reshape(b, n, h, w, 2)[:, :, :h0, :w0]
    warped = warped.reshape(b, n, h, w, 3)[:, :, :h0, :w0]
    return flows, warped


def init_flow_params(cfg: Optional[VSRConfig] = None, seed: int = 0):
    """Standalone FlowNet params (e.g. for estimate_and_align)."""
    cfg = cfg or VSRConfig()
    flow_net = FlowNet(
        pyramid_channels=cfg.model.pyramid_channels,
        estimator_channels=cfg.model.flow_estimator_channels,
        context_channels=cfg.model.context_channels,
        max_displacement=cfg.model.max_displacement,
        slope=cfg.model.lrelu_slope,
    )
    mult = 2 ** len(cfg.model.pyramid_channels)
    x = jnp.zeros((1, mult * 2, mult * 2, 3), jnp.float32)
    return flow_net.init(jax.random.key(seed), x, x)["params"]


def upscale_clip(params, frames: np.ndarray, cfg: Optional[VSRConfig] = None,
                 edge_mode: str = "replicate") -> np.ndarray:
    """Single-device clip upscaling: (T, h, w, 3) -> (T, h*s, w*s, 3)."""
    from video_super_resolution_tpu.data.dataset import sliding_window_indices
    from video_super_resolution_tpu.training.step import make_eval_step

    cfg = cfg or VSRConfig()
    model = build_model(cfg)
    eval_step = make_eval_step(model.apply)
    t = frames.shape[0]
    outs = []
    for c in range(t):
        idx = sliding_window_indices(t, c, cfg.model.window, edge_mode)
        win = jnp.asarray(np.stack([frames[i] for i in idx])[None])
        outs.append(np.asarray(eval_step(params, win))[0])
    return np.stack(outs)


def stream_upscale(params, frames: np.ndarray, cfg: VSRConfig, mesh,
                   window_batch: int = 1) -> np.ndarray:
    """Config #5: timeline-sharded streaming inference over a mesh."""
    from video_super_resolution_tpu.parallel.streaming import (
        make_streaming_program, stream_clip,
    )

    t, h, w, _ = frames.shape
    time_size = mesh.shape.get("time", 1)
    if t % time_size:
        raise ValueError(f"frames {t} not divisible by time axis {time_size}")
    program = make_streaming_program(cfg, mesh, (h, w), t // time_size,
                                     window_batch)
    return stream_clip(program, params, frames, mesh)
