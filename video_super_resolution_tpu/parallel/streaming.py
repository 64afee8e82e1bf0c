"""Multi-host streaming inference: 1080p -> 4K x4 (driver config #5,
SURVEY.md §3.5).

Pipeline:

    runtime.initialize_distributed -> mesh ("time" over hosts, "space" over
    local chips) -> each host loads its timeline shard -> one jit program:
    [shard_map over "time": frame halo ppermute + window assembly]
    x [GSPMD over "space": H-sharded model forward] -> HR frames, timeline
    order preserved, written host-side.

The combined program nests the GSPMD-spatial model inside the temporal
shard_map: within a "time" shard the model forward is jit-traced with
"space" sharding constraints, so XLA emits conv halo exchanges on the
"space" sub-axis while the explicit frame halo rides "time".
"""

from __future__ import annotations

from typing import Callable, Iterator, Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from video_super_resolution_tpu.config import VSRConfig
from video_super_resolution_tpu.models.vsr import VSRModel
from video_super_resolution_tpu.parallel.temporal import (
    halo_exchange_frames,
    _windows_from_extended,
)
from video_super_resolution_tpu.runtime.dtypes import DTypePolicy
from video_super_resolution_tpu.runtime.mesh import AXIS_SPACE, AXIS_TIME


def make_streaming_program(
    cfg: VSRConfig,
    mesh: Mesh,
    frame_hw: tuple,
    frames_per_device: int,
    window_batch: int = 1,
) -> Callable:
    """Build fn(params, frames (T, h, w, 3)) -> (T, h*scale, w*scale, 3).

    T = frames_per_device * time_size must hold; frames arrive sharded over
    "time" (the caller device_puts with that sharding). Each time-shard
    assembles its windows after the frame-halo ppermute and runs them in
    chunks of ``window_batch`` through the spatially-sharded model.
    """
    policy = DTypePolicy.from_strings(cfg.train.compute_dtype)
    model = VSRModel(cfg=cfg.model, use_pallas=cfg.use_pallas,
                     dtype=policy.compute_dtype)
    window = cfg.model.window
    r = window // 2
    scale = cfg.model.scale
    h, w = frame_hw
    use_space = mesh.shape.get(AXIS_SPACE, 1) > 1

    def forward_windows(params, windows: jax.Array) -> jax.Array:
        # windows: (F, window, h, w, 3) — chunk to bound activation memory.
        f = windows.shape[0]
        nb = max(1, window_batch)
        outs = []
        for i in range(0, f, nb):
            chunk = windows[i : i + nb]
            if use_space:
                chunk = jax.lax.with_sharding_constraint(
                    chunk, NamedSharding(mesh, P(None, None, AXIS_SPACE))
                )
            out = model.apply({"params": params}, chunk)
            if use_space:
                out = jax.lax.with_sharding_constraint(
                    out, NamedSharding(mesh, P(None, AXIS_SPACE))
                )
            outs.append(out)
        return jnp.concatenate(outs, axis=0)

    def shard_fn(params, frames_local: jax.Array) -> jax.Array:
        ext = halo_exchange_frames(frames_local, r, AXIS_TIME)
        windows = _windows_from_extended(ext, frames_local.shape[0], window)
        return forward_windows(params, windows)

    sharded = jax.shard_map(
        shard_fn,
        mesh=mesh,
        in_specs=(P(), P(AXIS_TIME)),
        out_specs=P(AXIS_TIME),
        check_vma=False,  # params closed over replicated; spatial constraint inside
    )
    return jax.jit(sharded)


def stream_clip(
    program: Callable,
    params,
    frames: np.ndarray,
    mesh: Mesh,
) -> np.ndarray:
    """Feed a host-resident clip through the streaming program."""
    sharding = NamedSharding(mesh, P(AXIS_TIME))
    frames_dev = jax.device_put(jnp.asarray(frames), sharding)
    out = program(params, frames_dev)
    return np.asarray(out)
