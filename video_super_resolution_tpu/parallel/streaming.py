"""Multi-host streaming inference: 1080p -> 4K x4 (driver config #5,
SURVEY.md §3.5).

Pipeline:

    runtime.initialize_distributed -> mesh ("time" over hosts, "space" over
    local chips) -> each host loads its timeline shard -> one jit program:
    timeline halo exchange + window assembly + spatially-sharded model
    forward -> HR frames in timeline order.

Two interchangeable implementations (equal outputs, tested):

- time-only mesh: explicit shard_map + ppermute of boundary frames over ICI
  (parallel/temporal.py) — the mechanism the spec names, with the halo
  transfer visible and schedulable.
- time x space mesh: one GSPMD program. Window assembly slices the
  time-sharded timeline (XLA emits the boundary-frame collective-permutes)
  and every activation is constrained H-on-"space" (XLA emits conv
  receptive-field halos). Nesting GSPMD spatial partitioning *inside* a
  manual time shard_map is deliberately avoided: XLA's SPMD partitioner
  cannot mix manual and auto axes through this model (hard Check failure
  observed on jax 0.9) — one partitioning regime per program.
"""

from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from video_super_resolution_tpu.config import VSRConfig
from video_super_resolution_tpu.models.vsr import VSRModel
from video_super_resolution_tpu.parallel.temporal import temporal_shard_forward
from video_super_resolution_tpu.runtime.dtypes import DTypePolicy
from video_super_resolution_tpu.runtime.mesh import AXIS_SPACE, AXIS_TIME


def _build_model(cfg: VSRConfig) -> VSRModel:
    policy = DTypePolicy.from_strings(cfg.train.compute_dtype)
    return VSRModel(cfg=cfg.model, use_pallas=cfg.use_pallas,
                    dtype=policy.compute_dtype)


def make_streaming_program(
    cfg: VSRConfig,
    mesh: Mesh,
    frame_hw: tuple,
    frames_per_device: int,
    window_batch: int = 1,
) -> Callable:
    """Build fn(params, frames (T, h, w, 3)) -> (T, h*scale, w*scale, 3).

    frames arrive sharded over "time" (caller device_puts with P("time")).
    T = frames_per_device * time_size.
    """
    window = cfg.model.window
    r = window // 2
    use_space = mesh.shape.get(AXIS_SPACE, 1) > 1
    model = _build_model(cfg)

    if not use_space:
        # params enter as a traced shard_map input (replicated), NOT a
        # python closure: closing over them would rebuild + re-jit the
        # program on every call (recompile per invocation — measured 11 s
        # per 2-frame call on the CPU mesh before this fix).
        from video_super_resolution_tpu.parallel.temporal import (
            halo_exchange_frames)
        from video_super_resolution_tpu.runtime.mesh import AXIS_TIME as _T

        r_halo = window // 2

        def shard_fn(params, frames_local):
            f = frames_local.shape[0]
            ext = halo_exchange_frames(frames_local, r_halo, _T)
            windows = jnp.stack([ext[i: i + window] for i in range(f)], 0)
            return model.apply({"params": params}, windows)

        # check_vma=False: the model body may contain pallas_call (the r5
        # packed-trunk route runs it even in interpret mode on the CPU
        # mesh), whose out_shape avals carry no varying-mesh-axes info —
        # jax 0.9's shard_map vma checker rejects that. Correctness is
        # unaffected: outputs are per-shard frames, explicitly P(time).
        return jax.jit(jax.shard_map(
            shard_fn, mesh=mesh,
            in_specs=(P(), P(_T)), out_specs=P(_T),
            check_vma=False,
        ))

    t_total = None  # static per trace from frames.shape

    def program(params, frames: jax.Array) -> jax.Array:
        t = frames.shape[0]
        frames = jax.lax.with_sharding_constraint(
            frames, NamedSharding(mesh, P(AXIS_TIME, AXIS_SPACE))
        )
        # Replicate-pad the timeline ends (clip edge policy), then assemble
        # sliding windows; slicing across the time-sharded axis makes XLA
        # emit the boundary-frame exchange.
        ext = jnp.concatenate(
            [jnp.repeat(frames[:1], r, axis=0), frames,
             jnp.repeat(frames[-1:], r, axis=0)], axis=0
        )
        windows = jnp.stack([ext[i : i + window] for i in range(t)], axis=0)
        windows = jax.lax.with_sharding_constraint(
            windows, NamedSharding(mesh, P(AXIS_TIME, None, AXIS_SPACE))
        )
        out = model.apply({"params": params}, windows)
        return jax.lax.with_sharding_constraint(
            out, NamedSharding(mesh, P(AXIS_TIME, AXIS_SPACE))
        )

    return jax.jit(program)


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
