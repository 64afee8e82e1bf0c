"""Temporal context-parallelism: timeline shards + frame halo exchange.

SURVEY.md §5.7 — the spec's core distributed demand. The video timeline is
the long axis: device i on the "time" mesh axis owns frames
[i*F, (i+1)*F). Every owned frame needs a full window of r = window//2
neighbors each side, so before compute each shard exchanges its boundary
frames with its ring neighbors:

    from_left  = ppermute(last r local frames,  shift +1)   # ICI hop
    from_right = ppermute(first r local frames, shift -1)

The timeline is NOT a ring (no wraparound): edge shards fill the missing
halo by replicating their own edge frame, which exactly reproduces the
single-device "replicate" clip-edge policy (data/dataset.py) — sharded
output == unsharded output bit-for-fp32, asserted in tests/test_parallel.py.

This is ring/halo context parallelism specialized to fixed-radius temporal
interaction; no attention, hence neighbor ppermute rather than any
all-to-all (SURVEY.md §2.4 CP row records why).
"""

from __future__ import annotations

import functools
from typing import Callable, Optional

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from video_super_resolution_tpu.runtime.mesh import AXIS_TIME


def _replicate_rows(x: jax.Array, r: int, first: bool) -> jax.Array:
    """(r, ...) halo filled by replicating the edge frame of ``x``."""
    edge = x[:1] if first else x[-1:]
    return jnp.broadcast_to(edge, (r,) + x.shape[1:])


def halo_exchange_frames(local: jax.Array, r: int,
                         axis_name: str = AXIS_TIME) -> jax.Array:
    """Inside shard_map: (F, ...) local frames -> (F + 2r, ...) extended.

    Boundary blocks travel one ICI hop left/right via ppermute; edge shards
    replicate their own edge frame for the missing side.
    """
    n = jax.lax.axis_size(axis_name)
    idx = jax.lax.axis_index(axis_name)
    if r == 0 or n == 1:
        if r == 0:
            return local
        return jnp.concatenate(
            [_replicate_rows(local, r, True), local,
             _replicate_rows(local, r, False)], axis=0)

    right_block = local[-r:]   # travels to the right neighbor's left halo
    left_block = local[:r]     # travels to the left neighbor's right halo
    from_left = jax.lax.ppermute(
        right_block, axis_name, [(i, i + 1) for i in range(n - 1)]
    )
    from_right = jax.lax.ppermute(
        left_block, axis_name, [(i, i - 1) for i in range(1, n)]
    )
    # ppermute leaves zeros where no source maps; edge shards replicate.
    from_left = jnp.where(idx == 0, _replicate_rows(local, r, True), from_left)
    from_right = jnp.where(
        idx == n - 1, _replicate_rows(local, r, False), from_right
    )
    return jnp.concatenate([from_left, local, from_right], axis=0)


def _windows_from_extended(ext: jax.Array, num_centers: int, window: int) -> jax.Array:
    """(F+2r, ...) -> (F, window, ...) sliding windows (static unroll)."""
    return jnp.stack(
        [ext[i : i + window] for i in range(num_centers)], axis=0
    )


def temporal_shard_forward(
    forward_windows: Callable[[jax.Array], jax.Array],
    mesh: Mesh,
    window: int,
    axis_name: str = AXIS_TIME,
) -> Callable[[jax.Array], jax.Array]:
    """Build the sharded timeline program (SURVEY.md §3.5).

    forward_windows: (B, window, h, w, 3) -> (B, H, W, 3) — the jit-friendly
      per-window model forward (windows batched along axis 0).

    Returns fn(frames (T, h, w, 3)) -> (T, H, W, 3) where T is sharded over
    the mesh "time" axis (T % time_size == 0). Each shard exchanges halos,
    assembles its local windows, and runs the model on its own frames only —
    compute is perfectly balanced and the only communication is the 2r-frame
    ppermute plus whatever GSPMD adds inside forward_windows (none: it is
    shard-local).
    """
    r = window // 2

    def shard_fn(frames_local: jax.Array) -> jax.Array:
        f = frames_local.shape[0]
        ext = halo_exchange_frames(frames_local, r, axis_name)
        windows = _windows_from_extended(ext, f, window)
        return forward_windows(windows)

    # check_vma=False: forward_windows may contain pallas_call (packed
    # trunk route), whose out_shape avals carry no varying-mesh-axes info
    # — jax 0.9's shard_map vma checker rejects that (see streaming.py).
    return jax.jit(
        jax.shard_map(
            shard_fn,
            mesh=mesh,
            in_specs=P(axis_name),
            out_specs=P(axis_name),
            check_vma=False,
        )
    )
