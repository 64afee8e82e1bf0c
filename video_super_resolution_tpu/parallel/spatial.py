"""Spatial tiling of activations over the "space" mesh axis (SURVEY.md §2.4 SP).

4K x4 inference activations don't fit one chip's HBM; the H dimension of
every frame tensor is sharded over "space". Mechanism: GSPMD — we annotate
the desired shardings with ``with_sharding_constraint`` and XLA's spatial
partitioner inserts the conv receptive-field halo exchanges itself
(collective-permute of boundary rows over ICI). This is the TPU-idiomatic
form of the reference-era manual halo pad: the compiler owns the halos, the
framework owns the layout.

The explicit-halo alternative (shard_map + ppermute of boundary rows, like
parallel/temporal.py does for frames) is intentionally NOT used for convs:
the model's receptive field spans the whole flow pyramid (x32 downsampling +
dilation-16 context convs), so correct manual halos would be hundreds of
rows; GSPMD partitions each conv/resize with exact per-op halos instead.
"""

from __future__ import annotations

from typing import Optional

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from video_super_resolution_tpu.runtime.mesh import AXIS_DATA, AXIS_SPACE


def spatial_sharding(mesh: Mesh, ndim: int, h_axis: int,
                     batch_axis: Optional[int] = 0) -> NamedSharding:
    """NamedSharding placing H on "space" (and axis0 on "data" if present)."""
    spec = [None] * ndim
    spec[h_axis] = AXIS_SPACE
    if batch_axis is not None and mesh.shape.get(AXIS_DATA, 1) > 1:
        spec[batch_axis] = AXIS_DATA
    return NamedSharding(mesh, P(*spec))


def with_spatial_sharding(x: jax.Array, mesh: Mesh,
                          h_axis: Optional[int] = None) -> jax.Array:
    """Constrain an NHWC-like tensor's H dim onto the "space" axis."""
    if h_axis is None:
        h_axis = x.ndim - 3
    return jax.lax.with_sharding_constraint(
        x, spatial_sharding(mesh, x.ndim, h_axis)
    )
