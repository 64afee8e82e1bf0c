"""Sharded loaders for multi-host execution (SURVEY.md §3.5, §5.7).

Two feeding patterns:

- ``load_timeline_shard``: streaming inference — each host reads ONLY its
  contiguous block of the clip's frames from disk and the global
  (T, h, w, 3) array is assembled via
  ``jax.make_array_from_process_local_data`` under the P("time") sharding;
  no host ever touches the full clip.
- ``shard_train_batch``: training — each host samples its own local batch
  (distinct RNG stream per process) and the global batch is the
  concatenation over hosts under P("data"); gradients psum over the mesh.

Single-host meshes degrade to plain device_put.
"""

from __future__ import annotations

from typing import Callable, Dict, List

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from video_super_resolution_tpu.data.dataset import ClipDataset, load_frame
from video_super_resolution_tpu.runtime.mesh import AXIS_DATA, AXIS_TIME


def timeline_shard_indices(num_frames: int, mesh: Mesh) -> range:
    """Frame indices owned by THIS process under P("time") sharding."""
    n_proc = jax.process_count()
    pid = jax.process_index()
    if num_frames % n_proc:
        raise ValueError(f"frames {num_frames} % processes {n_proc} != 0")
    per = num_frames // n_proc
    return range(pid * per, (pid + 1) * per)


def load_timeline_shard(frame_paths: List[str], mesh: Mesh) -> jax.Array:
    """Host-local frame reads -> global timeline-sharded (T, h, w, 3) array."""
    t = len(frame_paths)
    local_idx = timeline_shard_indices(t, mesh)
    local = np.stack([load_frame(frame_paths[i]) for i in local_idx])
    sharding = NamedSharding(mesh, P(AXIS_TIME))
    global_shape = (t,) + local.shape[1:]
    return jax.make_array_from_process_local_data(sharding, local, global_shape)


def shard_train_batch(batch: Dict[str, np.ndarray], mesh: Mesh,
                      global_batch: int) -> Dict[str, jax.Array]:
    """Host-local batch -> global P("data")-sharded batch.

    ``batch`` holds this process's samples (global_batch / process_count).
    """
    out = {}
    for k, v in batch.items():
        sharding = NamedSharding(mesh, P(AXIS_DATA))
        global_shape = (global_batch,) + v.shape[1:]
        out[k] = jax.make_array_from_process_local_data(
            sharding, np.asarray(v), global_shape
        )
    return out
