"""Device-mesh construction (SURVEY.md §2.5, §5.8).

The reference is a single-process research repo with no distributed layer;
all parallelism here is new scope defined by the spec. We build one logical
mesh with axes ("data", "time", "space"):

- "data":  batch data-parallelism; gradient psum rides this axis.
- "time":  temporal context-parallelism — the video timeline is sharded in
           contiguous frame blocks per device/host, with ppermute halo
           exchange of boundary frames + flows (SURVEY.md §5.7).
- "space": spatial tiling of the H dimension for 4K activations, with
           conv-receptive-field halo exchange.

Axis ordering puts "data" outermost so its allreduce maps onto the slowest
links last (DCN when multi-slice), and keeps "time"/"space" — which carry
frequent halo traffic — on contiguous (ICI-adjacent) device blocks.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh

from video_super_resolution_tpu.config import MeshConfig

AXIS_DATA = "data"
AXIS_TIME = "time"
AXIS_SPACE = "space"
AXIS_MODEL = "model"
AXES = (AXIS_DATA, AXIS_TIME, AXIS_SPACE, AXIS_MODEL)


def build_mesh(cfg: MeshConfig, devices: Optional[Sequence[jax.Device]] = None) -> Mesh:
    """Build the (data, time, space) mesh over the given devices.

    Uses ``mesh_utils.create_device_mesh`` when the full device set is used
    (it optimizes for ICI topology); falls back to a simple reshape for
    subsets / fake CPU devices.
    """
    if devices is None:
        devices = jax.devices()
    n = cfg.num_devices
    if n > len(devices):
        raise ValueError(
            f"mesh {cfg.shape} needs {n} devices, only {len(devices)} available"
        )
    shape = (cfg.data, cfg.time, cfg.space, cfg.model)
    if n == len(devices):
        try:
            from jax.experimental import mesh_utils

            dev_array = mesh_utils.create_device_mesh(shape, devices=list(devices))
            return Mesh(dev_array, AXES)
        except Exception:
            pass  # topology-aware layout unavailable (e.g. fake CPU devices)
    dev_array = np.asarray(devices[:n]).reshape(shape)
    return Mesh(dev_array, AXES)


def local_mesh() -> Mesh:
    """Trivial 1-device mesh (single-chip dev/eval path)."""
    return build_mesh(MeshConfig(data=1, time=1, space=1))


def initialize_distributed(coordinator: Optional[str] = None,
                           num_processes: Optional[int] = None,
                           process_id: Optional[int] = None) -> None:
    """Multi-host bring-up: one process per host, controller-less SPMD.

    On real pods jax.distributed discovers peers from the TPU environment;
    explicit args are for DCN-only or manual launches. Safe to skip on a
    single host.

    Gloo-deadline hardening (VERDICT r4 next #7): on the CPU backend the
    first collective forms Gloo TCP contexts under a ~30 s rendezvous
    deadline that jaxlib 0.9 hard-codes in C++ — ``make_gloo_tcp_collectives
    (distributed_client, hostname, interface)`` exposes no timeout knob, so
    it cannot be raised from Python. What IS configurable is the
    coordination-service barrier, so after initialize we hold every process
    at a ``wait_at_barrier`` whose timeout comes from
    ``VSR_COORD_BARRIER_TIMEOUT_S`` (default 600 s). Processes leave that
    barrier within microseconds of each other, so the fixed 30 s Gloo
    window then only has to cover context formation itself — never
    process-startup or compile skew (the round-4 flake mode). Callers
    should still run their first tiny collective (e.g.
    ``multihost_utils.sync_global_devices``) immediately afterwards, before
    any compile-heavy work.
    """
    if num_processes is not None and num_processes > 1:
        import os

        timeout_s = int(os.environ.get("VSR_COORD_BARRIER_TIMEOUT_S", "600"))
        jax.distributed.initialize(
            coordinator_address=coordinator,
            num_processes=num_processes,
            process_id=process_id,
            initialization_timeout=timeout_s,
        )
        from jax._src import distributed as _dist

        client = getattr(_dist.global_state, "client", None)
        if client is not None:
            client.wait_at_barrier("vsr_pre_gloo", timeout_s * 1000, None)
