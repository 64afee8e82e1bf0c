"""Real multi-process distributed smoke (SURVEY.md §5.8; VERDICT r1 item 5).

Runs as ONE WORKER of an N-process jax.distributed job on the CPU backend
(4 fake devices per process). Exercises the actual multi-host code paths
that fake-device single-process tests cannot:

- jax.distributed.initialize barrier/bring-up (runtime/mesh.py),
- process-local feeding via jax.make_array_from_process_local_data
  (data/loader.py: shard_train_batch + load_timeline_shard),
- a pjit train step whose gradient psum crosses process boundaries.

Launch (the pytest runner tests/test_multiprocess.py does this):

  python tools/multiprocess_smoke.py --pid 0 --nproc 2 --port 12345 &
  python tools/multiprocess_smoke.py --pid 1 --nproc 2 --port 12345

Each worker prints one JSON line; the runner asserts the losses agree
across processes and match a single-process run of the same global batch.
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def small_cfg():
    from video_super_resolution_tpu.config import (DataConfig, ModelConfig,
                                                   TrainConfig, VSRConfig)

    model = ModelConfig(
        window=3, pyramid_levels=3, pyramid_channels=(8, 16, 32),
        max_displacement=2, flow_finest_level=1,
        flow_estimator_channels=(16, 12), context_channels=(16, 12),
        depth_channels=8, depth_levels=2, fusion_channels=16,
        sr_channels=16, sr_blocks=2, warp_impl="gather",
    )
    train = TrainConfig(warmup_steps=0, lr=1e-3)
    return VSRConfig(model=model, train=train)


def local_batch(pid: int, b: int = 4):
    import numpy as np

    rng = np.random.default_rng(100 + pid)
    return {
        "lr": rng.random((b, 3, 16, 24, 3)).astype("float32"),
        "hr": rng.random((b, 64, 96, 3)).astype("float32"),
    }


def run_worker(pid: int, nproc: int, port: int, frames_dir: str) -> dict:
    os.environ["JAX_PLATFORMS"] = "cpu"
    flags = os.environ.get("XLA_FLAGS", "")
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=4").strip()
    from video_super_resolution_tpu.runtime.cache import enable_cache
    enable_cache("/tmp/jax_cache_tests")
    import jax

    from video_super_resolution_tpu.runtime.mesh import (
        build_mesh, initialize_distributed)

    initialize_distributed(f"localhost:{port}", nproc, pid)
    # Establish the Gloo contexts NOW with a trivial cross-process
    # barrier: the fixed ~30 s coordination deadline then only has to
    # cover process-startup skew, not the load-dependent model-compile
    # skew that flaked the suite under concurrent chip jobs (round 4).
    from jax.experimental import multihost_utils

    multihost_utils.sync_global_devices("gloo_warmup")
    assert jax.process_count() == nproc
    assert jax.local_device_count() == 4

    import jax.numpy as jnp
    import numpy as np
    from jax.sharding import NamedSharding, PartitionSpec as P

    from video_super_resolution_tpu.config import MeshConfig
    from video_super_resolution_tpu.data.loader import (
        load_timeline_shard, shard_train_batch)
    from video_super_resolution_tpu.training.state import create_train_state
    from video_super_resolution_tpu.training.step import make_train_step

    n_dev = 4 * nproc
    mesh = build_mesh(MeshConfig(data=n_dev))

    cfg = small_cfg()
    state = create_train_state(cfg)
    state = jax.device_put(state, NamedSharding(mesh, P()))  # replicate
    step = make_train_step(cfg.train.charbonnier_eps, mesh=mesh, donate=False)

    batch = shard_train_batch(local_batch(pid), mesh, global_batch=4 * nproc)
    state, metrics = step(state, batch)
    loss = float(metrics["loss"])
    gnorm = float(metrics["grad_norm"])

    # --- timeline-sharded loading: each process reads only its frames ---
    t_mesh = build_mesh(MeshConfig(time=n_dev))
    paths = sorted(
        os.path.join(frames_dir, f) for f in os.listdir(frames_dir)
        if f.endswith(".png"))
    clip = load_timeline_shard(paths, t_mesh)
    tsum = float(jax.jit(jnp.sum)(clip))

    return {"pid": pid, "nproc": nproc, "device_count": jax.device_count(),
            "loss": loss, "grad_norm": gnorm, "tsum": tsum,
            "clip_shape": list(clip.shape)}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--pid", type=int, required=True)
    ap.add_argument("--nproc", type=int, default=2)
    ap.add_argument("--port", type=int, required=True)
    ap.add_argument("--frames-dir", required=True)
    args = ap.parse_args()
    out = run_worker(args.pid, args.nproc, args.port, args.frames_dir)
    print("MPSMOKE " + json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
