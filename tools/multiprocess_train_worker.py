"""Multi-process training worker for the fault-injection test (SURVEY.md
§5.3: "kill one host process mid-run, assert clean restart from the latest
checkpoint reproduces the loss curve").

One worker of an N-process jax.distributed job (CPU backend, 4 fake devices
per process). Runs a deterministic step sequence with a synchronous Orbax
checkpoint after EVERY step, restoring from the latest checkpoint at start.
``--die-at K`` makes worker 1 exit abruptly (os._exit) right after the
step-K checkpoint commits — simulating a host failure mid-run; the
surviving worker then blocks in the next collective and is killed by the
test harness. A relaunch without --die-at must restore step K and finish
with bit-identical losses to an uninterrupted run.

Launched by tests/test_multiprocess_resume.py.
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def global_batch_for_step(step: int, nproc: int, b_per_proc: int = 4):
    """Deterministic global batch, identical no matter how many processes
    consume it (seeded by step only)."""
    import numpy as np

    rng = np.random.default_rng(1000 + step)
    b = b_per_proc * nproc
    return {
        "lr": rng.random((b, 3, 16, 24, 3)).astype("float32"),
        "hr": rng.random((b, 64, 96, 3)).astype("float32"),
    }


def run_worker(args) -> dict:
    os.environ["JAX_PLATFORMS"] = "cpu"
    flags = os.environ.get("XLA_FLAGS", "")
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=4").strip()
    from video_super_resolution_tpu.runtime.cache import enable_cache

    enable_cache("/tmp/jax_cache_tests")
    import jax

    from video_super_resolution_tpu.runtime.mesh import (
        build_mesh, initialize_distributed)

    initialize_distributed(f"localhost:{args.port}", args.nproc, args.pid)
    assert jax.process_count() == args.nproc
    # Establish the Gloo contexts NOW with a trivial cross-process
    # barrier. initialize_distributed has already held every process at a
    # configurable coordination-service barrier (r5 hardening), so the
    # fixed ~30 s Gloo deadline only covers this collective's own context
    # formation — not startup or model-compile skew (the r4 flake mode).
    from jax.experimental import multihost_utils

    multihost_utils.sync_global_devices("gloo_warmup")

    import numpy as np
    from jax.sharding import NamedSharding, PartitionSpec as P

    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from multiprocess_smoke import small_cfg

    from video_super_resolution_tpu.config import MeshConfig
    from video_super_resolution_tpu.training.checkpoint import CheckpointManager
    from video_super_resolution_tpu.training.state import create_train_state
    from video_super_resolution_tpu.training.step import make_train_step

    n_dev = 4 * args.nproc
    mesh = build_mesh(MeshConfig(data=n_dev))
    cfg = small_cfg()
    state = create_train_state(cfg)
    state = jax.device_put(state, NamedSharding(mesh, P()))  # replicate

    # Synchronous saves: the checkpoint must be durable before the induced
    # crash (the async path would race the os._exit below).
    mgr = CheckpointManager(args.ckpt_dir, keep=3, async_save=False)
    restored, at = mgr.restore(state)
    if restored is not None:
        state = restored
    start = int(state.step)

    step_fn = make_train_step(cfg.train.charbonnier_eps, mesh=mesh,
                              donate=False)
    losses = {}
    for s in range(start + 1, args.steps + 1):
        batch = global_batch_for_step(s, args.nproc)
        # each process feeds its slice of the global batch
        lo = args.pid * 4
        local = {k: v[lo:lo + 4] for k, v in batch.items()}
        from video_super_resolution_tpu.data.loader import shard_train_batch

        sharded = shard_train_batch(local, mesh, global_batch=4 * args.nproc)
        state, metrics = step_fn(state, sharded)
        losses[s] = float(metrics["loss"])
        mgr.save(s, state, cfg)
        mgr.wait()
        if args.die_at and s == args.die_at and args.pid == 1:
            # abrupt host failure AFTER the step-s checkpoint committed
            os._exit(17)
    mgr.close()
    return {"pid": args.pid, "start": start, "losses": losses,
            "final_step": int(state.step)}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--pid", type=int, required=True)
    ap.add_argument("--nproc", type=int, default=2)
    ap.add_argument("--port", type=int, required=True)
    ap.add_argument("--ckpt-dir", required=True)
    ap.add_argument("--steps", type=int, default=4)
    ap.add_argument("--die-at", type=int, default=0)
    args = ap.parse_args()
    out = run_worker(args)
    print("TRAINW " + json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
