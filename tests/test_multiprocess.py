"""Launch a REAL 2-process jax.distributed job (CPU backend, 4 fake devices
per process) and assert the cross-process psum train step and the
process-local timeline feeding produce the single-process numbers
(SURVEY.md §5.8; VERDICT r1 item 5 — the distributed stack must run in >1
process, not only on a fake single-process mesh)."""

import json
import os
import socket
import subprocess
import sys

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
WORKER = os.path.join(REPO, "tools", "multiprocess_smoke.py")


def _free_port():
    with socket.socket() as s:
        s.bind(("localhost", 0))
        return s.getsockname()[1]


def _write_frames(tmp_path, t=8, h=16, w=24):
    from PIL import Image

    rng = np.random.default_rng(7)
    frames = (rng.random((t, h, w, 3)) * 255).astype(np.uint8)
    for i in range(t):
        Image.fromarray(frames[i]).save(tmp_path / f"{i:03d}.png")
    return frames.astype(np.float32) / 255.0


def test_two_process_psum_and_timeline(tmp_path):
    frames = _write_frames(tmp_path)
    port = _free_port()
    env = {k: v for k, v in os.environ.items()
           if k not in ("XLA_FLAGS", "JAX_PLATFORMS")}
    env["PYTHONPATH"] = REPO
    procs = [
        subprocess.Popen(
            [sys.executable, WORKER, "--pid", str(i), "--nproc", "2",
             "--port", str(port), "--frames-dir", str(tmp_path)],
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, env=env,
            text=True)
        for i in range(2)
    ]
    outs = []
    for p in procs:
        out, _ = p.communicate(timeout=560)
        assert p.returncode == 0, out[-3000:]
        line = [ln for ln in out.splitlines() if ln.startswith("MPSMOKE ")]
        assert line, out[-3000:]
        outs.append(json.loads(line[-1][len("MPSMOKE "):]))

    a, b = outs
    assert a["device_count"] == b["device_count"] == 8
    # replicated metrics must agree bit-for-bit across processes
    assert a["loss"] == b["loss"]
    assert a["grad_norm"] == b["grad_norm"]
    assert a["clip_shape"] == [8, 16, 24, 3]
    # timeline-sharded sum == sum of the frames each process loaded locally
    np.testing.assert_allclose(a["tsum"], frames.sum(), rtol=1e-5)
    np.testing.assert_allclose(a["tsum"], b["tsum"], rtol=0)

    # single-process reference: same global batch through the same step on
    # the in-process 8-fake-device mesh
    import jax
    from jax.sharding import NamedSharding, PartitionSpec as P

    sys.path.insert(0, os.path.join(REPO, "tools"))
    from multiprocess_smoke import local_batch, small_cfg

    from video_super_resolution_tpu.config import MeshConfig
    from video_super_resolution_tpu.runtime.mesh import build_mesh
    from video_super_resolution_tpu.training.state import create_train_state
    from video_super_resolution_tpu.training.step import make_train_step

    mesh = build_mesh(MeshConfig(data=8))
    cfg = small_cfg()
    state = create_train_state(cfg)
    state = jax.device_put(state, NamedSharding(mesh, P()))
    step = make_train_step(cfg.train.charbonnier_eps, mesh=mesh, donate=False)
    b0, b1 = local_batch(0), local_batch(1)
    batch = {k: np.concatenate([b0[k], b1[k]]) for k in b0}
    _, metrics = step(state, batch)
    np.testing.assert_allclose(a["loss"], float(metrics["loss"]),
                               rtol=2e-5, atol=1e-6)
