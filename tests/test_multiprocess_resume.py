"""Fault injection on the 2-process harness (SURVEY.md §5.3's named test,
VERDICT r2 missing #6): kill one worker mid-run right after a checkpoint,
assert a clean relaunch restores the latest checkpoint and reproduces the
uninterrupted run's loss curve bit-for-bit (CPU backend is deterministic).

Load sensitivity (round-4 analysis, round-5 hardening): Gloo context
formation uses the coordination KV store with a ~30 s deadline that
jaxlib 0.9 hard-codes in C++ (``make_gloo_tcp_collectives`` exposes no
timeout parameter — verified against its pybind signature). Round 5
moves the rendezvous pressure onto the CONFIGURABLE coordination-service
barrier instead: ``initialize_distributed`` holds all processes at a
``wait_at_barrier`` (VSR_COORD_BARRIER_TIMEOUT_S, default 600 s) so the
fixed Gloo window only covers context formation itself, never startup or
compile skew. The 3x retry-with-backoff harness remains as a last-resort
guard for extreme starvation of this 2-core host; each successful run
prints ``COORD_RETRIES n`` so suite logs record whether it was needed.
"""

import json
import os
import socket
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
WORKER = os.path.join(REPO, "tools", "multiprocess_train_worker.py")


def _free_port():
    with socket.socket() as s:
        s.bind(("localhost", 0))
        return s.getsockname()[1]


def _launch(pid, port, ckpt_dir, steps, die_at=0):
    env = {k: v for k, v in os.environ.items()
           if k not in ("XLA_FLAGS", "JAX_PLATFORMS")}
    env["PYTHONPATH"] = REPO
    return subprocess.Popen(
        [sys.executable, WORKER, "--pid", str(pid), "--nproc", "2",
         "--port", str(port), "--ckpt-dir", str(ckpt_dir),
         "--steps", str(steps), "--die-at", str(die_at)],
        stdout=subprocess.PIPE, stderr=subprocess.STDOUT, env=env, text=True)


def _run_pair(port, ckpt_dir, steps, die_at=0, survivor_timeout=420):
    # survivor_timeout covers worker 1's full life (compile + die_at steps +
    # checkpoint). 120 s flaked under host load on the 2-core box (the
    # isolated run takes ~228 s total) — budget generously; the timeout only
    # bounds a genuinely hung worker.
    procs = [_launch(i, port, ckpt_dir, steps, die_at) for i in range(2)]
    outs = [None, None]
    if die_at:
        # worker 1 self-terminates (exit 17) after the die_at checkpoint;
        # worker 0 then blocks in the next step's collective — kill it by
        # exact PID once worker 1 is gone.
        out1, _ = procs[1].communicate(timeout=survivor_timeout)
        if procs[1].returncode not in (17,) and _is_coord_flake(out1):
            for q in procs:
                q.kill()
            raise _CoordFlake(out1[-500:])
        assert procs[1].returncode == 17, out1[-3000:]
        try:
            out0, _ = procs[0].communicate(timeout=30)
        except subprocess.TimeoutExpired:
            procs[0].kill()
            out0, _ = procs[0].communicate()
        return None
    for i, p in enumerate(procs):
        out, _ = p.communicate(timeout=560)
        if p.returncode != 0 and _is_coord_flake(out):
            # Gloo/coordination-service init has a fixed 30 s deadline; on
            # this 2-core host a loaded machine (e.g. the suite running
            # next to a chip benchmark) can blow it spuriously. Retry the
            # pair once on a quiet-er moment rather than failing the
            # fault-injection test on scheduler noise.
            for q in procs:
                q.kill()
            raise _CoordFlake(out[-500:])
        assert p.returncode == 0, out[-3000:]
        line = [ln for ln in out.splitlines() if ln.startswith("TRAINW ")]
        assert line, out[-3000:]
        outs[i] = json.loads(line[-1][len("TRAINW "):])
    return outs


class _CoordFlake(Exception):
    pass


def _is_coord_flake(out: str) -> bool:
    return ("DEADLINE_EXCEEDED" in out and "Gloo" in out) or (
        "Shutdown barrier has failed" in out)


def _run_pair_retry(port_factory, ckpt_dir, steps, die_at=0, **kw):
    # A flake can strike AFTER checkpoints were written (e.g. at the
    # shutdown barrier); retrying on the same dir would resume from the
    # leftover checkpoint and misfire the start/losses assertions.
    # Fresh-run retries get a clean dir; resume-run retries (step 3 of
    # the test) must keep it — those pass resume_retry=True.
    resume_retry = kw.pop("resume_retry", False)
    import shutil
    import time

    # Gloo context init has a fixed ~30 s coordination deadline; on this
    # 2-core host a loaded machine (chip benchmarks, a second suite) can
    # blow it several times in a row — retry with backoff instead of
    # failing the fault-injection test on scheduler noise.
    attempts = 3
    for i in range(attempts):
        try:
            out = _run_pair(port_factory(), ckpt_dir, steps, die_at, **kw)
            # visible retry accounting (VERDICT r4 next #7: "retries
            # logged at zero"): grep the suite output for COORD_RETRIES
            print(f"COORD_RETRIES {i}", flush=True)
            return out
        except _CoordFlake:
            if i == attempts - 1:
                raise
            if not resume_retry:
                shutil.rmtree(ckpt_dir, ignore_errors=True)
            time.sleep(5 * (i + 1))


def test_multiprocess_kill_resume(tmp_path):
    steps, die_at = 4, 2

    # 1) uninterrupted reference run
    ref = _run_pair_retry(_free_port, tmp_path / "ref", steps)
    assert ref[0]["losses"] == ref[1]["losses"]
    assert ref[0]["final_step"] == steps
    ref_losses = ref[0]["losses"]
    assert set(ref_losses) == {str(s) for s in range(1, steps + 1)} or \
        set(ref_losses) == set(range(1, steps + 1))

    # 2) crash run: worker 1 dies right after the step-2 checkpoint
    crash_dir = tmp_path / "crash"
    _run_pair_retry(_free_port, crash_dir, steps, die_at=die_at)

    # 3) relaunch on the same checkpoint dir: must restore step 2 and
    #    reproduce the reference losses for the remaining steps exactly
    res = _run_pair_retry(_free_port, crash_dir, steps, resume_retry=True)
    for r in res:
        assert r["start"] == die_at, r
        assert r["final_step"] == steps
    # json round-trip stringifies the int keys
    resumed = {int(k): v for k, v in res[0]["losses"].items()}
    refl = {int(k): v for k, v in ref_losses.items()}
    assert set(resumed) == {die_at + 1, steps}
    for s in resumed:
        assert resumed[s] == refl[s], (s, resumed[s], refl[s])
