"""Tracing / profiling utilities (SURVEY.md §5.1).

- profile_trace: context manager around train/eval steps writing a
  TensorBoard/Perfetto trace via jax.profiler (works on TPU; on the axon
  tunnel the trace captures host-side dispatch which is still useful for
  finding gaps).
- roofline_report: analytic speed-of-light numbers for the two hand-written
  kernels (correlation, warp) against chip specs, so bench runs can report
  fraction-of-roofline, per the spec's "speed-of-light" kernel requirement.
- Modules use jax.named_scope (flow/warp/fusion/sr) so HLO and traces are
  readable.
"""

from __future__ import annotations

import contextlib
from typing import Dict, Optional

import jax

# v5e-class chip (PALLAS_AXON_TPU_GEN=v5e in this environment).
CHIP_SPECS = {
    "v5e": {"bf16_tflops": 197.0, "f32_tflops": 98.5, "hbm_gbps": 819.0},
    "v5p": {"bf16_tflops": 459.0, "f32_tflops": 229.5, "hbm_gbps": 2765.0},
}


@contextlib.contextmanager
def profile_trace(log_dir: str, enabled: bool = True):
    if not enabled:
        yield
        return
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def correlation_roofline_ms(b: int, h: int, w: int, c: int, d: int,
                            dtype_bytes: int = 4, chip: str = "v5e") -> Dict:
    """Analytic floor for the cost-volume kernel: it is VPU/HBM bound.

    HBM floor: read f1 + f2 once (the kernel's whole point), write K-channel
    output. FLOP floor: 2*B*H*W*C*K on the VPU (~1/8 of MXU tflops usable
    for elementwise multiply-add chains).
    """
    spec = CHIP_SPECS[chip]
    k = (2 * d + 1) ** 2
    bytes_moved = (2 * b * h * w * c) * dtype_bytes + b * h * w * k * 4
    flops = 2 * b * h * w * c * k
    t_mem = bytes_moved / (spec["hbm_gbps"] * 1e9)
    t_vpu = flops / (spec["bf16_tflops"] / 8 * 1e12)
    return {"hbm_ms": t_mem * 1e3, "vpu_ms": t_vpu * 1e3,
            "floor_ms": max(t_mem, t_vpu) * 1e3}


def warp_roofline_ms(b: int, h: int, w: int, c: int,
                     dtype_bytes: int = 4, chip: str = "v5e") -> Dict:
    """Warp floor: pure HBM — read img + flow once, write out once (the
    VMEM-resident kernel's ideal); 4-tap blend FLOPs are negligible."""
    spec = CHIP_SPECS[chip]
    bytes_moved = (2 * b * h * w * c) * dtype_bytes + b * h * w * 2 * 4
    return {"floor_ms": bytes_moved / (spec["hbm_gbps"] * 1e9) * 1e3}


def roofline_report(measured_ms: Dict[str, float], chip: str = "v5e") -> str:
    """Format 'measured vs floor' lines given {kernel_name: (ms, floor_ms)}."""
    lines = []
    for name, (ms, floor) in measured_ms.items():
        frac = floor / ms if ms > 0 else 0.0
        lines.append(f"{name}: {ms:.3f} ms measured, {floor:.3f} ms floor "
                     f"-> {100*frac:.0f}% of speed-of-light")
    return "\n".join(lines)
