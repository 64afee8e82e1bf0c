"""LR degradation: MATLAB-style antialiased bicubic x1/scale downscale.

The VSR-dataset convention (Vid4/REDS LR generation) is MATLAB ``imresize``:
cubic a=-0.5, antialias, border-replicate accumulation. Runs through the
framework's own separable resize (ops/resize.py) so training-time on-the-fly
degradation and test fixtures share one implementation.
"""

from __future__ import annotations

import numpy as np

from video_super_resolution_tpu.ops.resize import resize_bicubic


def degrade_bicubic(hr: np.ndarray, scale: int) -> np.ndarray:
    """(..., H, W, 3) [0,1] -> (..., H/scale, W/scale, 3), MATLAB preset.

    Pinned to the host CPU backend: this runs inside the data loader, and
    dispatching the jitted resize to the accelerator would cost a device
    round trip per frame (measured ~25ms each through the axon tunnel —
    it silently made the input pipeline the training bottleneck).
    """
    import jax

    h, w = hr.shape[-3], hr.shape[-2]
    if h % scale or w % scale:
        raise ValueError(f"HR dims ({h},{w}) not divisible by scale {scale}")
    try:
        cpu = jax.devices("cpu")[0]
    except RuntimeError:
        cpu = None
    ctx = jax.default_device(cpu) if cpu is not None else _nullcontext()
    with ctx:
        out = resize_bicubic(
            np.asarray(hr, np.float32), h // scale, w // scale,
            a=-0.5, antialias=True, edge="replicate",
        )
        return np.clip(np.asarray(out), 0.0, 1.0)


class _nullcontext:
    def __enter__(self):
        return None

    def __exit__(self, *a):
        return False
