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
    """(..., H, W, 3) [0,1] -> (..., H/scale, W/scale, 3), MATLAB preset."""
    h, w = hr.shape[-3], hr.shape[-2]
    if h % scale or w % scale:
        raise ValueError(f"HR dims ({h},{w}) not divisible by scale {scale}")
    out = resize_bicubic(
        np.asarray(hr, np.float32), h // scale, w // scale,
        a=-0.5, antialias=True, edge="replicate",
    )
    return np.clip(np.asarray(out), 0.0, 1.0)
