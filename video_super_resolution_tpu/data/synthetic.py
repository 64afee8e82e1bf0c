"""Golden synthetic clips with analytically known flow (SURVEY.md §4.2).

Flow/warp/E2E tests should not need real datasets: a smooth random texture
translated by a known (dx, dy) per frame gives a clip whose ground-truth
optical flow is exactly that translation (away from borders).
"""

from __future__ import annotations

from typing import Tuple

import numpy as np

from video_super_resolution_tpu.data.degrade import degrade_bicubic


def _smooth_texture(h: int, w: int, rng: np.random.Generator,
                    octaves: int = 4) -> np.ndarray:
    """Band-limited random RGB texture in [0,1] — smooth enough for bilinear
    resampling to be near-exact under subpixel shifts."""
    img = np.zeros((h, w, 3), np.float64)
    for o in range(octaves):
        sh, sw = max(2, h >> (octaves - o)), max(2, w >> (octaves - o))
        coarse = rng.random((sh, sw, 3))
        ys = np.linspace(0, sh - 1, h)
        xs = np.linspace(0, sw - 1, w)
        y0 = np.floor(ys).astype(int)
        x0 = np.floor(xs).astype(int)
        y1 = np.minimum(y0 + 1, sh - 1)
        x1 = np.minimum(x0 + 1, sw - 1)
        wy = (ys - y0)[:, None, None]
        wx = (xs - x0)[None, :, None]
        up = (
            coarse[np.ix_(y0, x0)] * (1 - wy) * (1 - wx)
            + coarse[np.ix_(y0, x1)] * (1 - wy) * wx
            + coarse[np.ix_(y1, x0)] * wy * (1 - wx)
            + coarse[np.ix_(y1, x1)] * wy * wx
        )
        img += up / (2**o)
    img -= img.min()
    img /= img.max()
    return img.astype(np.float32)


def moving_gradient_clip(
    num_frames: int = 5,
    h: int = 64,
    w: int = 64,
    dx: float = 1.5,
    dy: float = -0.75,
    seed: int = 0,
) -> Tuple[np.ndarray, np.ndarray]:
    """Clip of a texture translating by (dx, dy) px/frame.

    Returns (frames (T,H,W,3) in [0,1], flow (2,) = per-frame (dx, dy)).
    Frame t samples the texture at position + t*(dx, dy) (backward warp from
    frame t to t+1 therefore uses flow (+dx, +dy)).
    """
    rng = np.random.default_rng(seed)
    pad = int(np.ceil(num_frames * max(abs(dx), abs(dy)))) + 4
    tex = _smooth_texture(h + 2 * pad, w + 2 * pad, rng)
    ys = np.arange(h) + pad
    xs = np.arange(w) + pad
    frames = []
    for t in range(num_frames):
        sy = ys + dy * t
        sx = xs + dx * t
        y0 = np.floor(sy).astype(int)
        x0 = np.floor(sx).astype(int)
        wy = (sy - y0)[:, None, None]
        wx = (sx - x0)[None, :, None]
        f = (
            tex[np.ix_(y0, x0)] * (1 - wy) * (1 - wx)
            + tex[np.ix_(y0, x0 + 1)] * (1 - wy) * wx
            + tex[np.ix_(y0 + 1, x0)] * wy * (1 - wx)
            + tex[np.ix_(y0 + 1, x0 + 1)] * wy * wx
        )
        frames.append(f.astype(np.float32))
    return np.stack(frames), np.array([dx, dy], np.float32)


def zooming_clip(
    num_frames: int = 5,
    h: int = 64,
    w: int = 64,
    zoom: float = 1.02,
    seed: int = 0,
) -> np.ndarray:
    """Clip of a texture zooming about its center by ``zoom`` per frame.

    Unlike pure translation, zoom gives a spatially VARYING flow
    (flow(x) = (zoom^t - 1) * (x - center)), i.e. a nonzero flow gradient
    of (zoom - 1) px/px per frame step — exercising the warp kernels'
    in-tile spread/tap budgets, which uniform translation never does.
    Returns frames (T, H, W, 3) in [0, 1].
    """
    rng = np.random.default_rng(seed)
    s_max = zoom ** (num_frames - 1) if zoom >= 1 else 1.0
    pad = int(np.ceil(max(h, w) * (s_max - 1) / 2)) + 4
    tex = _smooth_texture(h + 2 * pad, w + 2 * pad, rng)
    cy, cx = (h - 1) / 2 + pad, (w - 1) / 2 + pad
    ys = np.arange(h) + pad
    xs = np.arange(w) + pad
    frames = []
    for t in range(num_frames):
        s = zoom**t
        sy = cy + (ys - cy) * s
        sx = cx + (xs - cx) * s
        y0 = np.floor(sy).astype(int)
        x0 = np.floor(sx).astype(int)
        wy = (sy - y0)[:, None, None]
        wx = (sx - x0)[None, :, None]
        f = (
            tex[np.ix_(y0, x0)] * (1 - wy) * (1 - wx)
            + tex[np.ix_(y0, x0 + 1)] * (1 - wy) * wx
            + tex[np.ix_(y0 + 1, x0)] * wy * (1 - wx)
            + tex[np.ix_(y0 + 1, x0 + 1)] * wy * wx
        )
        frames.append(f.astype(np.float32))
    return np.stack(frames)


def synthetic_clip_pair(
    num_frames: int = 5, hr_h: int = 128, hr_w: int = 128, scale: int = 4,
    dx: float = 2.0, dy: float = -1.0, seed: int = 0,
) -> Tuple[np.ndarray, np.ndarray]:
    """(lr_frames (T,h,w,3), hr_frames (T,H,W,3)) with MATLAB-bicubic LR."""
    hr, _ = moving_gradient_clip(num_frames, hr_h, hr_w, dx, dy, seed)
    lr = degrade_bicubic(hr, scale)
    return lr, hr
