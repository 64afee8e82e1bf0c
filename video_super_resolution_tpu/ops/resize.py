"""Separable bilinear/bicubic resize with pinned semantics.

Parity-critical (SURVEY.md §7.2-3): the bicubic downscale used to generate LR
frames and the upsampled skip connection can each blow the ±0.05 dB budget if
their conventions drift. This module pins them explicitly:

- ``resize_bicubic(..., a=-0.5, antialias=True)``  — MATLAB/PIL-style
  ``imresize`` (the VSR-dataset convention for LR generation).
- ``resize_bicubic(..., a=-0.75, antialias=False)`` — torch
  ``F.interpolate(mode="bicubic", align_corners=False)``.
- ``resize_bilinear`` — torch ``F.interpolate(mode="bilinear")``.

Formulation: separable 1-D resamples along H then W. For each output index we
precompute (at trace time, shapes are static) a fixed-width tap window —
first-tap indices (out,) and tap weights (out, K) — then the resample is a
K-tap gather + weighted sum per axis. No dense (out, in) matrix, no dynamic
shapes; K is ~4 for upsampling and ~4·scale for antialiased downscale.
Out-of-range taps clamp to the border (replicate) with weights renormalized,
matching MATLAB/torch edge behavior.
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
import numpy as np


def _cubic_kernel(x: np.ndarray, a: float) -> np.ndarray:
    ax = np.abs(x)
    ax2, ax3 = ax * ax, ax * ax * ax
    w = np.where(
        ax <= 1,
        (a + 2) * ax3 - (a + 3) * ax2 + 1,
        np.where(ax < 2, a * ax3 - 5 * a * ax2 + 8 * a * ax - 4 * a, 0.0),
    )
    return w


def _linear_kernel(x: np.ndarray) -> np.ndarray:
    ax = np.abs(x)
    return np.maximum(1 - ax, 0.0)


def _resample_weights(in_size: int, out_size: int, kernel: str, a: float,
                      antialias: bool, align_corners: bool, edge: str):
    """Tap indices/weights for one axis. Returns (idx (out,K) int32, w (out,K) f32).

    edge="replicate": out-of-range taps clamp to the border (MATLAB imresize).
    edge="exclude":   out-of-range taps dropped, weights renormalized over the
                      in-range taps (PIL / torch ``antialias=True``).
    """
    scale = in_size / out_size
    support = 2.0 if kernel == "cubic" else 1.0
    # Antialias widens the kernel by the downscale factor.
    s = max(scale, 1.0) if (antialias and scale > 1.0) else 1.0
    k_width = int(math.ceil(support * s)) * 2 + 2
    out_idx = np.arange(out_size, dtype=np.float64)
    if align_corners and out_size > 1:
        centers = out_idx * (in_size - 1) / (out_size - 1)
    else:
        centers = (out_idx + 0.5) * scale - 0.5
    first = np.floor(centers - support * s) + 1  # leftmost tap
    taps = first[:, None] + np.arange(k_width)[None, :]          # (out, K)
    dist = (centers[:, None] - taps) / s
    if kernel == "cubic":
        w = _cubic_kernel(dist, a)
    else:
        w = _linear_kernel(dist)
    if edge == "exclude":
        w = np.where((taps < 0) | (taps > in_size - 1), 0.0, w)
    wsum = w.sum(axis=1, keepdims=True)
    w = w / np.where(wsum == 0, 1.0, wsum)
    idx = np.clip(taps, 0, in_size - 1).astype(np.int32)
    return jnp.asarray(idx), jnp.asarray(w.astype(np.float32))


def upsample_bilinear_ps(x: jax.Array, r: int) -> jax.Array:
    """Integer-factor bilinear x`r` upsample of NHWC, PRE-SHUFFLE form.

    Returns (B, H, W, C*r^2) with torch pixel-shuffle channel order
    (c*r^2 + py*r + px); ``pixel_shuffle(result, r)`` equals
    ``resize_bilinear(x, H*r, W*r)`` bit-for-bit (same blend order as the
    separable two-pass). Why: the two-pass axis interleave materializes
    phase stacks at FULL output resolution (~1 GB of relayout traffic for a
    540p->4K x4 skip, measured 4.4 ms on v5e); this form computes all r^2
    phase blends at LOW resolution — XLA fuses them into one pass over the
    input — and defers the interleave to a single depth-to-space (which the
    SR head can further fold into its own subpixel shuffle for free).
    """
    b, h, w, c = x.shape
    xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)), mode="edge")
    xp = xp.astype(jnp.float32)

    def taps(p: int):
        center = (p + 0.5) / r - 0.5
        lo = math.floor(center)
        return lo, center - lo

    phases = []
    for py in range(r):
        ly, fy = taps(py)
        # keep the W padding through the H blend; slice W per phase below
        top = jax.lax.slice(xp, (0, ly + 1, 0, 0), (b, ly + 1 + h, w + 2, c))
        bot = jax.lax.slice(xp, (0, ly + 2, 0, 0), (b, ly + 2 + h, w + 2, c))
        # identical blend order to the separable two-pass (H then W)
        hrow = top * (1.0 - fy) + bot * fy if fy else top
        for px in range(r):
            lx, fx = taps(px)
            left = jax.lax.slice(hrow, (0, 0, lx + 1, 0),
                                 (b, h, lx + 1 + w, c))
            right = jax.lax.slice(hrow, (0, 0, lx + 2, 0),
                                  (b, h, lx + 2 + w, c))
            phases.append(left * (1.0 - fx) + right * fx if fx else left)
    st = jnp.stack(phases, axis=-1)              # (B,H,W,C,r^2) order (py,px)
    return st.reshape(b, h, w, c * r * r)


def _upsample_axis_int_linear(x: jax.Array, axis: int, r: int) -> jax.Array:
    """Integer-factor bilinear upsample along one axis, gather-free.

    align_corners=False phase decomposition: output index i = j*r + p has
    center (p + 0.5)/r - 0.5 relative to block j — the two tap offsets and
    weights depend only on the phase p, so each phase is an elementwise
    blend of x and its unit shift (edge-replicated), and phases interleave
    with a reshape. On TPU this is pad + static slices + relayout: no
    gather, fuses into neighbors.
    """
    in_size = x.shape[axis]
    # edge-replicate one element on both sides, unit shifts become slices
    pad = [(0, 0)] * x.ndim
    pad[axis] = (1, 1)
    xp = jnp.pad(x, pad, mode="edge")
    x32 = None
    phases = []
    for p in range(r):
        center = (p + 0.5) / r - 0.5
        lo = math.floor(center)
        frac = center - lo
        # taps at in-index j+lo and j+lo+1  ->  xp slices [j+lo+1], [j+lo+2]
        i0 = jax.lax.slice_in_dim(xp, lo + 1, lo + 1 + in_size, axis=axis)
        i1 = jax.lax.slice_in_dim(xp, lo + 2, lo + 2 + in_size, axis=axis)
        phases.append(
            i0.astype(jnp.float32) * (1.0 - frac)
            + i1.astype(jnp.float32) * frac
        )
    # interleave: stack phases on a new axis right after `axis`, then merge
    st = jnp.stack(phases, axis=axis + 1)
    new_shape = list(x.shape)
    new_shape[axis] = in_size * r
    return st.reshape(new_shape)


def _resample_axis(x: jax.Array, axis: int, out_size: int, kernel: str,
                   a: float, antialias: bool, align_corners: bool,
                   edge: str = "replicate") -> jax.Array:
    in_size = x.shape[axis]
    if in_size == out_size and not antialias:
        return x
    if (
        kernel == "linear" and not antialias and not align_corners
        and edge == "replicate" and out_size % in_size == 0
    ):
        return _upsample_axis_int_linear(x, axis, out_size // in_size)
    if (
        kernel == "linear" and not antialias and not align_corners
        and in_size == 2 * out_size
    ):
        # exact 1/2 bilinear: tap centers fall midway between pixel pairs,
        # weights (0.5, 0.5) -> a reshape-mean (no gather)
        shape = list(x.shape)
        shape[axis] = out_size
        shape.insert(axis + 1, 2)
        return jnp.mean(x.astype(jnp.float32).reshape(shape), axis=axis + 1)
    idx, w = _resample_weights(in_size, out_size, kernel, a, antialias,
                               align_corners, edge)
    k_width = idx.shape[1]
    # gathered[k] = take(x, idx[:, k], axis); accumulate w[:, k] * gathered.
    wshape = [1] * x.ndim
    wshape[axis] = out_size
    out = None
    for k in range(k_width):
        g = jnp.take(x, idx[:, k], axis=axis).astype(jnp.float32)
        wk = w[:, k].reshape(wshape)
        out = g * wk if out is None else out + g * wk
    return out


@functools.partial(
    jax.jit,
    static_argnames=("out_h", "out_w", "a", "antialias", "align_corners", "edge"),
)
def resize_bicubic(x: jax.Array, out_h: int, out_w: int, a: float = -0.5,
                   antialias: bool = True, align_corners: bool = False,
                   edge: str = "replicate") -> jax.Array:
    """Bicubic resize of NHWC (or HWC / HW) arrays. See module docstring for presets."""
    dtype = x.dtype
    h_ax = x.ndim - 3 if x.ndim >= 3 else 0
    w_ax = h_ax + 1
    y = _resample_axis(x, h_ax, out_h, "cubic", a, antialias, align_corners, edge)
    y = _resample_axis(y, w_ax, out_w, "cubic", a, antialias, align_corners, edge)
    return y.astype(dtype)


@functools.partial(
    jax.jit,
    static_argnames=("out_h", "out_w", "antialias", "align_corners", "edge"),
)
def resize_bilinear(x: jax.Array, out_h: int, out_w: int,
                    antialias: bool = False, align_corners: bool = False,
                    edge: str = "replicate") -> jax.Array:
    dtype = x.dtype
    h_ax = x.ndim - 3 if x.ndim >= 3 else 0
    w_ax = h_ax + 1
    if (
        x.ndim == 4 and not antialias and not align_corners
        and edge == "replicate" and out_h % x.shape[1] == 0
        and out_w % x.shape[2] == 0 and out_h // x.shape[1] > 1
        and out_h // x.shape[1] == out_w // x.shape[2]
    ):
        from video_super_resolution_tpu.ops.pixel_shuffle import pixel_shuffle

        r = out_h // x.shape[1]
        return pixel_shuffle(upsample_bilinear_ps(x, r), r).astype(dtype)
    y = _resample_axis(x, h_ax, out_h, "linear", 0.0, antialias, align_corners, edge)
    y = _resample_axis(y, w_ax, out_w, "linear", 0.0, antialias, align_corners, edge)
    return y.astype(dtype)
