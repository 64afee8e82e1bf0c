"""Flow-guided backward warp (grid-sample) — SURVEY.md §2.1 #4.

The reference family warps neighbor frames/features onto the reference frame
with ``F.grid_sample`` (or a Resample2d CUDA ext): bilinear sample of the
input at ``x + flow(x)``. Torch-semantics knobs that are parity-critical
(SURVEY.md §7.2-3) are explicit arguments here and pinned by tests against
the torch oracle:

- ``align_corners=True`` grid normalization (the 2019-era torch default).
- padding mode: "zeros" (out-of-bounds taps contribute 0) or "border"
  (coordinates clamped to the edge).

Flow convention: ``flow[..., 0]`` displaces along W (x), ``flow[..., 1]``
along H (y), in pixels.

XLA formulation: one flattened-HW gather of the 4 bilinear taps + blend.
Fully differentiable (gather transposes to scatter-add). The Pallas kernel
(``ops/pallas/warp_shift_tpu.py``) replaces the gather with per-tile
DMA'd patches + shift-select for the hot path.
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp


@functools.partial(
    jax.jit, static_argnames=("padding_mode", "use_pallas", "impl")
)
def backward_warp(
    img: jax.Array,
    flow: jax.Array,
    padding_mode: str = "zeros",
    use_pallas: bool = False,
    impl: str = "auto",
) -> jax.Array:
    """Bilinear backward warp: out(x) = img(x + flow(x)).

    Args:
      img: (B, H, W, C) input to sample from.
      flow: (B, H, W, 2) pixel displacements (dx, dy).
      padding_mode: "zeros" | "border".
      use_pallas: equivalent to impl="pallas".
      impl: "auto" | "pallas" | "tiled" | "gather".
        "pallas" is the hand-written shift-select TPU kernel
        (ops/pallas/warp_shift_tpu.py) — zeros mode, exact for smooth flow
        (same domain as "tiled"); small shapes route to "tiled"
        automatically. "tiled" is the pure-XLA shift-select formulation
        (ops/warp_tiled.py). "gather" is the per-pixel-exact XLA gather for
        arbitrary flow (slow on TPU: the gather scalarizes). "auto" =
        gather, the always-exact path; model call sites opt into
        "pallas"/"tiled" where the flow is known-smooth and the warp is hot.

    Returns:
      (B, H, W, C) warped image, dtype of ``img``.
    """
    if padding_mode not in ("zeros", "border"):
        raise ValueError(f"bad padding_mode {padding_mode}")
    if impl not in ("auto", "pallas", "tiled", "gather", "identity"):
        raise ValueError(f"bad impl {impl}")
    if impl == "identity":
        # DEBUG ONLY: skip the warp (wrong numerics) — isolates the warp's
        # true in-context cost in profiling.
        return img + 0.0 * flow[..., :1]
    if use_pallas:
        impl = "pallas"
    if impl in ("pallas", "tiled"):
        if padding_mode != "zeros":
            raise ValueError(f"impl={impl!r} supports only zeros padding")
        b, h, w, c = img.shape
        # packed-lane kernel: C<=8 (the model's hot frame+depth warp is
        # C=4); larger-C feature warps use an XLA formulation.
        # Off-TPU the kernel would run in the (slow, emulated) interpreter,
        # so model-level "pallas" falls back to the numerically-equivalent
        # tiled path there; kernel tests call warp_shift_pallas directly
        # with interpret=True (VSR_PALLAS_INTERPRET=1 forces it here too).
        from video_super_resolution_tpu.ops.pallas.util import should_interpret

        interp = should_interpret()
        forced = os.environ.get("VSR_PALLAS_INTERPRET", "") == "1"
        if (impl == "pallas" and h >= 8 and w >= 64 and c <= 8
                and (not interp or forced)):
            from video_super_resolution_tpu.ops.pallas.warp_shift_tpu import (
                warp_shift_pallas,
            )

            return warp_shift_pallas(img, flow, interpret=interp)
        # Small maps: the exact XLA gather wins — its cost scales with the
        # index-row count, and the tiled shift-select's fixed (rd+2)^2 term
        # sweep dominates below ~128k pixels (measured in-context on chip,
        # tools/debug_warp_ctx.py: the three pyramid-level feature warps
        # cost 9.6 ms as tiled vs 1.1 ms as gather). Big maps flip: at
        # (2,544,960,·) tiled ~29 ms vs gather ~36 ms in-context.
        # impl="tiled" deliberately BYPASSES this size heuristic: it is an
        # explicit request for the XLA shift-select formulation (used by the
        # warp bisect tooling to measure that path in isolation); production
        # call sites pass "pallas", which owns the routing.
        if impl == "pallas" and b * h * w <= (1 << 17):
            return _warp_xla(img, flow, padding_mode)
        from video_super_resolution_tpu.ops.warp_tiled import warp_tiled

        return warp_tiled(img, flow)
    return _warp_xla(img, flow, padding_mode)


def _warp_xla(img: jax.Array, flow: jax.Array, padding_mode: str) -> jax.Array:
    b, h, w, c = img.shape
    dtype = img.dtype
    # Sample coordinates in f32 pixel space.
    ys = jax.lax.broadcasted_iota(jnp.float32, (h, w), 0)
    xs = jax.lax.broadcasted_iota(jnp.float32, (h, w), 1)
    sx = xs[None] + flow[..., 0].astype(jnp.float32)   # (B,H,W)
    sy = ys[None] + flow[..., 1].astype(jnp.float32)

    x0 = jnp.floor(sx)
    y0 = jnp.floor(sy)
    wx = sx - x0
    wy = sy - y0

    def tap(yi, xi):
        """Gather img[b, yi, xi, :] with clamped indices; returns tap + validity."""
        valid = (xi >= 0) & (xi <= w - 1) & (yi >= 0) & (yi <= h - 1)
        xc = jnp.clip(xi, 0, w - 1).astype(jnp.int32)
        yc = jnp.clip(yi, 0, h - 1).astype(jnp.int32)
        flat = img.reshape(b, h * w, c)
        idx = yc * w + xc                              # (B,H,W)
        g = jnp.take_along_axis(
            flat, idx.reshape(b, h * w, 1), axis=1
        ).reshape(b, h, w, c)
        return g, valid

    t00, v00 = tap(y0, x0)
    t01, v01 = tap(y0, x0 + 1)
    t10, v10 = tap(y0 + 1, x0)
    t11, v11 = tap(y0 + 1, x0 + 1)

    w00 = ((1 - wy) * (1 - wx))[..., None]
    w01 = ((1 - wy) * wx)[..., None]
    w10 = (wy * (1 - wx))[..., None]
    w11 = (wy * wx)[..., None]

    if padding_mode == "zeros":
        # Each tap contributes only if in-bounds (torch zeros semantics).
        t00 = jnp.where(v00[..., None], t00, 0)
        t01 = jnp.where(v01[..., None], t01, 0)
        t10 = jnp.where(v10[..., None], t10, 0)
        t11 = jnp.where(v11[..., None], t11, 0)
    # "border": clamped indices already implement it.

    out = (
        w00 * t00.astype(jnp.float32)
        + w01 * t01.astype(jnp.float32)
        + w10 * t10.astype(jnp.float32)
        + w11 * t11.astype(jnp.float32)
    )
    return out.astype(dtype)
