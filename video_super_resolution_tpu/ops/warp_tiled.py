"""Tiled shift-select backward warp — the TPU-fast formulation.

Why: XLA's (and Mosaic's) per-element gather is effectively scalarized on
TPU — measured 31 ms for a (2,544,960,4) warp on the v5e chip, ~30 ns per
index row, vs an HBM-bandwidth bound of ~0.1 ms. grid_sample is the
reference family's second custom CUDA op (SURVEY.md §2.1 #4), so a gather
that slow poisons both the flow pyramid and the final alignment warp.

Formulation (no per-pixel gather anywhere):

1. Tile the output into (TY, TX) tiles. Per tile, take the *integer base*
   of the flow: oy = min over the tile's VALID samples of (floor(sy) - y),
   ox likewise (validity below). Extract one input patch per tile of static
   shape (TY+rd+2, TX+rd+2) at dynamic offset (oy, ox) — a batched
   lax.dynamic_slice (cheap: gather cost scales with index-row count, and
   there are only H*W/(TY*TX) tiles, each copying a large contiguous-ish
   patch).
2. Per pixel, the remaining index is the *residual* ry = floor(sy)-y-oy,
   rx = floor(sx)-x-ox ∈ [0, rd]. The 4-tap bilinear read becomes a sum of
   (rd+2)^2 statically-shifted patch slices weighted by separable one-hot
   blend vectors:

       out[j,x] = sum_k sum_u vy[k] * vx[u] * patch[j+k, x+u]
       vy[k] = (1-wy)*[ry==k] + wy*[ry==k-1]     (vx analogous)

   Static slices + elementwise FMAs — exactly the shape of the cost-volume
   op, which XLA fuses to VPU-resident loops.

Validity (zeros padding semantics, and the reason the base must be a
*masked* min): a sample whose unclamped source coordinate lies outside
[-1, size] contributes exactly 0 in zeros mode. Its clamped coordinate
would otherwise produce a wildly wrong integer offset (e.g. the
replicate-padded tile margin beyond W, or flow pointing far off-image)
that poisons the per-tile min and blows every *valid* pixel's residual
budget. So per axis: dead samples (source beyond [-1, size], or grid
positions in the internal tile padding) are excluded from the min and
their blend weights are forced to 0. The zero-padded image then supplies
exact zeros for the partial taps of borderline-valid samples, identical
to the gather formulation.

Exactness: identical to the gather formulation (zeros padding mode,
align_corners=True pixel convention — ops/warp.py docstring) whenever the
in-tile integer-flow spread of valid samples fits the residual budget:
max-min of floor(s)-p within a TY x TX tile <= rd per axis. With the
default (8, 16) tile and rd=8 this tolerates flow gradients up to
~1.0 px/px in y and ~0.5 px/px in x — beyond smooth optical flow; only step
discontinuities at motion boundaries can overflow, and those pixels clamp
to the nearest representable tap (graceful, local). The exact gather path
stays available via backward_warp(impl="gather").

Gradients: the one-hots and masks are piecewise-constant (zero grad, like
floor); wy, wx carry the same d out/d flow as grid_sample; patches are
extracted by dynamic_slice whose transpose is a cheap large-slice
scatter-add. Plain autodiff therefore reproduces grid_sample's gradient
without a custom VJP.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp


def _ceil_to(x: int, m: int) -> int:
    return (x + m - 1) // m * m


@functools.partial(jax.jit, static_argnames=("rd", "ty", "tx"))
def warp_tiled(img: jax.Array, flow: jax.Array, rd: int = 8,
               ty: int = 8, tx: int = 16) -> jax.Array:
    """Bilinear backward warp, zeros padding mode: out(x) = img(x+flow(x)).

    Args:
      img: (B, H, W, C); flow: (B, H, W, 2) pixel displacements (dx, dy).
      rd: residual budget — exact while in-tile integer-flow spread <= rd.
      ty, tx: output tile shape.

    Returns (B, H, W, C) in img.dtype, f32 accumulation inside.
    """
    b, h, w, c = img.shape
    hp, wp = _ceil_to(h, ty), _ceil_to(w, tx)
    ny, nx = hp // ty, wp // tx

    # Pad the grid; flow replicate-padded so edge tiles keep coherent values
    # (the padded samples are masked dead below, so their values only need
    # to be finite).
    if (hp, wp) != (h, w):
        flow = jnp.pad(flow, ((0, 0), (0, hp - h), (0, wp - w), (0, 0)),
                       mode="edge")

    ys = jax.lax.broadcasted_iota(jnp.float32, (hp, wp), 0)
    xs = jax.lax.broadcasted_iota(jnp.float32, (hp, wp), 1)
    sx_raw = xs[None] + flow[..., 0].astype(jnp.float32)
    sy_raw = ys[None] + flow[..., 1].astype(jnp.float32)

    # Per-axis liveness: a sample is dead on an axis if its source lies at
    # or beyond the zero-contribution range [-1, size], or if it sits in
    # the internal tile padding (cropped at the end). Dead samples are
    # excluded from the base min and contribute 0.
    alive_x = (sx_raw >= -1.0) & (sx_raw <= float(w)) & (xs[None] < w)
    alive_y = (sy_raw >= -1.0) & (sy_raw <= float(h)) & (ys[None] < h)

    # Clamp source coords to [-1, size]: everything at or beyond that range
    # contributes exactly 0 through zero-padded taps, and the clamp keeps
    # every patch window in (padded-)bounds.
    sx = jnp.clip(sx_raw, -1.0, float(w))
    sy = jnp.clip(sy_raw, -1.0, float(h))
    x0 = jnp.floor(sx)
    y0 = jnp.floor(sy)

    def tile(a):  # (B, hp, wp) -> (B, ny, nx, ty, tx)
        return a.reshape(b, ny, ty, nx, tx).transpose(0, 1, 3, 2, 4)

    wx = tile(sx - x0)
    wy = tile(sy - y0)
    alive = tile((alive_x & alive_y).astype(jnp.float32))

    # Integer flow offsets (tap index minus output index), tiled.
    fy = tile((y0 - ys[None]).astype(jnp.int32))
    fx = tile((x0 - xs[None]).astype(jnp.int32))

    # Masked per-tile base: min over valid samples only. All-dead tiles
    # fall back to base size (any in-range value; their output is 0).
    big = jnp.int32(1 << 20)
    ax = tile(alive_x.astype(jnp.int32)) > 0
    ay = tile(alive_y.astype(jnp.int32)) > 0
    oy = jnp.min(jnp.where(ay, fy, big), axis=(3, 4))            # (B,ny,nx)
    ox = jnp.min(jnp.where(ax, fx, big), axis=(3, 4))
    oy = jax.lax.stop_gradient(jnp.minimum(oy, h))
    ox = jax.lax.stop_gradient(jnp.minimum(ox, w))
    ry = jnp.clip(fy - oy[..., None, None], 0, rd)
    rx = jnp.clip(fx - ox[..., None, None], 0, rd)

    # Zero-pad the image so every patch window is in range (zeros padding
    # also supplies the exact 0 taps of borderline-valid samples).
    kp, sp = ty + rd + 2, tx + rd + 2
    py, px = ty + rd + 2, tx + rd + 2
    imgp = jnp.pad(img, ((0, 0), (py, py), (px, px), (0, 0)))

    tile_y0 = jnp.arange(ny, dtype=jnp.int32)[None, :, None] * ty
    tile_x0 = jnp.arange(nx, dtype=jnp.int32)[None, None, :] * tx
    start_y = jnp.clip(oy + tile_y0 + py, 0, h + 2 * py - kp)
    start_x = jnp.clip(ox + tile_x0 + px, 0, w + 2 * px - sp)

    def slice_one(im, sy0, sx0):
        return jax.lax.dynamic_slice(im, (sy0, sx0, 0), (kp, sp, c))

    patches = jax.vmap(  # over batch
        jax.vmap(jax.vmap(slice_one, in_axes=(None, 0, 0)),
                 in_axes=(None, 0, 0))
    )(imgp, start_y, start_x)                     # (B, ny, nx, KP, SP, C)
    patches = patches.astype(jnp.float32)

    one = jnp.float32(1)
    # Precompute the separable blend vectors ONCE (vx does not depend on k,
    # vy not on u); fold the validity mask into vy. Inside the loop only the
    # slice + two FMAs remain — (rd+2)^2 of them, each over a (ty,tx,c) tile.
    vxs = [((one - wx) * (rx == u) + wx * (rx == (u - 1)))[..., None]
           for u in range(rd + 2)]
    vys = [((one - wy) * (ry == k) + wy * (ry == (k - 1)))
           * alive for k in range(rd + 2)]
    acc = jnp.zeros((b, ny, nx, ty, tx, c), jnp.float32)
    for k in range(rd + 2):
        row = None
        for u in range(rd + 2):
            sl = jax.lax.slice(
                patches, (0, 0, 0, k, u, 0),
                (b, ny, nx, k + ty, u + tx, c),
            )
            term = vxs[u] * sl
            row = term if row is None else row + term
        acc = acc + vys[k][..., None] * row

    out = acc.transpose(0, 1, 3, 2, 4, 5).reshape(b, hp, wp, c)
    return out[:, :h, :w].astype(img.dtype)
