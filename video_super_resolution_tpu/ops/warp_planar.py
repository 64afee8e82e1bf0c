"""Planar-layout tiled shift-select warp — layout experiment vs warp_tiled.

Same algorithm and exactness contract as ops/warp_tiled.py (masked per-tile
integer base + one-hot residual shift-select, zeros padding), but the
arrays are arranged so the minor (lane) dimension is SPATIAL, not the tiny
channel count:

  patches: (B, nH, nX, C, KP, SP)   — lanes = SP (patch width)
  tiles:   (B, nH, nX, C, TY, TX)   — lanes = TX

warp_tiled keeps C as the minor dim; with the model's C=4 frame+depth warp
that lane-pads 4 -> 128 (32x wasted VPU work / memory), which measured
24.6 ms on chip for (2,540,960,3) vs an HBM bound of 0.025 ms. Here the
lane dim is TX/SP, like the correlation op's layout that runs within a few
x of the VPU roofline in XLA.

Budget defaults (ty=8, tx=32, rd_y=8, rd_x=12): exact while the in-tile
integer-flow spread fits — up to ~1 px/px flow gradient in y and ~0.38 in
x. (rd_y+2)*(rd_x+2) = 140 shift-select terms.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp


def _ceil_to(x: int, m: int) -> int:
    return (x + m - 1) // m * m


@functools.partial(jax.jit, static_argnames=("rd_y", "rd_x", "ty", "tx"))
def warp_planar(img: jax.Array, flow: jax.Array, rd_y: int = 8,
                rd_x: int = 12, ty: int = 8, tx: int = 32) -> jax.Array:
    """Bilinear backward warp, zeros padding: out(x) = img(x + flow(x)).

    Same contract as ops/warp_tiled.warp_tiled (see its docstring); planar
    layout internally.
    """
    b, h, w, c = img.shape
    hp, wp = _ceil_to(h, ty), _ceil_to(w, tx)
    ny, nx = hp // ty, wp // tx

    if (hp, wp) != (h, w):
        flow = jnp.pad(flow, ((0, 0), (0, hp - h), (0, wp - w), (0, 0)),
                       mode="edge")

    ys = jax.lax.broadcasted_iota(jnp.float32, (hp, wp), 0)
    xs = jax.lax.broadcasted_iota(jnp.float32, (hp, wp), 1)
    sx_raw = xs[None] + flow[..., 0].astype(jnp.float32)
    sy_raw = ys[None] + flow[..., 1].astype(jnp.float32)

    alive_x = (sx_raw >= -1.0) & (sx_raw <= float(w)) & (xs[None] < w)
    alive_y = (sy_raw >= -1.0) & (sy_raw <= float(h)) & (ys[None] < h)

    sx = jnp.clip(sx_raw, -1.0, float(w))
    sy = jnp.clip(sy_raw, -1.0, float(h))
    x0 = jnp.floor(sx)
    y0 = jnp.floor(sy)

    def tile(a):  # (B, hp, wp) -> (B, ny, nx, ty, tx)
        return a.reshape(b, ny, ty, nx, tx).transpose(0, 1, 3, 2, 4)

    wx = tile(sx - x0)
    wy = tile(sy - y0)
    alive = tile((alive_x & alive_y).astype(jnp.float32))

    fy = tile((y0 - ys[None]).astype(jnp.int32))
    fx = tile((x0 - xs[None]).astype(jnp.int32))

    big = jnp.int32(1 << 20)
    ay = tile(alive_y.astype(jnp.int32)) > 0
    ax = tile(alive_x.astype(jnp.int32)) > 0
    oy = jnp.min(jnp.where(ay, fy, big), axis=(3, 4))            # (B,ny,nx)
    ox = jnp.min(jnp.where(ax, fx, big), axis=(3, 4))
    oy = jax.lax.stop_gradient(jnp.minimum(oy, h))
    ox = jax.lax.stop_gradient(jnp.minimum(ox, w))
    ry = jnp.clip(fy - oy[..., None, None], 0, rd_y)
    rx = jnp.clip(fx - ox[..., None, None], 0, rd_x)

    kp, sp = ty + rd_y + 2, tx + rd_x + 2
    py, px = kp, sp
    # planar image: (B, C, Hp, Wp) zero-padded
    imgp = jnp.pad(img.transpose(0, 3, 1, 2),
                   ((0, 0), (0, 0), (py, py), (px, px)))

    tile_y0 = jnp.arange(ny, dtype=jnp.int32)[None, :, None] * ty
    tile_x0 = jnp.arange(nx, dtype=jnp.int32)[None, None, :] * tx
    start_y = jnp.clip(oy + tile_y0 + py, 0, h + 2 * py - kp)
    start_x = jnp.clip(ox + tile_x0 + px, 0, w + 2 * px - sp)

    def slice_one(im, sy0, sx0):  # im: (C, Hp, Wp) -> (C, KP, SP)
        return jax.lax.dynamic_slice(im, (0, sy0, sx0), (c, kp, sp))

    patches = jax.vmap(
        jax.vmap(jax.vmap(slice_one, in_axes=(None, 0, 0)),
                 in_axes=(None, 0, 0))
    )(imgp, start_y, start_x)                    # (B, ny, nx, C, KP, SP)
    patches = patches.astype(jnp.float32)

    one = jnp.float32(1)
    # weights get a C axis broadcast on a major dim (size-1), lanes stay TX
    wxb = wx[:, :, :, None]
    wyb = wy[:, :, :, None]
    aliveb = alive[:, :, :, None]
    ryb = ry[:, :, :, None]
    rxb = rx[:, :, :, None]
    acc = jnp.zeros((b, ny, nx, c, ty, tx), jnp.float32)
    for k in range(rd_y + 2):
        vy = (one - wyb) * (ryb == k) + wyb * (ryb == (k - 1))
        row = None
        for u in range(rd_x + 2):
            vx = (one - wxb) * (rxb == u) + wxb * (rxb == (u - 1))
            sl = jax.lax.slice(
                patches, (0, 0, 0, 0, k, u),
                (b, ny, nx, c, k + ty, u + tx),
            )
            term = (vx * aliveb) * sl
            row = term if row is None else row + term
        acc = acc + vy * row

    out = acc.transpose(0, 1, 4, 2, 5, 3).reshape(b, hp, wp, c)
    return out[:, :h, :w].astype(img.dtype)
