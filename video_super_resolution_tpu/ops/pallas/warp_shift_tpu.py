"""Pallas TPU kernel: tiled shift-select backward warp (SURVEY.md §2.3 row 2).

Replaces the reference family's Resample2d/grid_sample CUDA extension on the
hot path (the model's full-resolution frame+depth warp, C=4). Same algorithm
and exactness contract as ops/warp_tiled.py (masked per-tile integer base +
separable one-hot residual shift-select, zeros padding, align_corners pixel
convention) — but executed as a hand-written kernel, which removes the two
things that made the XLA formulation ~200x off the HBM bound on chip
(measured 30 ms in-context for (2,544,960,4) in r1/r2 profiling):

1. Per-tile patch extraction is a double-buffered async DMA from HBM at a
   dynamic offset (scalar-prefetched per-tile integer flow bases), not a
   vmapped dynamic_slice that XLA lowers to a scalarized gather.
2. The (rd_y+2)*(rd_x+2) shift-select terms run VMEM-resident on one patch
   per tile; nothing round-trips HBM between terms.

Layout — (W, C) packed jointly on the 128 lanes: a tile covers TX=128//C
pixel columns x C channels, so every vector register is fully dense with no
transposes anywhere (NHWC is already (H, W*C) row-major contiguous, so the
HBM view is a free reshape). Narrow (32-px for C=4) tiles keep the
horizontal residual budget rd_x small for realistic smooth-flow gradients —
the failure mode of a 128-px planar tile, whose in-tile spread at a modest
0.2 px/px flow gradient already needs rd_x ~ 26. Lane shifts are by
whole-pixel multiples of C; one vector relayout per dx term, hoisted to the
outer loop (the correlation kernel's lesson).

Channel counts: C <= 8 runs in packed mode (C padded to the nearest divisor
of 128: 1,2,4,8). Larger C (pyramid-feature warps) routes to the XLA tiled
formulation in ops/warp.backward_warp — those maps are 16-64x smaller than
the full-res warp.

Exactness: identical to warp_tiled wherever the in-tile integer-flow spread
of valid samples fits (rd_y, rd_x) per axis; beyond that, taps clamp to the
nearest representable offset (graceful, local; only step discontinuities at
motion boundaries exceed the budget for smooth optical flow). The default
(ty=8, tx=32, rd_y=8, rd_x=12) tolerates flow gradients up to ~1 px/px in y
and ~0.38 px/px in x. (Round 4 made the vertical budget exactly rd_y: the
8-row DMA quantization residue is now undone by an in-kernel roll instead
of widening the shift-select range — before, tiles lucky in their base
alignment tolerated up to rd_y+7.) backward_warp(impl="gather") remains
the always-exact path.

Backward: custom VJP recomputing through warp_tiled's autodiff (identical
clamping -> gradients consistent with this forward).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _ceil_to(x: int, m: int) -> int:
    return (x + m - 1) // m * m


def _warp_kernel(oy_ref, ox_ref, flow_ref, img_ref, out_ref, patches, sems,
                 *, h, w, p, ny, nx, ty, tx, rd_y, rd_x, kp, spl, py, px,
                 hp2, wp2, n_tiles):
    """One (TY, TX*P)-lane output tile per grid step. All lane positions are
    (pixel, channel)-packed; pixel index = lane // P."""
    t = pl.program_id(0)
    r = t % (ny * nx)
    iy = r // nx
    ix = r % nx
    txl = tx * p
    gx = 128 // p                       # x-granule (pixels) of a lane tile

    def get_dma(slot, tt):
        bb = tt // (ny * nx)
        rr = tt % (ny * nx)
        # Mosaic requires PROVABLY tile-aligned DMA starts on the last two
        # dims: oy/ox are quantized to 8-row / 128-lane granules here (the
        # in-kernel rolls below undo both shifts); every other term (tile
        # offsets, margins, clip bounds) is granule-aligned by construction,
        # and pl.multiple_of supplies the divisibility proof.
        oyq = oy_ref[tt] // 8 * 8
        sy = pl.multiple_of(
            jnp.clip(oyq + (rr // nx) * ty + py, 0, hp2 - kp), 8)
        oxq = ox_ref[tt] // gx * gx
        sx = jnp.clip(oxq + (rr % nx) * tx + px, 0, wp2 - spl // p)
        return pltpu.make_async_copy(
            img_ref.at[bb, pl.ds(sy, kp), pl.ds(pl.multiple_of(sx * p, 128),
                                                spl)],
            patches.at[slot],
            sems.at[slot],
        )

    @pl.when(t == 0)
    def _():
        get_dma(0, 0).start()

    @pl.when(t + 1 < n_tiles)
    def _():
        get_dma((t + 1) % 2, t + 1).start()

    get_dma(t % 2, t).wait()

    # --- per-pixel weights at lane resolution (flow arrives pixel-repeated
    # x P, so all math below is plain elementwise over (TY, TXL)) ---
    fl = flow_ref[0].astype(jnp.float32)                    # (2, TY, TXL)
    lane = jax.lax.broadcasted_iota(jnp.int32, (ty, txl), 1)
    ys = (iy * ty) + jax.lax.broadcasted_iota(jnp.int32, (ty, txl), 0)
    xs = (ix * tx) + lane // p
    sx_raw = xs.astype(jnp.float32) + fl[0]
    sy_raw = ys.astype(jnp.float32) + fl[1]
    alive = ((sx_raw >= -1.0) & (sx_raw <= float(w)) & (xs < w)
             & (sy_raw >= -1.0) & (sy_raw <= float(h)) & (ys < h))
    sxc = jnp.clip(sx_raw, -1.0, float(w))
    syc = jnp.clip(sy_raw, -1.0, float(h))
    x0 = jnp.floor(sxc)
    y0 = jnp.floor(syc)
    wx = sxc - x0
    wy = syc - y0
    fy = y0.astype(jnp.int32) - ys
    fx = x0.astype(jnp.int32) - xs
    # oy arrives UNQUANTIZED; the vertical 8-row DMA quantization residue is
    # undone by an in-kernel sublane roll below (round-4 dequantization:
    # the residual range used to widen by +7 rows, costing (rd_y+9) vs
    # (rd_y+2) shift-select terms — ~40% of the kernel's VPU work).
    ry = jnp.clip(fy - oy_ref[t], 0, rd_y + 1)
    rx = jnp.clip(fx - ox_ref[t], 0, rd_x)

    one = jnp.float32(1)
    alive_f = alive.astype(jnp.float32)

    # Per-tile residual ALIGNMENT + fast/slow dispatch (round-5 restructure,
    # VERDICT r4 next #2). (rd_y, rd_x) are worst-case BUDGETS; the actual
    # in-tile residual spread for smooth flow is tiny (0 for translation,
    # ~grad*tile_extent for zoom), so almost every shift-select term is
    # identically zero tile-wide. Subtracting the live-lane residual minimum
    # (u_lo, k_lo) re-anchors the residuals at 0, and the subtraction is
    # FREE: it folds into the dequantization rolls below (a bigger dynamic
    # shift, same two roll ops). One lax.cond per tile then picks between a
    # small static term grid ((KC+2) x (UC+2), covers spread <= (KC, UC))
    # and the full-budget static grid — numerics identical on both paths
    # (skipped terms are exact zeros; same f32 sum order per path).
    # Dead tiles (no live lanes): mins clamp into range, weights all zero.
    big = jnp.int32(1 << 20)
    u_lo = jnp.minimum(jnp.min(jnp.where(alive, rx, big)), rd_x)
    u_hi = jnp.max(jnp.where(alive, rx, jnp.int32(0)))
    k_lo = jnp.minimum(jnp.min(jnp.where(alive, ry, big)), rd_y + 1)
    k_hi = jnp.max(jnp.where(alive, ry, jnp.int32(0)))
    rx = rx - u_lo
    ry = ry - k_lo

    # undo the DMA-start quantization (8-row / lane-granule) AND the
    # residual anchor (k_lo rows / u_lo pixel lanes) in one rotation per
    # axis, so term (u, k) reads the patch at static offset (u*p, k). The
    # wrap regions at the end are never read — kp/spl carry the margin, and
    # the anchored max row/lane read is the same as the unanchored one
    # (anchor + shifted residual = original index).
    # NB: express left rotation as roll(len - r), NOT roll(-r): Mosaic
    # miscompiles negative dynamic shifts (measured on v5e: garbage lanes;
    # interpret mode handles both).
    vofs = oy_ref[t] - oy_ref[t] // 8 * 8 + k_lo
    rofs = (ox_ref[t] - ox_ref[t] // gx * gx + u_lo) * p
    pt = patches[t % 2][...]
    pt = pltpu.roll(pt, kp - vofs, 0)
    pt = pltpu.roll(pt, spl - rofs, 1).astype(jnp.float32)

    def select_terms(nu, nk):
        """Static (nu x nk) anchored shift-select term grid."""
        vys = [((one - wy) * (ry == k) + wy * (ry == (k - 1))) * alive_f
               for k in range(nk)]
        acc = jnp.zeros((ty, txl), jnp.float32)
        for u in range(nu):
            cols = jax.lax.slice_in_dim(pt, u * p, u * p + txl, axis=1)
            vx_u = (one - wx) * (rx == u) + wx * (rx == (u - 1))
            wsum = None
            for k in range(nk):
                wk = vx_u * vys[k]                          # (TY, TXL)
                win = jax.lax.slice_in_dim(cols, k, k + ty, axis=0)
                term = wk * win
                wsum = term if wsum is None else wsum + term
            acc = acc + wsum
        return acc

    import os as _os
    uc = min(int(_os.environ.get("VSR_WARP_FAST_UC", "2")), rd_x)
    kc = min(int(_os.environ.get("VSR_WARP_FAST_KC", "2")), rd_y)
    fast = (u_hi - u_lo <= uc) & (k_hi - k_lo <= kc)
    acc = jax.lax.cond(
        fast,
        lambda: select_terms(uc + 2, kc + 2),
        lambda: select_terms(rd_x + 2, rd_y + 2),
    )
    out_ref[0] = acc.astype(out_ref.dtype)


@functools.partial(jax.jit, static_argnames=("rd_y", "rd_x", "ty", "tx",
                                             "interpret"))
def _warp_shift_fwd(img: jax.Array, flow: jax.Array, rd_y: int, rd_x: int,
                    ty: int, tx: int, interpret: bool) -> jax.Array:
    b, h, w, c = img.shape
    # pack channels to the nearest divisor of 128 lanes
    p = 1
    while p < c:
        p *= 2
    if p > 8:
        raise ValueError(f"packed warp supports C<=8; got C={c}")
    tx = min(tx, 128 // p)  # keep the tile within one 128-lane register row
    if p != c:
        img = jnp.pad(img, ((0, 0), (0, 0), (0, 0), (0, p - c)))
    hp, wp = _ceil_to(h, ty), _ceil_to(w, tx)
    ny, nx = hp // ty, wp // tx
    n_tiles = b * ny * nx

    if (hp, wp) != (h, w):
        flow = jnp.pad(flow, ((0, 0), (0, hp - h), (0, wp - w), (0, 0)),
                       mode="edge")

    # ---- host-side (XLA) base computation: same math as warp_tiled ----
    ys = jax.lax.broadcasted_iota(jnp.float32, (hp, wp), 0)
    xs = jax.lax.broadcasted_iota(jnp.float32, (hp, wp), 1)
    sx_raw = xs[None] + flow[..., 0].astype(jnp.float32)
    sy_raw = ys[None] + flow[..., 1].astype(jnp.float32)
    alive_x = (sx_raw >= -1.0) & (sx_raw <= float(w)) & (xs[None] < w)
    alive_y = (sy_raw >= -1.0) & (sy_raw <= float(h)) & (ys[None] < h)
    sx = jnp.clip(sx_raw, -1.0, float(w))
    sy = jnp.clip(sy_raw, -1.0, float(h))
    fy = (jnp.floor(sy) - ys[None]).astype(jnp.int32)
    fx = (jnp.floor(sx) - xs[None]).astype(jnp.int32)

    def tile_min(vals, mask):
        # masked per-tile min via reshape + two-axis reduce, no transpose
        # (a transpose-fed reduce can deoptimize inside large programs)
        big = jnp.int32(1 << 20)
        v = jnp.where(mask, vals, big).reshape(b, ny, ty, nx, tx)
        return jnp.min(v, axis=(2, 4))                      # (B, ny, nx)

    oy = tile_min(fy, alive_y)
    ox = tile_min(fx, alive_x)
    # bases are passed UNQUANTIZED; the kernel quantizes the DMA start to
    # its 8-row / lane-granule alignment and undoes the residue with
    # in-kernel rolls (int32 floor-division floors toward -inf there, so
    # negative bases quantize down, never up)
    oy = jnp.minimum(oy, h).reshape(-1)                     # (B*ny*nx,)
    ox = jnp.minimum(ox, w).reshape(-1)

    # ---- zero-pad (free-reshape to (B, H, W*P) packed lanes) ----
    # patch DMA shape must be (8, 128)-tile-aligned (Mosaic requirement);
    # +7 rows absorb the vertical base quantization and +1 lane granule the
    # horizontal one (both realigned by the in-kernel rolls; the rolled
    # wrap margins are never read).
    kp = _ceil_to(ty + rd_y + 1 + 7, 8)
    spl = _ceil_to((tx + rd_x + 2) * p, 128) + 128
    sp_pix = spl // p
    py, px = kp, sp_pix
    hp2, wp2 = hp + 2 * py, wp + 2 * px
    img_p = jnp.pad(
        img, ((0, 0), (py, py + hp - h), (px, px + wp - w), (0, 0))
    ).reshape(b, hp2, wp2 * p)
    # flow, pixel-repeated x P on the minor axis -> all in-kernel weight math
    # runs directly at lane resolution
    flow_e = jnp.repeat(flow.transpose(0, 3, 1, 2), p, axis=-1)

    kern = functools.partial(
        _warp_kernel, h=h, w=w, p=p, ny=ny, nx=nx, ty=ty, tx=tx,
        rd_y=rd_y, rd_x=rd_x, kp=kp, spl=spl, py=py, px=px,
        hp2=hp2, wp2=wp2, n_tiles=n_tiles,
    )
    txl = tx * p
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(n_tiles,),
        in_specs=[
            pl.BlockSpec(
                (1, 2, ty, txl),
                lambda t, oyr, oxr: (t // (ny * nx), 0,
                                     (t % (ny * nx)) // nx, t % nx),
                memory_space=pltpu.VMEM,
            ),
            # the padded image must live in HBM (ANY let the compiler pick
            # VMEM, which both overflows and imposes tiled-slice rules)
            pl.BlockSpec(memory_space=pltpu.HBM),
        ],
        out_specs=pl.BlockSpec(
            (1, ty, txl),
            lambda t, oyr, oxr: (t // (ny * nx),
                                 (t % (ny * nx)) // nx, t % nx),
            memory_space=pltpu.VMEM,
        ),
        scratch_shapes=[
            pltpu.VMEM((2, kp, spl), img.dtype),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )
    out = pl.pallas_call(
        kern,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((b, hp, wp * p), img.dtype),
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=2 * n_tiles * ty * txl * (rd_y + 2) * (rd_x + 2),
            bytes_accessed=(img_p.size + flow_e.size + b * hp * wp * p) * 4,
            transcendentals=0,
        ),
    )(oy, ox, flow_e, img_p)
    return out.reshape(b, hp, wp, p)[:, :h, :w, :c]         # NHWC, cropped


import os as _os

# Round-5 serving defaults (chip sweep, artifacts/BENCH_KERNELS_r5.md):
# ty=32 quarters the grid-step count vs the r4 ty=8 — per-tile fixed costs
# (DMA issue/wait, dequant rolls, output write), not the select terms, were
# the wall once the fast path landed. rd_y=16 keeps the vertical clamp
# budget at 0.5 px/px over the taller tile (and measured LESS clamping than
# the r4 (ty=8, rd_y=8) config on hard flow: max|diff| 0.78 vs 0.95 at
# flow-scale 6). Smooth serving-class flow: 1.36 ms standalone at
# (2,544,960,4), bit-exact vs gather; was 3.43 ms in r4.
_TY_DEFAULT = int(_os.environ.get("VSR_WARP_TY", "32"))
_RDY_DEFAULT = int(_os.environ.get("VSR_WARP_RDY", "16"))


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3, 4, 5, 6))
def warp_shift_pallas(img: jax.Array, flow: jax.Array,
                      rd_y: int = _RDY_DEFAULT,
                      rd_x: int = 12, ty: int = _TY_DEFAULT, tx: int = 32,
                      interpret: bool = False) -> jax.Array:
    """Bilinear backward warp, zeros padding: out(x) = img(x + flow(x)).

    Contract of ops/warp_tiled.warp_tiled, executed as a Pallas TPU kernel.
    C must be <= 8 (packed-lane layout); shapes with h < ty or w < tx
    should route to warp_tiled/gather instead (ops/warp.backward_warp does).
    """
    return _warp_shift_fwd(img, flow, rd_y, rd_x, ty, tx, interpret)


def _vjp_fwd(img, flow, rd_y, rd_x, ty, tx, interpret):
    return _warp_shift_fwd(img, flow, rd_y, rd_x, ty, tx, interpret), \
        (img, flow)


def _vjp_bwd(rd_y, rd_x, ty, tx, interpret, res, g):
    img, flow = res
    from video_super_resolution_tpu.ops.warp_tiled import warp_tiled

    # rd budgets differ between warp_tiled (square rd) and this kernel;
    # use the max so the recomputed gradient covers the same taps.
    rd = max(rd_y, rd_x)
    _, vjp = jax.vjp(lambda a, f: warp_tiled(a, f, rd=rd), img, flow)
    return vjp(g)


warp_shift_pallas.defvjp(_vjp_fwd, _vjp_bwd)
