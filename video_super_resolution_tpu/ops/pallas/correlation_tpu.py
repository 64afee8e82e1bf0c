"""Pallas TPU kernel: local cost-volume correlation (SURVEY.md §2.3 row 1).

Replaces the reference family's `correlation_package` CUDA extension. Layout
design (SURVEY.md §7.2-2, revised after Mosaic alignment findings):

- Pyramid features have SMALL channel counts (16..128). Channels-last would
  lane-pad C to 128 (up to 8x memory/bandwidth waste) and Mosaic refuses
  memref slices whose minor dim isn't a 128 multiple. So the kernel runs in
  **(B, C, H, W) layout with W on the lanes**, W padded to a 128 multiple by
  the caller; C sits on sublane-major dims where reduction is cheap.
- Grid (B, H-tiles). Per program: the f1 tile (C, TH, Wp) streams in via
  BlockSpec; the whole padded f2 plane (C, Hp, Wp) has a constant index map
  so Mosaic keeps it VMEM-resident across H-tiles of the same batch item —
  every one of the K=(2d+1)^2 displacement windows reads VMEM, not HBM.
- Displacements: static unroll. dy selects an aligned-ish row window via
  pl.ds on the ref (rows only; lanes stay full-width), dx is a lane shift
  done with a static jnp slice of the loaded value.
- Output (B, K, H, W) — K on a sublane-major dim, not lanes, so 81 channels
  cost no padding; the public wrapper transposes back to channels-last.

The whole-plane residency bounds applicability: if (C, Hp, Wp) exceeds the
VMEM budget the wrapper falls back to the XLA formulation (same numerics).

Backward: custom VJP by recompute through the XLA formulation (f32
accumulation both ways).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_VMEM_PLANE_BUDGET = 10 * 1024 * 1024


def _round_up(x: int, m: int) -> int:
    return (x + m - 1) // m * m


def _corr_kernel(f1_ref, f2p_ref, out_ref, *, d, th, strip, w, wp, c, inv_c):
    i = pl.program_id(1)
    f1 = f1_ref[0].astype(jnp.float32)                    # (C, TH, Wp)
    base = pl.multiple_of(i * th, th)
    # One aligned ref read per program (start/length multiples of the 8-row
    # sublane tile); per-displacement windows are static slices of the VALUE.
    rows_all = f2p_ref[0, :, pl.ds(base, strip), :].astype(jnp.float32)
    # Lane shifts (dx) force a vector relayout; sublane shifts (dy) are cheap.
    # Hoist dx to the outer loop: 2d+1 lane relayouts instead of (2d+1)^2.
    nd = 2 * d + 1
    outs = [None] * (nd * nd)
    for dx in range(nd):
        cols = jax.lax.slice_in_dim(rows_all, dx, dx + wp, axis=2)
        for dy in range(nd):
            win = jax.lax.slice_in_dim(cols, dy, dy + th, axis=1)
            outs[dy * nd + dx] = jnp.sum(f1 * win, axis=0) * inv_c  # (TH, Wp)
    out_ref[0] = jnp.stack(outs, axis=0)                  # (K, TH, Wp)


def _correlation_fwd_pallas(f1: jax.Array, f2: jax.Array, d: int,
                            interpret: bool = False) -> jax.Array:
    b, h, w, c = f1.shape
    k = (2 * d + 1) ** 2
    if h % 8:
        # Mosaic blocks need an 8-row tile. Zero-padding H is EXACT here:
        # out-of-range f2 samples contribute 0 by the zeros-boundary
        # semantics, padded f1 rows only produce extra output rows that
        # are cropped. (Round 3: the earlier XLA fallback for H%8 left the
        # L2-L4 pyramid correlations on the in-context-pathological XLA
        # sweep — see ops/correlation.py.)
        hp8 = _round_up(h, 8)
        pad = ((0, 0), (0, hp8 - h), (0, 0), (0, 0))
        out = _correlation_fwd_pallas(jnp.pad(f1, pad), jnp.pad(f2, pad), d,
                                      interpret)
        return out[:, :h]
    th = 8

    wp = _round_up(w, 128)
    wp2 = _round_up(wp + 2 * d, 128)
    strip = _round_up(th + 2 * d, 8)      # aligned per-program row window
    h2 = h - th + strip                   # padded f2 height so every strip fits
    plane_bytes = c * h2 * wp2 * 4
    if plane_bytes > _VMEM_PLANE_BUDGET and not interpret:
        from video_super_resolution_tpu.ops.correlation import _correlation_xla

        return _correlation_xla(f1, f2, d)

    # NHWC -> NCHW, pad W to lane multiples; pad f2 by d on top and by the
    # strip-alignment remainder at the bottom.
    f1_t = jnp.pad(f1.transpose(0, 3, 1, 2), ((0, 0), (0, 0), (0, 0), (0, wp - w)))
    f2_t = jnp.pad(
        f2.transpose(0, 3, 1, 2),
        ((0, 0), (0, 0), (d, h2 - h - d), (d, wp2 - w - d)),
    )

    out = pl.pallas_call(
        functools.partial(_corr_kernel, d=d, th=th, strip=strip, w=w, wp=wp,
                          c=c, inv_c=1.0 / c),
        grid=(b, h // th),
        in_specs=[
            pl.BlockSpec((1, c, th, wp), lambda bi, hi: (bi, 0, hi, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, c, h2, wp2), lambda bi, hi: (bi, 0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, k, th, wp), lambda bi, hi: (bi, 0, hi, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, k, h, wp), jnp.float32),
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=2 * b * h * wp * c * k,
            bytes_accessed=(f1_t.size + f2_t.size) * 4 + b * h * wp * k * 4,
            transcendentals=0,
        ),
    )(f1_t, f2_t)
    return out[..., :w].transpose(0, 2, 3, 1)             # (B, H, W, K)


def _xla_reference(f1, f2, d):
    from video_super_resolution_tpu.ops.correlation import _correlation_xla

    return _correlation_xla(f1, f2, d)


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3))
def correlation_pallas(f1: jax.Array, f2: jax.Array, max_displacement: int = 4,
                       interpret: bool = False) -> jax.Array:
    """Pallas cost volume; same contract as ops.correlation.correlation."""
    return _correlation_fwd_pallas(f1, f2, max_displacement, interpret)


def _fwd(f1, f2, d, interpret):
    return _correlation_fwd_pallas(f1, f2, d, interpret), (f1, f2)


def _bwd(d, interpret, res, g):
    f1, f2 = res
    _, vjp = jax.vjp(lambda a, b: _xla_reference(a, b, d), f1, f2)
    return vjp(g)


correlation_pallas.defvjp(_fwd, _bwd)
