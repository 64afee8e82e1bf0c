"""Pallas TPU kernel: bilinear backward warp (SURVEY.md §2.3 row 2).

Replaces the reference family's Resample2d/grid_sample CUDA path. Design
(SURVEY.md §7.2-1): TPU has no efficient arbitrary HBM gather, so the kernel
brings the *entire* image for one batch element into VMEM and performs the
4-tap bilinear gather VMEM-resident — one HBM read of img + flow and one
write of out, no random HBM access at all. This covers every pyramid-level
warp in the flow net (small H·W·C), which is where warp is called 2·levels
times per step; full-resolution feature maps that exceed the VMEM budget
route to the XLA gather fallback automatically (its random access is
HBM-bound but infrequent — once per neighbor).

Gather inside the kernel is expressed as jnp.take on the flattened (H·W, C)
image; Mosaic lowers minor-most-preserving gathers natively, and interpret
mode pins numerics off-TPU.

Backward: custom VJP recomputing through the XLA warp (exact same math).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# Leave headroom for double-buffering and the output block in ~16MB VMEM.
_VMEM_BUDGET_BYTES = 6 * 1024 * 1024


def _warp_kernel(img_ref, flow_ref, out_ref, *, h, w, c, zeros_pad: bool):
    """All shapes stay 2-D (H*W, C)/(H*W, 2): Mosaic rejects the
    (H,W,C)<->(H*W,C) relayout reshapes at many shapes, so the caller
    pre-flattens and the pixel coordinates come from an integer iota."""
    n = h * w
    img = img_ref[0].astype(jnp.float32)                 # (n, c)
    flow = flow_ref[0].astype(jnp.float32)               # (n, 2)
    pix = jax.lax.broadcasted_iota(jnp.int32, (n, 1), 0)
    ys = (pix // w).astype(jnp.float32)                  # (n, 1)
    xs = (pix % w).astype(jnp.float32)
    sx = xs + flow[:, 0:1]
    sy = ys + flow[:, 1:2]
    x0 = jnp.floor(sx)
    y0 = jnp.floor(sy)
    wx = sx - x0                                         # (n, 1)
    wy = sy - y0

    def tap(yi, xi):
        valid = (xi >= 0) & (xi <= w - 1) & (yi >= 0) & (yi <= h - 1)
        yc = jnp.clip(yi, 0, h - 1).astype(jnp.int32)
        xc = jnp.clip(xi, 0, w - 1).astype(jnp.int32)
        idx = yc * w + xc                                # (n, 1)
        idx2 = jnp.broadcast_to(idx, (n, c))
        g = jnp.take_along_axis(img, idx2, axis=0)       # (n, c)
        if zeros_pad:
            g = jnp.where(valid, g, 0.0)
        return g

    out = (
        (1 - wy) * (1 - wx) * tap(y0, x0)
        + (1 - wy) * wx * tap(y0, x0 + 1)
        + wy * (1 - wx) * tap(y0 + 1, x0)
        + wy * wx * tap(y0 + 1, x0 + 1)
    )
    out_ref[0] = out.astype(out_ref.dtype)


def _fits_vmem(h: int, w: int, c: int, itemsize: int) -> bool:
    # img f32 in-kernel + 4 tap temporaries ≈ 5 copies of (h, w, c) f32
    return 5 * h * w * c * 4 + h * w * 2 * 4 <= _VMEM_BUDGET_BYTES


def _warp_fwd(img, flow, padding_mode, interpret):
    b, h, w, c = img.shape
    if not interpret or not _fits_vmem(h, w, c, img.dtype.itemsize):
        # Compiled path: XLA. Measured on the v5e chip, this Pallas gather
        # formulation ran at parity with XLA's gather (0.82 ms either way at
        # (2,96,160,32)), and Mosaic's gather support is shape-fragile
        # ("multiple source vregs along gather dimension" beyond one vreg).
        # The kernel below remains the interpret-mode-verified blueprint; a
        # future round can revisit with a strip-DMA + one-hot-MXU design if
        # warp ever dominates the profile.
        from video_super_resolution_tpu.ops.warp import _warp_xla

        return _warp_xla(img, flow, padding_mode)
    # Pre-flatten outside the kernel (XLA handles the relayout); the kernel
    # works purely on (H*W, C) / (H*W, 2) 2-D arrays.
    n = h * w
    img_f = img.reshape(b, n, c)
    flow_f = flow.reshape(b, n, 2)
    out = pl.pallas_call(
        functools.partial(
            _warp_kernel, h=h, w=w, c=c, zeros_pad=(padding_mode == "zeros")
        ),
        grid=(b,),
        in_specs=[
            pl.BlockSpec((1, n, c), lambda bi: (bi, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, n, 2), lambda bi: (bi, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, n, c), lambda bi: (bi, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, n, c), img.dtype),
        interpret=interpret,
    )(img_f, flow_f)
    return out.reshape(b, h, w, c)


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3))
def warp_pallas(img: jax.Array, flow: jax.Array, padding_mode: str = "zeros",
                interpret: bool = False) -> jax.Array:
    """Same contract as ops.warp.backward_warp."""
    return _warp_fwd(img, flow, padding_mode, interpret)


def _w_fwd(img, flow, padding_mode, interpret):
    return _warp_fwd(img, flow, padding_mode, interpret), (img, flow)


def _w_bwd(padding_mode, interpret, res, g):
    img, flow = res
    from video_super_resolution_tpu.ops.warp import _warp_xla

    _, vjp = jax.vjp(lambda a, f: _warp_xla(a, f, padding_mode), img, flow)
    return vjp(g)


warp_pallas.defvjp(_w_fwd, _w_bwd)
