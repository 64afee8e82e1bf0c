"""Pallas TPU kernels: fused 3x3 conv + bias + LeakyReLU, and the
conv -> pixel-shuffle(2) -> LeakyReLU epilogue (SURVEY.md §2.3 rows 4-5).

MXU formulation: a 3x3 SAME conv over a (TH, W) tile is 9 shifted matmuls —
for each (ky, kx), the haloed input strip slice (TH*W, Cin) multiplies
w[ky, kx] (Cin, Cout) on the MXU with f32 accumulation; bias + LReLU (and
for the epilogue kernel the depth-to-space rearrange) happen in VMEM before
the single HBM write-back. That fuses what the reference family ran as
cuDNN-conv + bias + activation (+ ATen PixelShuffle) kernel launches into
one pass over HBM.

Backward: custom VJP recomputing through the XLA convolution (identical
math; conv VJPs are themselves MXU convs, so there is nothing to hand-win).
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _pick_th(h: int, target: int = 8) -> int:
    th = target
    while h % th and th > 1:
        th //= 2
    return th


def _conv_kernel(xp_ref, w_ref, b_ref, out_ref, *, th, w, wp, cin, cout,
                 slope):
    bi = pl.program_id(0)
    i = pl.program_id(1)

    def body(x_tile, sem):
        dma = pltpu.make_async_copy(
            xp_ref.at[bi, pl.ds(i * th, th + 2)], x_tile, sem
        )
        dma.start()
        wk = w_ref[...].astype(jnp.float32)              # (3, 3, cin, cout)
        dma.wait()
        acc = jnp.zeros((th * w, cout), jnp.float32)
        for ky in range(3):
            for kx in range(3):
                a = x_tile[ky : ky + th, kx : kx + w, :].astype(jnp.float32)
                acc += jnp.dot(
                    a.reshape(th * w, cin), wk[ky, kx],
                    preferred_element_type=jnp.float32,
                )
        acc += b_ref[...].astype(jnp.float32)[None, :]
        acc = jnp.where(acc >= 0, acc, slope * acc)
        out_ref[0] = acc.reshape(th, w, cout).astype(out_ref.dtype)

    pl.run_scoped(
        body,
        pltpu.VMEM((th + 2, wp, cin), xp_ref.dtype),
        pltpu.SemaphoreType.DMA(()),
    )


def _fused_conv_fwd(x, w, b, slope, shuffle, interpret):
    bsz, h, wd, cin = x.shape
    cout = w.shape[-1]
    th = _pick_th(h)
    # Mosaic memref slices need a 128-multiple minor dim: zero-pad Cin (the
    # extra lanes multiply zero weights; a 128-lane contraction also fills
    # the MXU better than 64).
    cin_p = (cin + 127) // 128 * 128
    # second-minor (W) dim of the DMA'd strip must be a multiple of the
    # 8-sublane tile as well
    wd_p = ((wd + 2) + 7) // 8 * 8
    xp = jnp.pad(
        x, ((0, 0), (1, 1), (1, wd_p - wd - 1), (0, cin_p - cin))
    )
    w = jnp.pad(w, ((0, 0), (0, 0), (0, cin_p - cin), (0, 0)))
    cin = cin_p
    out_shape = (bsz, h, wd, cout)
    out_block = (1, th, wd, cout)
    out = pl.pallas_call(
        functools.partial(
            _conv_kernel, th=th, w=wd, wp=wd_p, cin=cin, cout=cout,
            slope=slope,
        ),
        grid=(bsz, h // th),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.ANY),        # padded x in HBM
            pl.BlockSpec(memory_space=pltpu.VMEM),       # full weights
            pl.BlockSpec(memory_space=pltpu.VMEM),       # bias
        ],
        out_specs=pl.BlockSpec(out_block, lambda bi, hi: (bi, hi, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct(out_shape, x.dtype),
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=2 * bsz * h * wd * cin * cout * 9,
            bytes_accessed=(x.size + w.size) * x.dtype.itemsize
            + math.prod(out_shape) * x.dtype.itemsize,
            transcendentals=0,
        ),
    )(xp, w, b)
    if shuffle:
        # Depth-to-space stays outside the kernel: Mosaic rejects the
        # interleaving reshape ("unsupported shape cast") and XLA lowers it
        # to a relayout that fuses with the consumer; lrelu (elementwise,
        # already applied in-kernel) commutes with pixel_shuffle.
        from video_super_resolution_tpu.ops.pixel_shuffle import pixel_shuffle

        out = pixel_shuffle(out, 2)
    return out


def _xla_conv(x, w, b, slope, shuffle):
    out = jax.lax.conv_general_dilated(
        x, w, (1, 1), "SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.float32,
    )
    out = out + b.astype(jnp.float32)[None, None, None, :]
    out = jnp.where(out >= 0, out, slope * out).astype(x.dtype)
    if shuffle:
        from video_super_resolution_tpu.ops.pixel_shuffle import pixel_shuffle

        out = pixel_shuffle(out, 2)
    return out


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5))
def fused_conv3x3(x: jax.Array, w: jax.Array, b: jax.Array,
                  slope: float = 0.1, shuffle: bool = False,
                  interpret: bool = False) -> jax.Array:
    """3x3 SAME conv + bias + LReLU (+ optional pixel-shuffle r=2 epilogue).

    x: (B, H, W, Cin); w: (3, 3, Cin, Cout) HWIO; b: (Cout,).
    shuffle=True additionally rearranges to (B, 2H, 2W, Cout/4) in-kernel.
    """
    return _fused_conv_fwd(x, w, b, slope, shuffle, interpret)


def _fc_fwd(x, w, b, slope, shuffle, interpret):
    return _fused_conv_fwd(x, w, b, slope, shuffle, interpret), (x, w, b)


def _fc_bwd(slope, shuffle, interpret, res, g):
    x, w, b = res
    _, vjp = jax.vjp(lambda a, ww, bb: _xla_conv(a, ww, bb, slope, shuffle),
                     x, w, b)
    return vjp(g)


fused_conv3x3.defvjp(_fc_fwd, _fc_bwd)
