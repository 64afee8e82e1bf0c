"""Pallas TPU kernels: fused 3x3 conv + bias + LeakyReLU, and the
conv -> pixel-shuffle(2) -> LeakyReLU epilogue (SURVEY.md §2.3 rows 4-5).

Why hand-written: on this platform XLA's conv lowering reaches only ~21
TFLOP/s while its plain matmul reaches ~175 (measured, tools/bench_roofline
with tunnel-pull subtraction) — the conv emitter, not the MXU, is the
bottleneck. So the kernel lowers the 3x3 conv to 9 MXU matmuls over a
VMEM-resident row strip:

- grid step = one (TH, W) row strip of one batch element; the haloed input
  strip (TH+2, Wp, Cin) streams HBM->VMEM via double-buffered async DMA
  (the H dim is untiled, so row slices at any offset are legal).
- kx in {0,1,2} slices the strip along W once per kx (one vector relayout
  each, hoisted out of the ky loop); ky slices are major-dim (free).
- each tap is a (TH*W, Cin) x (Cin, Cout) dot with f32 accumulation.
- Cin is zero-padded to a multiple of 128 lanes: the current Mosaic
  rejects HBM memref slices whose lane dim is not 128-aligned ("Slice
  shape along dimension 3 must be aligned to tiling (128)"), and a full
  128-lane K side is what the MXU wants anyway. Zero K rows contribute
  nothing. TH shrinks automatically until the double-buffered strips fit
  VMEM; cin < 32 (42x pad traffic at cin=3) routes to XLA.
- bias + LeakyReLU fuse into the same VMEM pass before one HBM write.

The reference family ran this as cuDNN conv + bias + activation (+ ATen
PixelShuffle) kernel launches; here it is one pass over HBM.

Backward: custom VJP recomputing through the XLA convolution (identical
math; conv VJPs are themselves convs and run at forward speed).
"""

from __future__ import annotations

import functools
import math
import os

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _pick_th(h: int, target: int = 8) -> int:
    th = target
    while h % th and th > 1:
        th //= 2
    return th


def _ppack_weights(w: jax.Array) -> jax.Array:
    """(3, 3, Cin, Cout) HWIO -> (3, 3, 2*Cin, 2*Cout) pixel-pair block
    mats (Cin 64 -> K=128 dense, Cin 128 -> K=256 = two dense MXU passes).

    Pixel-pair packing (round 5): a (B, H, W, 64) activation viewed as
    (B, H, W/2, 128) is lane-DENSE — two adjacent pixels' channels fill the
    128 lanes that the 64-channel layout would zero-pad. The 3x3 conv then
    becomes, per vertical tap ky, three (128, 2*Cout) matmuls over pair
    shifts s in {-1, 0, +1}: output pair j consumes input pairs j+s, and
    block (p_in, p_out) of the shift-s matrix holds the horizontal tap
    kx = 2s + p_in - p_out + 1 (zero block when kx is outside 0..2). Same
    FLOP count as the zero-padded K=128 kernel, but the N (output) side is
    2*Cout — a FULL 128-lane MXU tile at Cout=64 instead of half idle
    (measured 23 TF/s at 64->64 in both XLA and the padded kernel — the
    worst shape on this chip, BENCH_KERNELS_r4.md).
    """
    z = jnp.zeros_like(w[0, 0])                             # (64, Cout)

    def blocks(b00, b01, b10, b11):
        return jnp.concatenate([
            jnp.concatenate([b00, b01], axis=1),
            jnp.concatenate([b10, b11], axis=1),
        ], axis=0)                                          # (128, 2*Cout)

    mats = []
    for ky in range(3):
        w0, w1, w2 = w[ky, 0], w[ky, 1], w[ky, 2]
        mats.append(jnp.stack([
            blocks(z, z, w0, z),        # s=-1: only (p_in=1 -> p_out=0)
            blocks(w1, w0, w2, w1),     # s= 0: all four taps
            blocks(z, w2, z, z),        # s=+1: only (p_in=0 -> p_out=1)
        ]))
    return jnp.stack(mats)                                  # (3, 3, 128, 2C)


def _conv_kernel(xp_ref, w_ref, b_ref, *rest, th, w, cin, cout, slope, ny,
                 n_steps, kpair, d=1, has_res=False, kcat=False):
    if has_res:
        res_ref, out_ref, strips, sems = rest
    else:
        res_ref = None
        out_ref, strips, sems = rest
    t = pl.program_id(0)

    def get_dma(slot, tt):
        bi = tt // ny
        hi = tt % ny
        return pltpu.make_async_copy(
            xp_ref.at[bi, pl.ds(hi * th, th + 2 * d)],
            strips.at[slot],
            sems.at[slot],
        )

    @pl.when(t == 0)
    def _():
        get_dma(0, 0).start()

    @pl.when(t + 1 < n_steps)
    def _():
        get_dma((t + 1) % 2, t + 1).start()

    get_dma(t % 2, t).wait()

    strip = strips[t % 2]                                   # (TH+2, Wp, Cin)
    wk = w_ref[...].astype(jnp.float32)                     # (3|2, 3, Cin, Cout)
    acc = jnp.zeros((th * w, cout), jnp.float32)
    if kpair:
        # cin was exactly 64 pre-pad and the caller built the ROW-PAIRED
        # input layout: lane block = [row r ch | row r+1 ch] (the 128-lane
        # pad bytes carry real data instead of zeros, same DMA size). Each
        # MXU pass then contracts two vertical taps over a dense K=128 —
        # 6 passes carry the 9-tap conv (75% K utilization vs 50%). wk[0]
        # holds the host-packed (ky0|ky1) pair weights; wk[1] is the ky=2
        # single whose UPPER half is zero, so the pair row's extra
        # channels contribute nothing and no lane slicing is needed.
        sv = strip[...]
        for kx in range(3):
            s_kx = jax.lax.slice_in_dim(sv, kx, kx + w, axis=1)
            a = jax.lax.slice_in_dim(s_kx, 0, th, axis=0)
            acc += jnp.dot(a.reshape(th * w, cin), wk[0, kx],
                           preferred_element_type=jnp.float32)
            s2 = jax.lax.slice_in_dim(s_kx, 2, 2 + th, axis=0)
            acc += jnp.dot(s2.reshape(th * w, cin), wk[1, kx],
                           preferred_element_type=jnp.float32)
    elif kcat:
        # K-concat experiment (round 4): the 9 `acc += dot` read-modify-
        # writes of the (TH*W, Cout) f32 accumulator move ~70 MB/strip of
        # VMEM traffic at the 128x128 trunk shape — the main gap to the
        # MXU bound (BENCH_KERNELS_r4.md). Concatenating the 3 ky taps
        # along K per kx (one K=3*Cin dot) touches acc 3x instead of 9x,
        # trading a (TH*W, 3*Cin) operand build. Needs a smaller TH for
        # VMEM (the caller shrinks it).
        for kx in range(3):
            a_kx = jax.lax.slice_in_dim(strip[...], kx * d, kx * d + w,
                                        axis=1)
            parts = [
                jax.lax.slice_in_dim(a_kx, ky * d, ky * d + th, axis=0)
                .reshape(th * w, cin)
                for ky in range(3)
            ]
            wcat = jnp.concatenate([wk[0, kx], wk[1, kx], wk[2, kx]], axis=0)
            acc += jnp.dot(jnp.concatenate(parts, axis=1), wcat,
                           preferred_element_type=jnp.float32)
    else:
        for kx in range(3):
            a_kx = jax.lax.slice_in_dim(strip[...], kx * d, kx * d + w,
                                        axis=1)
            for ky in range(3):
                a = jax.lax.slice_in_dim(a_kx, ky * d, ky * d + th, axis=0)
                acc += jnp.dot(
                    a.reshape(th * w, cin), wk[ky, kx],
                    preferred_element_type=jnp.float32,
                )
    acc += b_ref[...].astype(jnp.float32)[None, :]
    if has_res:
        # broadcast residual (e.g. the reference half of a linearity-split
        # score conv), added PRE-activation — Pallas streams the matching
        # (th, w, cout) block per grid step via the BlockSpec index map.
        acc += res_ref[0].astype(jnp.float32).reshape(th * w, cout)
    acc = jnp.where(acc >= 0, acc, slope * acc)
    out_ref[0] = acc.reshape(th, w, cout).astype(out_ref.dtype)


def _seg_perm(cin: int):
    """Row permutation mapping the standard packed-128 weight order to the
    SEGMENTED packed layout (a lane-concat of two packed-64 arrays).

    Standard packed lane order for a 2*cin-channel pixel pair is
    [px0 c0..cin-1 | px1 c0..cin-1]; a lane-concat of two packed-(cin/2)
    groups gives [px0 g0 | px1 g0 | px0 g1 | px1 g1]. Channel-concat of
    packed activations is a plain lane-concat under this permutation —
    no relayout (the fusion tail's [ref_feat | agg] input)."""
    import numpy as np

    half = cin // 2
    blocks = [range(0, half), range(cin, cin + half),
              range(half, cin), range(cin + half, 2 * cin)]
    return np.concatenate([np.asarray(list(r)) for r in blocks])


def _ppack_conv(x, w, b, slope, shuffle, interpret, res, res_repeat,
                in_packed=False, out_packed=False, in_seg=False):
    """Pixel-pair-packed conv (see _ppack_weights). Layouts:

    - in_packed=False: x is (B, H, W, Cin), viewed as (B, H, W/2, 2*Cin)
      (an XLA relayout at the boundary). True: x arrives already packed.
    - out_packed=False: result unpacked back to (B, H, W, Cout) (another
      boundary relayout). True: returns (B, H, W/2, 2*Cout) packed.

    Boundaries cost real HBM copies (~0.3 ms each at the 540x960 64-ch
    shape), which is why the bare normal->normal form loses in-context; the
    model-side packed trunk keeps activations packed ACROSS calls and pays
    the boundary only at entry/exit. `res`, when given, must match the
    OUTPUT layout. Returns None when the shape doesn't fit (odd W,
    indivisible H) so callers can fall back."""
    cin, cout = w.shape[2], w.shape[3]
    lane = 2 * cin
    cout2 = 2 * cout
    if lane not in (128, 256):
        return None     # DMA lane dim must be 128-aligned (Mosaic)
    if in_packed:
        bsz, h, wh, _ = x.shape
        wd = 2 * wh
    else:
        bsz, h, wd, _ = x.shape
        if wd % 2:
            return None
        wh = wd // 2
    th = _pick_th(h, int(os.environ.get("VSR_CONV_TH", "8")))
    whp = (wh + 2 + 7) // 8 * 8
    budget_mb = int(os.environ.get("VSR_CONV_VMEM_MB", "6"))
    # K-concat for the packed path (round 5): one K=3*lane dot per kx
    # instead of 3 — the f32 accumulator is read-modify-written 3x per
    # strip instead of 9x (the r4 accumulator-traffic finding). The
    # (TH*W, 3*lane) operand build needs its own VMEM headroom, counted
    # below next to the strips/acc.
    kcat = (res is None
            and os.environ.get("VSR_CONV_PPKCAT", "0") == "1")
    while th > 1 and (
            2 * (th + 2) * whp * lane * x.dtype.itemsize
            + (2 * th * wh * cout2 * (res.dtype.itemsize + x.dtype.itemsize)
               if res is not None else 0)
            + (th * wh * 3 * lane * x.dtype.itemsize
               + th * wh * cout2 * 4 if kcat else 0)
            > budget_mb << 20):
        th //= 2
    if h % th:
        return None
    xp = x if in_packed else x.reshape(bsz, h, wh, lane)
    xp = jnp.pad(xp, ((0, 0), (1, 1), (1, whp - wh - 1), (0, 0)))
    wk = _ppack_weights(w)                                  # (3,3,2Ci,2Co)
    if in_seg:
        wk = wk[:, :, _seg_perm(cin), :]
    bb = jnp.concatenate([b, b])
    ny = h // th
    n_steps = bsz * ny
    out_shape = (bsz, h, wh, cout2)
    in_specs = [
        pl.BlockSpec(memory_space=pltpu.HBM),
        pl.BlockSpec(memory_space=pltpu.VMEM),
        pl.BlockSpec(memory_space=pltpu.VMEM),
    ]
    operands = [xp, wk, bb]
    if res is not None:
        rb = bsz // res_repeat
        if res.shape == (rb, h, wd, cout):
            res = res.reshape(rb, h, wh, cout2)
        elif res.shape != (rb, h, wh, cout2):
            raise ValueError(f"res shape {res.shape}")
        in_specs.append(pl.BlockSpec(
            (1, th, wh, cout2),
            lambda t: ((t // ny) // res_repeat, t % ny, 0, 0),
            memory_space=pltpu.VMEM,
        ))
        operands.append(res)
    out = pl.pallas_call(
        functools.partial(
            _conv_kernel, th=th, w=wh, cin=lane, cout=cout2, slope=slope,
            ny=ny, n_steps=n_steps, kpair=False, d=1,
            has_res=res is not None, kcat=kcat,
        ),
        grid=(n_steps,),
        in_specs=in_specs,
        out_specs=pl.BlockSpec(
            (1, th, wh, cout2),
            lambda t: (t // ny, t % ny, 0, 0),
            memory_space=pltpu.VMEM,
        ),
        out_shape=jax.ShapeDtypeStruct(out_shape, x.dtype),
        scratch_shapes=[
            pltpu.VMEM((2, th + 2, whp, lane), x.dtype),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=2 * bsz * h * wd * cin * cout2 * 9,
            bytes_accessed=(x.size + wk.size) * x.dtype.itemsize
            + math.prod(out_shape) * x.dtype.itemsize
            + (res.size * res.dtype.itemsize if res is not None else 0),
            transcendentals=0,
        ),
    )(*operands)
    if not out_packed:
        out = out.reshape(bsz, h, wd, cout)
    if shuffle:
        assert not out_packed
        from video_super_resolution_tpu.ops.pixel_shuffle import pixel_shuffle

        out = pixel_shuffle(out, 2)
    return out


def _packed_ref(x, w, b, slope, in_packed, out_packed, res, res_repeat,
                in_seg=False):
    """XLA reference semantics of fused_conv3x3_packed (also the fallback
    and VJP-recompute path): unpack -> conv+bias(+res)+lrelu -> repack."""
    cin, cout = w.shape[2], w.shape[3]
    if in_packed:
        bsz, h, wh, _ = x.shape
        if in_seg:
            # segmented layout [px0 g0 | px1 g0 | px0 g1 | px1 g1]
            half = cin // 2
            x = (x.reshape(bsz, h, wh, 2, 2, half)
                 .transpose(0, 1, 2, 4, 3, 5)
                 .reshape(bsz, h, 2 * wh, cin))
        else:
            x = x.reshape(bsz, h, 2 * wh, cin)
    bsz, h, wd, _ = x.shape
    rn = res
    if res is not None and out_packed:
        rb = bsz // res_repeat
        rn = res.reshape(rb, h, wd, cout)
    out = _xla_conv(x, w, b, slope, False, 1, rn, res_repeat)
    if out_packed:
        out = out.reshape(bsz, h, wd // 2, 2 * cout)
    return out


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5, 6, 8, 9))
def fused_conv3x3_packed(x: jax.Array, w: jax.Array, b: jax.Array,
                         slope: float = 0.1, in_packed: bool = True,
                         out_packed: bool = True, interpret: bool = False,
                         res: jax.Array | None = None,
                         res_repeat: int = 1,
                         in_seg: bool = False) -> jax.Array:
    """3x3 SAME conv + bias (+res) + LReLU in the PIXEL-PAIR-PACKED layout.

    A (B, H, W, C) activation is carried as (B, H, W/2, 2C) — two adjacent
    pixels' channels filling the 128 lanes densely for C=64 (256 for
    C=128). in_packed/out_packed say which side uses the packed layout;
    `w` is always the plain (3, 3, Cin, Cout) HWIO tree param. Keeping
    activations packed ACROSS calls is the point: N=2*Cout fills the MXU's
    128-wide output tile at Cout=64 (measured 2x the padded kernel's
    useful rate at the model's worst shape) and the pack/unpack relayout
    is paid once per chain, not per conv. res must match the output
    layout. Elementwise ops (residual adds, lrelu, softmax-weighted sums)
    are layout-invariant; channel-concats of same-packing arrays become
    lane-concats (see ScoreConv/fusion packed paths).
    """
    out = _ppack_conv(x, w, b, slope, False, interpret, res, res_repeat,
                      in_packed, out_packed, in_seg)
    if out is None:
        out = _packed_ref(x, w, b, slope, in_packed, out_packed, res,
                          res_repeat, in_seg)
    return out


def _fcp_fwd(x, w, b, slope, in_packed, out_packed, interpret, res,
             res_repeat, in_seg):
    return (fused_conv3x3_packed(x, w, b, slope, in_packed, out_packed,
                                 interpret, res, res_repeat, in_seg),
            (x, w, b, res))


def _fcp_bwd(slope, in_packed, out_packed, interpret, res_repeat, in_seg,
             saved, g):
    x, w, b, res = saved
    if res is None:
        _, vjp = jax.vjp(
            lambda a, ww, bb: _packed_ref(a, ww, bb, slope, in_packed,
                                          out_packed, None, 1, in_seg),
            x, w, b)
        return (*vjp(g), None)
    _, vjp = jax.vjp(
        lambda a, ww, bb, r: _packed_ref(a, ww, bb, slope, in_packed,
                                         out_packed, r, res_repeat, in_seg),
        x, w, b, res)
    return vjp(g)


fused_conv3x3_packed.defvjp(_fcp_fwd, _fcp_bwd)


def _fused_conv_fwd(x, w, b, slope, shuffle, interpret, d=1, res=None,
                    res_repeat=1):
    bsz, h, wd, cin = x.shape
    cout = w.shape[-1]
    # lane-align the DMA'd channel dim (see module docstring); tiny cin is
    # all padding — not this kernel's domain.
    cin_p = (cin + 127) // 128 * 128
    if cin < 32:
        return _xla_conv(x, w, b, slope, shuffle, d, res, res_repeat)
    # Default ON since the packed score/fusion paths landed (r5): the
    # measured matrix (interleaved A/B, 540x960 serving program) is
    #   base + ppack 62.07 / base + noppack 61.94  (neutral alone)
    #   score+fusion packed + ppack 58.21          (the serving default)
    #   score+fusion packed + noppack 73.92        (XLA inserts ~12 ms of
    #       relayouts between the unpacked per-call convs and the packed
    #       activations around them)
    # Early-r5 note for history: before the packed model paths, bare
    # per-call packing measured 68.95 vs 67.80 (negative) — the boundaries
    # only pay for themselves next to packed neighbors.
    if (cin == 64 and d == 1 and wd % 2 == 0
            and os.environ.get("VSR_CONV_PPACK", "1") == "1"):
        out = _ppack_conv(x, w, b, slope, shuffle, interpret, res, res_repeat)
        if out is not None:
            return out
    # strip height: 8 measured best vs 4/16 at the trunk shape (th sweep,
    # BENCH_KERNELS_r3.md); env knobs exist for re-tuning on new platforms
    th = _pick_th(h, int(os.environ.get("VSR_CONV_TH", "8")))
    # the DMA'd strip's second-minor (W) dim must be an 8-sublane multiple
    # (dilated taps widen the halo to d each side)
    wd_p = ((wd + 2 * d) + 7) // 8 * 8
    # shrink the strip height until 2 slots + weights fit comfortably in
    # VMEM (v5e: 16 MB more strictly ~14 usable)
    budget_mb = int(os.environ.get("VSR_CONV_VMEM_MB", "6"))
    while th > 1 and (2 * (th + 2 * d) * wd_p * cin_p * x.dtype.itemsize
                      > budget_mb << 20):
        th //= 2
    if res is not None:
        # the res operand adds its own double-buffered (th, wd, cout)
        # pipeline blocks on top of the strips; without counting them the
        # scoped-vmem stack overflows at full-res score shapes (measured:
        # 17.62M > 16M limit at (2,544,960,128,64) with th=8)
        while th > 1 and (
                2 * (th + 2 * d) * wd_p * cin_p * x.dtype.itemsize
                + 2 * th * wd * cout * res.dtype.itemsize
                + 2 * th * wd * cout * x.dtype.itemsize
                > budget_mb << 20):
            th //= 2
        if h % th:
            return _xla_conv(x, w, b, slope, shuffle, d, res, res_repeat)
    if h % th:
        return _xla_conv(x, w, b, slope, shuffle, d, res, res_repeat)
    # ky-pair K-packing (VSR_CONV_KPAIR gate while being validated): for
    # cin == 64 the padded K=128 is half zeros; pack taps (ky=0, ky=1) of
    # adjacent rows into one dense K=128 matmul + a single ky=2 tap — 6
    # MXU passes instead of 9. The pad bytes of the HBM input carry the
    # next row's channels (row-paired layout, built here with one concat —
    # DMA size unchanged); weights pre-packed to (2, 3, 128, cout):
    # [0]=pair (ky0|ky1), [1]=ky2 with a zero upper half.
    kpair = (cin == 64 and d == 1
             and os.environ.get("VSR_CONV_KPAIR", "0") == "1")
    # kcat's VMEM shrink loop below does not model the res pipeline blocks;
    # force it off for res-carrying calls rather than risk a scoped-VMEM
    # overflow at full-res score shapes (ADVICE r4 low #3)
    kcat = (not kpair and d == 1 and res is None
            and os.environ.get("VSR_CONV_KCAT", "0") == "1")
    if kcat:
        # the (TH*W, 3*Cin) concat operand needs VMEM headroom
        while th > 1 and (th * (wd) * 3 * cin_p * x.dtype.itemsize
                          + 2 * (th + 2) * wd_p * cin_p * x.dtype.itemsize
                          > (budget_mb + 2) << 20):
            th //= 2
        if h % th:
            return _xla_conv(x, w, b, slope, shuffle, d, res, res_repeat)
    if kpair:
        xb = jnp.pad(x, ((0, 0), (1, 2), (1, wd_p - wd - 1), (0, 0)))
        xp = jnp.concatenate([xb[:, :-1], xb[:, 1:]], axis=-1)
        w = jnp.pad(w, ((0, 0), (0, 0), (0, cin_p - cin), (0, 0)))
        w = jnp.stack([
            jnp.concatenate([w[0, :, :64], w[1, :, :64]], axis=1),
            w[2],
        ])                                                  # (2, 3, 128, Cout)
    else:
        xp = jnp.pad(
            x, ((0, 0), (d, d), (d, wd_p - wd - d), (0, cin_p - cin)))
        if cin_p != cin:
            w = jnp.pad(w, ((0, 0), (0, 0), (0, cin_p - cin), (0, 0)))
    cin = cin_p
    ny = h // th
    n_steps = bsz * ny
    out_shape = (bsz, h, wd, cout)
    in_specs = [
        pl.BlockSpec(memory_space=pltpu.HBM),        # padded x
        pl.BlockSpec(memory_space=pltpu.VMEM),       # full weights
        pl.BlockSpec(memory_space=pltpu.VMEM),       # bias
    ]
    operands = [xp, w, b]
    if res is not None:
        if res.shape != (bsz // res_repeat, h, wd, cout):
            raise ValueError(
                f"res shape {res.shape} != "
                f"{(bsz // res_repeat, h, wd, cout)}")
        in_specs.append(pl.BlockSpec(
            (1, th, wd, cout),
            lambda t: ((t // ny) // res_repeat, t % ny, 0, 0),
            memory_space=pltpu.VMEM,
        ))
        operands.append(res)
    out = pl.pallas_call(
        functools.partial(
            _conv_kernel, th=th, w=wd, cin=cin, cout=cout, slope=slope,
            ny=ny, n_steps=n_steps, kpair=kpair, d=d,
            has_res=res is not None, kcat=kcat,
        ),
        grid=(n_steps,),
        in_specs=in_specs,
        out_specs=pl.BlockSpec(
            (1, th, wd, cout),
            lambda t: (t // ny, t % ny, 0, 0),
            memory_space=pltpu.VMEM,
        ),
        out_shape=jax.ShapeDtypeStruct(out_shape, x.dtype),
        scratch_shapes=[
            pltpu.VMEM((2, th + 2 * (1 if kpair else d), wd_p, cin),
                       x.dtype),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=2 * bsz * h * wd * cin * cout * 9,
            bytes_accessed=(x.size + w.size) * x.dtype.itemsize
            + math.prod(out_shape) * x.dtype.itemsize
            + (res.size * res.dtype.itemsize if res is not None else 0),
            transcendentals=0,
        ),
    )(*operands)
    if shuffle:
        # Depth-to-space stays outside the kernel: Mosaic rejects the
        # interleaving reshape ("unsupported shape cast") and XLA lowers it
        # to a relayout that fuses with the consumer; lrelu (elementwise,
        # already applied in-kernel) commutes with pixel_shuffle.
        from video_super_resolution_tpu.ops.pixel_shuffle import pixel_shuffle

        out = pixel_shuffle(out, 2)
    return out


def _xla_conv(x, w, b, slope, shuffle, d=1, res=None, res_repeat=1):
    # NB: no preferred_element_type — with bf16 operands the conv's
    # TRANSPOSE would feed an f32 cotangent (from the trailing astype)
    # into a bf16 conv and fail under jax.vjp (hit by the packed-trunk
    # train path, r5 verify drive). The TPU MXU accumulates bf16 convs in
    # f32 internally either way; bias/res/lrelu math stays f32 below.
    out = jax.lax.conv_general_dilated(
        x, w, (1, 1), ((d, d), (d, d)), rhs_dilation=(d, d),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )
    out = out.astype(jnp.float32) + b.astype(jnp.float32)[None, None, None, :]
    if res is not None:
        out = out + jnp.repeat(res.astype(jnp.float32), res_repeat, axis=0)
    out = jnp.where(out >= 0, out, slope * out).astype(x.dtype)
    if shuffle:
        from video_super_resolution_tpu.ops.pixel_shuffle import pixel_shuffle

        out = pixel_shuffle(out, 2)
    return out


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5, 6, 8))
def fused_conv3x3(x: jax.Array, w: jax.Array, b: jax.Array,
                  slope: float = 0.1, shuffle: bool = False,
                  interpret: bool = False, dilation: int = 1,
                  res: jax.Array | None = None,
                  res_repeat: int = 1) -> jax.Array:
    """3x3 SAME conv + bias (+ optional residual) + LReLU
    (+ optional pixel-shuffle r=2 epilogue).

    x: (B, H, W, Cin); w: (3, 3, Cin, Cout) HWIO; b: (Cout,).
    shuffle=True additionally rearranges to (B, 2H, 2W, Cout/4).
    dilation: tap spacing (SAME padding = dilation), for the dilated
    context-net convs; the VMEM budget shrinks TH as the halo grows.
    res: optional (B // res_repeat, H, W, Cout) residual added
    PRE-activation, broadcast over groups of ``res_repeat`` consecutive
    batch elements — the linearity-split score conv's reference half
    (models/fusion.ScoreConv) streams through here instead of a separate
    full-size f32 broadcast-add pass.
    Intended domain: Cin >= 16 and Cout <= 128 (the hot trunk shapes);
    callers route other shapes to XLA.
    """
    return _fused_conv_fwd(x, w, b, slope, shuffle, interpret, dilation,
                           res, res_repeat)


def _fc_fwd(x, w, b, slope, shuffle, interpret, dilation, res, res_repeat):
    return (_fused_conv_fwd(x, w, b, slope, shuffle, interpret, dilation,
                            res, res_repeat),
            (x, w, b, res))


def _fc_bwd(slope, shuffle, interpret, dilation, res_repeat, saved, g):
    x, w, b, res = saved
    if res is None:
        _, vjp = jax.vjp(
            lambda a, ww, bb: _xla_conv(a, ww, bb, slope, shuffle, dilation),
            x, w, b)
        return (*vjp(g), None)
    _, vjp = jax.vjp(
        lambda a, ww, bb, r: _xla_conv(a, ww, bb, slope, shuffle, dilation,
                                       r, res_repeat),
        x, w, b, res)
    return vjp(g)


fused_conv3x3.defvjp(_fc_fwd, _fc_bwd)
