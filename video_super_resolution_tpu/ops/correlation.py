"""Cost-volume local correlation (the reference's hottest custom CUDA op).

Capability contract: all-pairs *local* correlation between reference-frame
features and neighbor features within max displacement ``d`` (SURVEY.md §2.1
#2; the reference implements this as a `correlation_package` CUDA extension
with a custom autograd Function — here the default is a pure-XLA formulation
that fuses well, with a Pallas TPU kernel in ``ops/pallas/correlation_tpu.py``
for the hot path).

Definition (PWC-Net convention, normalized by channel count):

    cost[b, y, x, k] = (1/C) * sum_c f1[b, y, x, c] * f2[b, y+dy, x+dx, c]

where k enumerates (dy, dx) in row-major order over the square window
``dy, dx ∈ [-d, d]`` and out-of-bounds samples of f2 are zero.

Output channels = (2d+1)^2 (81 for d=4) — deliberately channels-last so the
displacement axis rides the 128-lane registers (padded 81→128 by Mosaic).

XLA formulation: pad f2 once, then for each of the (2d+1)^2 static shifts
take a slice and contract over C with an elementwise multiply + reduce. XLA
fuses the whole window into a few loops over VMEM-resident tiles; there is no
gather and no dynamic shape anywhere.
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp


@functools.partial(jax.jit, static_argnames=("max_displacement", "use_pallas"))
def correlation(
    f1: jax.Array,
    f2: jax.Array,
    max_displacement: int = 4,
    use_pallas: bool = False,
) -> jax.Array:
    """Local cost volume between two NHWC feature maps.

    Args:
      f1: reference features, shape (B, H, W, C).
      f2: neighbor features (already warped by current flow), same shape.
      max_displacement: window radius d.
      use_pallas: route to the Pallas TPU kernel.

    Returns:
      (B, H, W, (2d+1)^2) cost volume, f32, row-major over (dy, dx).
    """
    if f1.shape != f2.shape:
        raise ValueError(f"shape mismatch: {f1.shape} vs {f2.shape}")
    from video_super_resolution_tpu.ops.pallas.util import should_interpret

    # On-chip, the Pallas kernel is the production path even when the
    # caller does not force it: the XLA window sweep measures ~0.4 ms
    # standalone but ~16 ms inside the composed flow program (round-3
    # in-context bisect, tools/bench_model_ab.py --stages flow:cheapcorr —
    # XLA compiles the 81-slice sweep pathologically in context), while
    # the opaque custom call keeps its standalone cost. H % 8 shapes are
    # zero-padded exactly inside correlation_pallas (round 3); the only
    # remaining self-fallback to XLA is the per-row VMEM budget check.
    # Off-TPU stays XLA so tests never run the interpreter.
    impl = os.environ.get("VSR_CORR_IMPL", "auto")
    if use_pallas or (impl != "xla" and not should_interpret()):
        from video_super_resolution_tpu.ops.pallas.correlation_tpu import (
            correlation_pallas,
        )

        return correlation_pallas(f1, f2, max_displacement, should_interpret())
    return _correlation_xla(f1, f2, max_displacement)


def _correlation_xla(f1: jax.Array, f2: jax.Array, d: int) -> jax.Array:
    b, h, w, c = f1.shape
    # Materialize both inputs first: the window sweep below reads each one
    # (2d+1)^2 = 81 times, and without the barrier XLA fuses the producers
    # (the level's backward-warp gather / pyramid conv) into every consumer
    # — measured in-context on chip: the flow stage's correlations cost
    # ~16 ms total vs ~1 ms expected, i.e. the warp was recomputed 81x
    # (tools/bench_model_ab.py --stages flow:nocorr bisect, round 3).
    # optimization_barrier is an exact identity, so numerics are unchanged.
    f1, f2 = jax.lax.optimization_barrier((f1, f2))
    f2p = jnp.pad(f2, ((0, 0), (d, d), (d, d), (0, 0)))
    # Accumulate in f32 regardless of input dtype (parity: SURVEY.md §7.2-3).
    f1 = f1.astype(jnp.float32)
    inv_c = jnp.float32(1.0 / c)
    slices = []
    for dy in range(-d, d + 1):
        for dx in range(-d, d + 1):
            shifted = jax.lax.slice(
                f2p, (0, d + dy, d + dx, 0), (b, d + dy + h, d + dx + w, c)
            ).astype(jnp.float32)
            slices.append(jnp.sum(f1 * shifted, axis=-1) * inv_c)
    # Stack the K displacement planes on a MAJOR axis (contiguous block
    # copies) and transpose once to channels-last: an 81-piece concatenate
    # on the minor axis writes one lane-strided element stream per piece —
    # measured 8.7 ms for (2,136,240,81) f32 on v5e vs ~0.2 ms this way.
    return jnp.stack(slices, axis=1).transpose(0, 2, 3, 1)
