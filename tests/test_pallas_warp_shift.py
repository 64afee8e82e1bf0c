"""Pallas shift-select warp kernel (interpret mode) vs the exact gather warp.

Exactness domain: smooth flow whose in-tile integer spread fits the
(rd_y, rd_x) budget — within it the kernel must match the gather formulation
bit-for-fp32 (same clamps as ops/warp_tiled.py).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from video_super_resolution_tpu.ops.pallas.warp_shift_tpu import warp_shift_pallas
from video_super_resolution_tpu.ops.warp import _warp_xla


def smooth_flow(b, h, w, amp=3.0):
    ys, xs = np.mgrid[0:h, 0:w]
    fx = amp * np.sin(xs / 40.0) + amp / 2
    fy = (amp * 0.6) * np.cos(ys / 25.0) - 1.0
    return jnp.asarray(
        np.stack([np.broadcast_to(fx, (b, h, w)),
                  np.broadcast_to(fy, (b, h, w))], -1), jnp.float32)


@pytest.mark.parametrize("shape", [(2, 32, 256, 4), (1, 24, 128, 3),
                                   (1, 17, 130, 5)])
def test_matches_gather_smooth_flow(rng, shape):
    b, h, w, c = shape
    img = jnp.asarray(rng.random(shape), jnp.float32)
    flow = smooth_flow(b, h, w)
    got = np.asarray(warp_shift_pallas(img, flow, interpret=True))
    want = np.asarray(_warp_xla(img, flow, "zeros"))
    np.testing.assert_allclose(got, want, rtol=1e-6, atol=1e-6)


def test_zero_flow_identity(rng):
    img = jnp.asarray(rng.random((1, 16, 128, 4)), jnp.float32)
    flow = jnp.zeros((1, 16, 128, 2), jnp.float32)
    got = np.asarray(warp_shift_pallas(img, flow, interpret=True))
    np.testing.assert_allclose(got, np.asarray(img), rtol=1e-6, atol=1e-6)


def test_out_of_bounds_zeros(rng):
    """Flow pointing entirely off-image must produce zeros (zeros padding)."""
    img = jnp.asarray(rng.random((1, 16, 128, 2)) + 1.0, jnp.float32)
    flow = jnp.full((1, 16, 128, 2), 500.0, jnp.float32)
    got = np.asarray(warp_shift_pallas(img, flow, interpret=True))
    np.testing.assert_allclose(got, 0.0, atol=0)


def test_grad_matches_gather(rng):
    img = jnp.asarray(rng.random((1, 16, 128, 2)), jnp.float32)
    flow = jnp.asarray(rng.standard_normal((1, 16, 128, 2)) * 0.5, jnp.float32)

    def loss_p(i, f):
        return jnp.sum(jnp.sin(warp_shift_pallas(i, f, interpret=True)))

    def loss_x(i, f):
        return jnp.sum(jnp.sin(_warp_xla(i, f, "zeros")))

    gp = jax.grad(loss_p, argnums=(0, 1))(img, flow)
    gx = jax.grad(loss_x, argnums=(0, 1))(img, flow)
    for a, b in zip(gp, gx):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-5, atol=1e-5)
