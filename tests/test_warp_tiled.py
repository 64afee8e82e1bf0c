"""Tiled shift-select warp vs the exact gather formulation (and torch).

The tiled path must be numerically identical (up to fp reassociation) to
the gather path whenever the in-tile integer-flow spread fits the residual
budget — which covers every smooth flow the model produces. Cases:
- smooth random flow, large global displacement (tests per-tile bases)
- out-of-bounds flow (zeros padding semantics, partial-tap edges)
- non-multiple-of-tile shapes (internal padding)
- gradients w.r.t. img and flow match the gather path
"""

import functools

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from video_super_resolution_tpu.ops.pallas.warp_shift_tpu import warp_shift_pallas
from video_super_resolution_tpu.ops.warp import _warp_xla, backward_warp
from video_super_resolution_tpu.ops.warp_tiled import warp_tiled as _warp_tiled

# The XLA shift-select and the Pallas kernel (interpret mode here) share one
# contract; run every case on both.
_warp_pallas = functools.partial(warp_shift_pallas, interpret=True)
pytestmark = pytest.mark.parametrize(
    "warp_tiled", [_warp_tiled, _warp_pallas], ids=["tiled", "pallas"])


def _smooth_flow(rng, b, h, w, mag, coarse=4):
    f = rng.standard_normal((b, coarse, coarse, 2)) * mag
    f = jax.image.resize(jnp.asarray(f, jnp.float32), (b, h, w, 2), "linear")
    return f


@pytest.mark.parametrize("shape", [(2, 32, 128, 4), (1, 40, 200, 3)])
def test_tiled_matches_gather_smooth(rng, shape, warp_tiled):
    # mag=3 over a 4x4 coarse grid keeps the flow gradient within the
    # tiled path's documented exactness domain (~1 px/px in y, 0.5 in x).
    b, h, w, c = shape
    img = jnp.asarray(rng.random(shape), jnp.float32)
    flow = _smooth_flow(rng, b, h, w, mag=3.0)
    want = _warp_xla(img, flow, "zeros")
    got = warp_tiled(img, flow)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=1e-5)


def test_tiled_large_uniform_displacement(rng, warp_tiled):
    """Global shifts of tens of px are absorbed by per-tile bases exactly."""
    img = jnp.asarray(rng.random((1, 48, 160, 2)), jnp.float32)
    flow = jnp.tile(jnp.asarray([23.4, -17.8], jnp.float32), (1, 48, 160, 1))
    want = _warp_xla(img, flow, "zeros")
    got = warp_tiled(img, flow)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=1e-5)


def test_tiled_out_of_bounds_zeros(rng, warp_tiled):
    """Flow pointing far outside must produce exact zeros; partial taps at
    the border must match torch-style zeros semantics (via gather path)."""
    img = jnp.asarray(rng.random((1, 16, 128, 3)), jnp.float32)
    flow = jnp.full((1, 16, 128, 2), 500.0, jnp.float32)
    np.testing.assert_array_equal(np.asarray(warp_tiled(img, flow)), 0.0)

    edge = _smooth_flow(np.random.default_rng(1), 1, 16, 128, mag=3.0)
    # push samples around the border region
    edge = edge.at[..., 1].add(-14.0)
    want = _warp_xla(img, edge, "zeros")
    got = warp_tiled(img, edge)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=1e-5)


def test_backward_warp_impl_routing(rng, warp_tiled):
    """auto == gather (always exact); impl='tiled' routes the fast path."""
    img = jnp.asarray(rng.random((1, 16, 130, 3)), jnp.float32)
    flow = _smooth_flow(rng, 1, 16, 130, mag=2.0)
    np.testing.assert_allclose(   # same formulation; jit fusion noise only
        np.asarray(backward_warp(img, flow)),
        np.asarray(_warp_xla(img, flow, "zeros")), rtol=1e-6, atol=1e-6)
    np.testing.assert_allclose(
        np.asarray(backward_warp(img, flow, impl="tiled")),
        np.asarray(warp_tiled(img, flow)), rtol=1e-6, atol=1e-6)
    with pytest.raises(ValueError):
        backward_warp(img, flow, padding_mode="border", impl="tiled")


def test_tiled_overflow_is_graceful(rng, warp_tiled):
    """Step-discontinuity flow overflows the residual budget: the result
    must stay finite, OOB regions exactly zero, and in-budget tiles exact."""
    img = jnp.asarray(rng.random((1, 32, 128, 3)), jnp.float32)
    flow = np.zeros((1, 32, 128, 2), np.float32)
    flow[:, :, 64:, 0] = 40.0          # 40 px step at a "motion boundary"
    flow[:, :16, :, 1] = -500.0        # fully OOB band
    flow = jnp.asarray(flow)
    out = np.asarray(warp_tiled(img, flow))
    assert np.isfinite(out).all()
    np.testing.assert_array_equal(out[:, :16], 0.0)
    want = np.asarray(_warp_xla(img, flow, "zeros"))
    # tiles fully inside either side of the step are in-budget -> exact
    np.testing.assert_allclose(out[:, 16:, :48], want[:, 16:, :48],
                               rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(out[:, 16:, 80:], want[:, 16:, 80:],
                               rtol=1e-5, atol=1e-5)


def test_tiled_gradients_match_gather(rng, warp_tiled):
    img = jnp.asarray(rng.random((1, 16, 128, 2)), jnp.float32)
    flow = _smooth_flow(rng, 1, 16, 128, mag=1.5)  # in-budget gradient
    cot = jnp.asarray(rng.random((1, 16, 128, 2)), jnp.float32)

    def loss_tiled(i, f):
        return jnp.sum(warp_tiled(i, f) * cot)

    def loss_gather(i, f):
        return jnp.sum(_warp_xla(i, f, "zeros") * cot)

    gi_t, gf_t = jax.grad(loss_tiled, (0, 1))(img, flow)
    gi_g, gf_g = jax.grad(loss_gather, (0, 1))(img, flow)
    np.testing.assert_allclose(np.asarray(gi_t), np.asarray(gi_g),
                               rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(gf_t), np.asarray(gf_g),
                               rtol=1e-4, atol=1e-4)


def test_tiled_bf16_dtype(rng, warp_tiled):
    img = jnp.asarray(rng.random((1, 16, 128, 4)), jnp.bfloat16)
    flow = _smooth_flow(rng, 1, 16, 128, mag=2.0)
    out = warp_tiled(img, flow)
    assert out.dtype == jnp.bfloat16
    want = _warp_xla(img, flow, "zeros")
    np.testing.assert_allclose(
        np.asarray(out, np.float32), np.asarray(want, np.float32),
        rtol=2e-2, atol=2e-2)
