"""Pallas warp kernel vs XLA warp (interpret mode on CPU)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from video_super_resolution_tpu.ops.warp import _warp_xla
from video_super_resolution_tpu.ops.pallas.warp_tpu import warp_pallas, _fits_vmem


@pytest.mark.parametrize("padding_mode", ["zeros", "border"])
def test_pallas_warp_matches_xla(rng, padding_mode):
    img = jnp.asarray(rng.standard_normal((2, 12, 16, 8)), jnp.float32)
    flow = jnp.asarray(rng.standard_normal((2, 12, 16, 2)) * 3, jnp.float32)
    got = np.asarray(warp_pallas(img, flow, padding_mode, True))
    want = np.asarray(_warp_xla(img, flow, padding_mode))
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)


def test_pallas_warp_zero_flow_identity(rng):
    img = jnp.asarray(rng.standard_normal((1, 8, 8, 4)), jnp.float32)
    flow = jnp.zeros((1, 8, 8, 2), jnp.float32)
    got = np.asarray(warp_pallas(img, flow, "zeros", True))
    np.testing.assert_allclose(got, np.asarray(img), rtol=1e-6, atol=1e-6)


def test_pallas_warp_grad_matches_xla(rng):
    img = jnp.asarray(rng.standard_normal((1, 6, 8, 4)), jnp.float32)
    flow = jnp.asarray(rng.standard_normal((1, 6, 8, 2)) * 0.5, jnp.float32)

    gp = jax.grad(
        lambda i, f: jnp.sum(warp_pallas(i, f, "zeros", True) ** 2),
        argnums=(0, 1),
    )(img, flow)
    gx = jax.grad(
        lambda i, f: jnp.sum(_warp_xla(i, f, "zeros") ** 2), argnums=(0, 1)
    )(img, flow)
    for a, b in zip(gp, gx):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=1e-5)


def test_pallas_warp_oversized_falls_back(rng):
    """Images beyond the VMEM budget silently route to XLA (same result)."""
    assert not _fits_vmem(1024, 1024, 64, 4)
    img = jnp.asarray(rng.standard_normal((1, 1024, 32, 64)), jnp.float32)
    # force the fallback path by shape: 1024*32*64*4*5 = 41MB > budget
    assert not _fits_vmem(1024, 32, 64, 4)
    flow = jnp.asarray(rng.standard_normal((1, 1024, 32, 2)), jnp.float32)
    got = np.asarray(warp_pallas(img, flow, "zeros", True))
    want = np.asarray(_warp_xla(img, flow, "zeros"))
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)
