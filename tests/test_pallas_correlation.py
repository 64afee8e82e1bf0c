"""Pallas correlation kernel vs XLA implementation (interpret mode on CPU)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from video_super_resolution_tpu.ops.correlation import _correlation_xla
from video_super_resolution_tpu.ops.pallas.correlation_tpu import correlation_pallas


@pytest.mark.parametrize("shape,d", [
    ((1, 16, 16, 8), 2),
    ((2, 8, 24, 16), 4),
    ((1, 12, 12, 3), 1),   # odd channel count
])
def test_pallas_correlation_matches_xla(rng, shape, d):
    f1 = jnp.asarray(rng.standard_normal(shape), jnp.float32)
    f2 = jnp.asarray(rng.standard_normal(shape), jnp.float32)
    got = np.asarray(correlation_pallas(f1, f2, d, True))
    want = np.asarray(_correlation_xla(f1, f2, d))
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)


def test_pallas_correlation_odd_height(rng):
    """H not divisible by 8 falls back to smaller tile."""
    f1 = jnp.asarray(rng.standard_normal((1, 6, 16, 8)), jnp.float32)
    f2 = jnp.asarray(rng.standard_normal((1, 6, 16, 8)), jnp.float32)
    got = np.asarray(correlation_pallas(f1, f2, 2, True))
    want = np.asarray(_correlation_xla(f1, f2, 2))
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)


def test_pallas_correlation_grad_matches_xla(rng):
    f1 = jnp.asarray(rng.standard_normal((1, 8, 8, 4)), jnp.float32)
    f2 = jnp.asarray(rng.standard_normal((1, 8, 8, 4)), jnp.float32)

    def loss_p(a, b):
        return jnp.sum(correlation_pallas(a, b, 2, True) ** 2)

    def loss_x(a, b):
        return jnp.sum(_correlation_xla(a, b, 2) ** 2)

    gp = jax.grad(loss_p, argnums=(0, 1))(f1, f2)
    gx = jax.grad(loss_x, argnums=(0, 1))(f1, f2)
    for a, b in zip(gp, gx):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-5, atol=1e-5)


def test_pallas_correlation_bf16_input(rng):
    f1 = jnp.asarray(rng.standard_normal((1, 8, 16, 8)), jnp.bfloat16)
    f2 = jnp.asarray(rng.standard_normal((1, 8, 16, 8)), jnp.bfloat16)
    got = np.asarray(correlation_pallas(f1, f2, 2, True))
    want = np.asarray(_correlation_xla(f1, f2, 2))
    assert got.dtype == np.float32
    np.testing.assert_allclose(got, want, rtol=1e-2, atol=1e-2)
