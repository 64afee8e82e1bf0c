"""Correlation (cost volume) vs naive numpy oracle, fwd + grad."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from video_super_resolution_tpu.ops import correlation


def naive_correlation(f1, f2, d):
    b, h, w, c = f1.shape
    k = (2 * d + 1) ** 2
    out = np.zeros((b, h, w, k), np.float32)
    f2p = np.pad(f2, ((0, 0), (d, d), (d, d), (0, 0)))
    i = 0
    for dy in range(-d, d + 1):
        for dx in range(-d, d + 1):
            shifted = f2p[:, d + dy : d + dy + h, d + dx : d + dx + w, :]
            out[..., i] = (f1 * shifted).sum(-1) / c
            i += 1
    return out


@pytest.mark.parametrize("d", [1, 4])
def test_correlation_forward(rng, d):
    f1 = rng.standard_normal((2, 12, 16, 8), dtype=np.float32)
    f2 = rng.standard_normal((2, 12, 16, 8), dtype=np.float32)
    got = np.asarray(correlation(jnp.asarray(f1), jnp.asarray(f2), d))
    want = naive_correlation(f1, f2, d)
    assert got.shape == (2, 12, 16, (2 * d + 1) ** 2)
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)


def test_correlation_zero_displacement_is_dot(rng):
    f = rng.standard_normal((1, 6, 6, 4), dtype=np.float32)
    out = np.asarray(correlation(jnp.asarray(f), jnp.asarray(f), 0))
    np.testing.assert_allclose(out[..., 0], (f * f).sum(-1) / 4, rtol=1e-5)


def test_correlation_grad_matches_fd(rng):
    d = 2
    f1 = rng.standard_normal((1, 6, 8, 4), dtype=np.float32)
    f2 = rng.standard_normal((1, 6, 8, 4), dtype=np.float32)

    def loss(a, b):
        return jnp.sum(correlation(a, b, d) ** 2)

    g1, g2 = jax.grad(loss, argnums=(0, 1))(jnp.asarray(f1), jnp.asarray(f2))
    eps = 1e-3
    for arr, g, which in [(f1, g1, 0), (f2, g2, 1)]:
        idx = (0, 3, 4, 1)
        pert = arr.copy()
        pert[idx] += eps
        args = [f1, f2]
        args[which] = pert
        lp = float(loss(jnp.asarray(args[0]), jnp.asarray(args[1])))
        pert[idx] -= 2 * eps
        lm = float(loss(jnp.asarray(args[0]), jnp.asarray(args[1])))
        fd = (lp - lm) / (2 * eps)
        assert abs(fd - float(g[idx])) < 1e-2 * max(1.0, abs(fd))


def test_correlation_bf16_accumulates_f32(rng):
    f1 = rng.standard_normal((1, 8, 8, 16), dtype=np.float32)
    f2 = rng.standard_normal((1, 8, 8, 16), dtype=np.float32)
    out = correlation(jnp.asarray(f1, jnp.bfloat16), jnp.asarray(f2, jnp.bfloat16), 1)
    assert out.dtype == jnp.float32
