"""Fused conv(+pixel-shuffle) Pallas kernel vs XLA conv (interpret mode)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from video_super_resolution_tpu.ops.pallas.fused_conv import (
    _xla_conv,
    fused_conv3x3,
)


@pytest.mark.parametrize("shape,cout", [
    ((1, 16, 16, 8), 16),
    ((2, 8, 24, 3), 8),
    ((1, 12, 8, 16), 4),   # H=12 -> th=4
])
def test_fused_conv_matches_xla(rng, shape, cout):
    x = jnp.asarray(rng.standard_normal(shape), jnp.float32)
    w = jnp.asarray(rng.standard_normal((3, 3, shape[-1], cout)) * 0.1,
                    jnp.float32)
    b = jnp.asarray(rng.standard_normal((cout,)), jnp.float32)
    got = np.asarray(fused_conv3x3(x, w, b, 0.1, False, True))
    want = np.asarray(_xla_conv(x, w, b, 0.1, False))
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


def test_fused_conv_shuffle_matches_xla(rng):
    x = jnp.asarray(rng.standard_normal((2, 8, 12, 16)), jnp.float32)
    w = jnp.asarray(rng.standard_normal((3, 3, 16, 32)) * 0.1, jnp.float32)
    b = jnp.asarray(rng.standard_normal((32,)), jnp.float32)
    got = np.asarray(fused_conv3x3(x, w, b, 0.1, True, True))
    want = np.asarray(_xla_conv(x, w, b, 0.1, True))
    assert got.shape == (2, 16, 24, 8)
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


def test_fused_conv_grad_matches_xla(rng):
    x = jnp.asarray(rng.standard_normal((1, 8, 8, 4)), jnp.float32)
    w = jnp.asarray(rng.standard_normal((3, 3, 4, 8)) * 0.1, jnp.float32)
    b = jnp.asarray(rng.standard_normal((8,)), jnp.float32)

    gp = jax.grad(lambda *a: jnp.sum(fused_conv3x3(*a, 0.1, False, True) ** 2),
                  argnums=(0, 1, 2))(x, w, b)
    gx = jax.grad(lambda *a: jnp.sum(_xla_conv(*a, 0.1, False) ** 2),
                  argnums=(0, 1, 2))(x, w, b)
    for a, b_ in zip(gp, gx):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b_),
                                   rtol=1e-4, atol=1e-4)


def test_fused_conv_bf16(rng):
    x = jnp.asarray(rng.standard_normal((1, 8, 16, 8)), jnp.bfloat16)
    w = jnp.asarray(rng.standard_normal((3, 3, 8, 16)) * 0.1, jnp.bfloat16)
    b = jnp.asarray(rng.standard_normal((16,)), jnp.bfloat16)
    got = np.asarray(fused_conv3x3(x, w, b, 0.1, False, True).astype(jnp.float32))
    want = np.asarray(_xla_conv(x, w, b, 0.1, False).astype(jnp.float32))
    np.testing.assert_allclose(got, want, rtol=2e-2, atol=2e-2)


def test_fused_conv_cin_pad_alignment(rng):
    """cin not a multiple of 128 pads K with zeros (exact)."""
    x = jnp.asarray(rng.standard_normal((1, 8, 16, 35)), jnp.float32)
    w = jnp.asarray(rng.standard_normal((3, 3, 35, 16)) * 0.1, jnp.float32)
    b = jnp.asarray(rng.standard_normal((16,)), jnp.float32)
    got = np.asarray(fused_conv3x3(x, w, b, 0.1, False, True))
    want = np.asarray(_xla_conv(x, w, b, 0.1, False))
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


def test_fused_conv_kpair_path(rng, monkeypatch):
    """ky-pair K-packed variant (flag-gated): fwd + grad parity."""
    monkeypatch.setenv("VSR_CONV_KPAIR", "1")
    x = jnp.asarray(rng.standard_normal((2, 8, 24, 64)) * 0.1, jnp.float32)
    w = jnp.asarray(rng.standard_normal((3, 3, 64, 32)) * 0.1, jnp.float32)
    b = jnp.asarray(rng.standard_normal((32,)), jnp.float32)
    got = np.asarray(fused_conv3x3(x, w, b, 0.1, False, True))
    want = np.asarray(_xla_conv(x, w, b, 0.1, False))
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)
    gp = jax.grad(lambda a: jnp.sum(fused_conv3x3(a, w, b, 0.1, False, True) ** 2))(x)
    gx = jax.grad(lambda a: jnp.sum(_xla_conv(a, w, b, 0.1, False) ** 2))(x)
    np.testing.assert_allclose(np.asarray(gp), np.asarray(gx),
                               rtol=1e-4, atol=1e-4)


def test_fused_conv_dilated(rng):
    """Dilated taps (context-net convs): fwd + grad parity for d in 1..8."""
    x = jnp.asarray(rng.standard_normal((1, 16, 24, 64)) * 0.1, jnp.float32)
    w = jnp.asarray(rng.standard_normal((3, 3, 64, 16)) * 0.1, jnp.float32)
    b = jnp.asarray(rng.standard_normal((16,)), jnp.float32)
    for d in (2, 4, 8):
        got = np.asarray(fused_conv3x3(x, w, b, 0.1, False, True, d))
        want = np.asarray(_xla_conv(x, w, b, 0.1, False, d))
        np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)
        gp = jax.grad(lambda a: jnp.sum(
            fused_conv3x3(a, w, b, 0.1, False, True, d) ** 2))(x)
        gx = jax.grad(lambda a: jnp.sum(_xla_conv(a, w, b, 0.1, False, d) ** 2))(x)
        np.testing.assert_allclose(np.asarray(gp), np.asarray(gx),
                                   rtol=1e-4, atol=1e-4)


@pytest.mark.parametrize("res_repeat", [1, 2])
def test_fused_conv_res_matches_xla(rng, res_repeat):
    """Broadcast-residual epilogue (ScoreConv fusion, round 4)."""
    b, h, w, cin, cout = 4, 8, 16, 8, 16
    x = jnp.asarray(rng.standard_normal((b, h, w, cin)), jnp.float32)
    wgt = jnp.asarray(rng.standard_normal((3, 3, cin, cout)) * 0.1,
                      jnp.float32)
    bias = jnp.asarray(rng.standard_normal((cout,)), jnp.float32)
    res = jnp.asarray(
        rng.standard_normal((b // res_repeat, h, w, cout)), jnp.float32)
    got = np.asarray(
        fused_conv3x3(x, wgt, bias, 0.1, False, True, 1, res, res_repeat))
    want = np.asarray(
        _xla_conv(x, wgt, bias, 0.1, False, 1, res, res_repeat))
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


def test_fused_conv_res_grad_matches_xla(rng):
    b, h, w, cin, cout = 2, 8, 8, 4, 8
    x = jnp.asarray(rng.standard_normal((b, h, w, cin)), jnp.float32)
    wgt = jnp.asarray(rng.standard_normal((3, 3, cin, cout)) * 0.1,
                      jnp.float32)
    bias = jnp.asarray(rng.standard_normal((cout,)), jnp.float32)
    res = jnp.asarray(rng.standard_normal((1, h, w, cout)), jnp.float32)

    gp = jax.grad(
        lambda a, ww, bb, r: jnp.sum(
            fused_conv3x3(a, ww, bb, 0.1, False, True, 1, r, b) ** 2),
        argnums=(0, 1, 2, 3))(x, wgt, bias, res)
    gx = jax.grad(
        lambda a, ww, bb, r: jnp.sum(
            _xla_conv(a, ww, bb, 0.1, False, 1, r, b) ** 2),
        argnums=(0, 1, 2, 3))(x, wgt, bias, res)
    for a, b_ in zip(gp, gx):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b_),
                                   rtol=1e-4, atol=1e-4)
