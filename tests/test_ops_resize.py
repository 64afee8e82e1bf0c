"""Resize semantics vs torch F.interpolate (parity-critical, SURVEY.md §7.2-3)."""

import jax.numpy as jnp
import numpy as np
import pytest
import torch
import torch.nn.functional as F

from video_super_resolution_tpu.ops import resize_bicubic, resize_bilinear


def t_interp(x, size, mode, antialias=False, align_corners=False):
    t = torch.from_numpy(x).permute(0, 3, 1, 2)
    kw = {} if mode == "nearest" else {"align_corners": align_corners}
    out = F.interpolate(t, size=size, mode=mode, antialias=antialias, **kw)
    return out.permute(0, 2, 3, 1).numpy()


def test_bilinear_up_matches_torch(rng):
    x = rng.random((2, 9, 11, 3), dtype=np.float32)
    got = np.asarray(resize_bilinear(jnp.asarray(x), 18, 22))
    want = t_interp(x, (18, 22), "bilinear")
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)


def test_bilinear_align_corners_matches_torch(rng):
    x = rng.random((1, 7, 7, 2), dtype=np.float32)
    got = np.asarray(resize_bilinear(jnp.asarray(x), 14, 14, align_corners=True))
    want = t_interp(x, (14, 14), "bilinear", align_corners=True)
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)


def test_bicubic_up_matches_torch(rng):
    x = rng.random((1, 12, 10, 3), dtype=np.float32)
    got = np.asarray(resize_bicubic(jnp.asarray(x), 48, 40, a=-0.75, antialias=False))
    want = t_interp(x, (48, 40), "bicubic")
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)


def test_bicubic_antialias_down_matches_torch(rng):
    """torch antialias bicubic == PIL == our (a=-0.5, antialias) path."""
    x = rng.random((1, 32, 40, 3), dtype=np.float32)
    got = np.asarray(
        resize_bicubic(jnp.asarray(x), 8, 10, a=-0.5, antialias=True, edge="exclude")
    )
    want = t_interp(x, (8, 10), "bicubic", antialias=True)
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)


@pytest.mark.parametrize("shape", [(16, 16), (9, 13)])
def test_resize_identity(rng, shape):
    x = rng.random((1, *shape, 3), dtype=np.float32)
    got = np.asarray(resize_bilinear(jnp.asarray(x), *shape))
    np.testing.assert_allclose(got, x, atol=1e-6)
