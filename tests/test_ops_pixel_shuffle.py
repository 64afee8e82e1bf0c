"""pixel_shuffle vs torch.nn.functional.pixel_shuffle (channel-order parity)."""

import jax.numpy as jnp
import numpy as np
import pytest
import torch
import torch.nn.functional as F

from video_super_resolution_tpu.ops import pixel_shuffle, pixel_unshuffle


@pytest.mark.parametrize("r", [2, 4])
def test_pixel_shuffle_matches_torch(rng, r):
    b, h, w, c = 2, 5, 6, 3
    x = rng.standard_normal((b, h, w, c * r * r), dtype=np.float32)
    got = np.asarray(pixel_shuffle(jnp.asarray(x), r))
    want = (
        F.pixel_shuffle(torch.from_numpy(x).permute(0, 3, 1, 2), r)
        .permute(0, 2, 3, 1)
        .numpy()
    )
    assert got.shape == (b, h * r, w * r, c)
    np.testing.assert_array_equal(got, want)


@pytest.mark.parametrize("r", [2, 3])
def test_pixel_unshuffle_roundtrip(rng, r):
    x = rng.standard_normal((1, 4, 6, 5 * r * r), dtype=np.float32)
    y = pixel_unshuffle(pixel_shuffle(jnp.asarray(x), r), r)
    np.testing.assert_array_equal(np.asarray(y), x)
