"""Round-5 SR-head skip fold: the bilinear x`r` upsample in pre-shuffle
form must equal a 3x3 conv with the constant `_bilinear_ps_kernel` under
edge-replicate padding — exactly, including borders (the half-pixel tap
centers stay within (-0.5, 0.5), and edge pad reproduces the resize's
clamp)."""

import numpy as np
import jax.numpy as jnp
import pytest

from video_super_resolution_tpu.models.common import thin_conv9
from video_super_resolution_tpu.models.sr_head import _bilinear_ps_kernel
from video_super_resolution_tpu.ops.resize import upsample_bilinear_ps


@pytest.mark.parametrize("r", [2, 4])
def test_bilinear_ps_kernel_matches_resize(r):
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.random((2, 13, 17, 3)), jnp.float32)
    ref = upsample_bilinear_ps(x, r)
    k = jnp.asarray(_bilinear_ps_kernel(r), jnp.float32)
    got = thin_conv9(x, k, jnp.float32, pad_mode="edge")
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               atol=1e-6)


def test_bilinear_ps_kernel_partition_of_unity():
    # each output phase's taps sum to 1 per input channel (bilinear blend)
    for r in (2, 4):
        k = _bilinear_ps_kernel(r)
        sums = k.sum(axis=(0, 1, 2))            # (3*r^2,)
        np.testing.assert_allclose(sums, 1.0, atol=1e-6)


def test_seg_perm_roundtrip():
    """_seg_perm maps the standard packed weight-row order to the
    segmented lane-concat order: applying it to an iota must place each
    segment block at the position the seg layout reads it from."""
    from video_super_resolution_tpu.ops.pallas.fused_conv import _seg_perm

    cin = 128
    perm = _seg_perm(cin)
    assert sorted(perm.tolist()) == list(range(2 * cin))
    half = cin // 2
    # our lane j=0..half-1 is px0 of group 0 -> std rows 0..half-1
    assert perm[:half].tolist() == list(range(0, half))
    # our lanes half..cin-1 are px1 of group 0 -> std rows cin..cin+half-1
    assert perm[half:cin].tolist() == list(range(cin, cin + half))
