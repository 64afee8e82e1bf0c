"""Dataset: window policy, crops, augmentation, synthetic clips."""

import numpy as np
import pytest

from video_super_resolution_tpu.data import (
    ClipDataset,
    moving_gradient_clip,
    sliding_window_indices,
    synthetic_clip_pair,
)
from video_super_resolution_tpu.data.degrade import degrade_bicubic


def test_sliding_window_replicate():
    assert sliding_window_indices(10, 0, 3) == [0, 0, 1]
    assert sliding_window_indices(10, 9, 3) == [8, 9, 9]
    assert sliding_window_indices(10, 5, 5) == [3, 4, 5, 6, 7]


def test_sliding_window_reflect():
    assert sliding_window_indices(10, 0, 3, "reflect") == [1, 0, 1]
    assert sliding_window_indices(10, 9, 5, "reflect") == [7, 8, 9, 8, 7]


def test_moving_gradient_clip_flow():
    """Consecutive frames really are shifted copies (interior, known flow)."""
    frames, flow = moving_gradient_clip(num_frames=3, h=32, w=32, dx=2.0, dy=1.0)
    # frame1 sampled at +(dx,dy): frame1[y, x] == frame0[y+dy, x+dx]
    np.testing.assert_allclose(
        frames[1][:-1, :-2], frames[0][1:, 2:], atol=1e-5
    )
    assert tuple(flow) == (2.0, 1.0)


def test_synthetic_pair_shapes():
    lr, hr = synthetic_clip_pair(num_frames=3, hr_h=64, hr_w=96, scale=4)
    assert hr.shape == (3, 64, 96, 3)
    assert lr.shape == (3, 16, 24, 3)
    assert lr.min() >= 0 and lr.max() <= 1


def test_degrade_rejects_bad_scale():
    with pytest.raises(ValueError):
        degrade_bicubic(np.zeros((10, 10, 3), np.float32), 4)


def _mem_dataset(window=3, augment=False, **kw):
    hr = {}
    for i, name in enumerate(["a", "b"]):
        clip, _ = moving_gradient_clip(num_frames=6, h=96, w=96, seed=i)
        hr[name] = clip
    return ClipDataset(clips_hr=hr, window=window, scale=4, crop_size=16,
                       augment=augment, **kw)


def test_dataset_sample_shapes():
    ds = _mem_dataset()
    s = ds.sample()
    assert s["lr"].shape == (3, 16, 16, 3)
    assert s["hr"].shape == (64, 64, 3)


def test_dataset_batches():
    ds = _mem_dataset(augment=True)
    batch = next(ds.batches(4))
    assert batch["lr"].shape == (4, 3, 16, 16, 3)
    assert batch["hr"].shape == (4, 64, 64, 3)


def test_dataset_crop_alignment():
    """The HR crop must be exactly the x4 region of the LR crop: degrade the
    HR crop and it should be close to the LR crop (same degradation)."""
    ds = _mem_dataset()
    s = ds.sample()
    # LR was produced by degrading the full HR frame; interior of the crop
    # matches degrading the crop (the antialias kernel is local).
    re_lr = degrade_bicubic(s["hr"][None], 4)[0]
    np.testing.assert_allclose(re_lr[2:-2, 2:-2], s["lr"][1, 2:-2, 2:-2], atol=2e-2)


def test_eval_windows_order():
    ds = _mem_dataset()
    centers = [b["center"] for b in ds.eval_windows("a")]
    assert centers == list(range(6))
