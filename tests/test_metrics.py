"""PSNR/SSIM conventions vs independent formulas/known values."""

import numpy as np
import pytest

from video_super_resolution_tpu.evaluation.metrics import psnr, rgb_to_y, ssim


def test_psnr_known_value(rng):
    t = rng.random((32, 32, 3)).astype(np.float64)
    noise = 0.01
    p = np.clip(t + noise, 0, 1)
    # uniform offset (away from clip): PSNR = -20 log10(noise)
    t2 = rng.random((32, 32, 3)) * 0.5 + 0.25
    p2 = t2 + noise
    got = psnr(p2, t2, y_channel=False, border_crop=0)
    assert abs(got - (-20 * np.log10(noise))) < 1e-6


def test_psnr_identical_inf(rng):
    t = rng.random((16, 16, 3))
    assert psnr(t, t, y_channel=False, border_crop=0) == float("inf")


def test_rgb_to_y_range():
    assert abs(rgb_to_y(np.zeros((1, 1, 3)))[0, 0, 0] - 16 / 255) < 1e-9
    assert abs(rgb_to_y(np.ones((1, 1, 3)))[0, 0, 0] - 235 / 255) < 1e-3


def test_border_crop_changes_result(rng):
    t = rng.random((32, 32, 3))
    p = t.copy()
    p[0, 0] = 0.0  # corrupt a border pixel
    assert psnr(p, t, y_channel=False, border_crop=4) == float("inf")
    assert psnr(p, t, y_channel=False, border_crop=0) < 80


def test_ssim_identical_is_one(rng):
    t = rng.random((32, 32, 3))
    assert abs(ssim(t, t, y_channel=False, border_crop=0) - 1.0) < 1e-9


def test_ssim_matches_skimage_if_available(rng):
    try:
        from skimage.metrics import structural_similarity
    except ImportError:
        pytest.skip("skimage not installed")
    t = rng.random((48, 48)).astype(np.float64)
    p = np.clip(t + rng.normal(0, 0.05, t.shape), 0, 1)
    want = structural_similarity(
        p, t, win_size=11, gaussian_weights=True, sigma=1.5,
        use_sample_covariance=False, data_range=1.0,
    )
    got = ssim(p[..., None], t[..., None], y_channel=False, border_crop=0)
    assert abs(got - want) < 5e-3


def test_ssim_degrades_with_noise(rng):
    t = rng.random((48, 48, 3))
    p1 = np.clip(t + rng.normal(0, 0.02, t.shape), 0, 1)
    p2 = np.clip(t + rng.normal(0, 0.2, t.shape), 0, 1)
    s1 = ssim(p1, t, y_channel=False, border_crop=0)
    s2 = ssim(p2, t, y_channel=False, border_crop=0)
    assert s1 > s2 > 0
