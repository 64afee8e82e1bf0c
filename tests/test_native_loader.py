"""Native C++ data path vs the Python reference implementation."""

import os
import subprocess

import numpy as np
import pytest

from video_super_resolution_tpu.data import native_loader
from video_super_resolution_tpu.data.degrade import degrade_bicubic
from video_super_resolution_tpu.data.synthetic import moving_gradient_clip

pytestmark = pytest.mark.skipif(
    not native_loader.available(),
    reason="native/libvsr_dataio.so not built (make -C native)",
)


@pytest.fixture(scope="module")
def png_clips(tmp_path_factory):
    root = tmp_path_factory.mktemp("native_clips")
    from PIL import Image

    clips = {}
    for name in ["a", "b"]:
        d = root / name
        d.mkdir()
        frames, _ = moving_gradient_clip(num_frames=5, h=96, w=96,
                                         seed=ord(name))
        paths = []
        for i, f in enumerate(frames):
            p = str(d / f"{i:04d}.png")
            Image.fromarray((f * 255).astype(np.uint8)).save(p)
            paths.append(p)
        clips[name] = paths
    return clips


def test_decode_png_matches_pil(png_clips):
    from PIL import Image

    p = png_clips["a"][0]
    want = np.asarray(Image.open(p).convert("RGB"), np.float32) / 255.0
    got = native_loader.decode_png(p)
    np.testing.assert_allclose(got, want, atol=1e-6)


def test_native_bicubic_matches_python(rng):
    img = rng.random((64, 80, 3)).astype(np.float32)
    got = native_loader.resize_bicubic_aa(img, 16, 20)
    want = degrade_bicubic(img[None], 4)[0]
    np.testing.assert_allclose(got, want, rtol=2e-5, atol=2e-5)


def test_native_loader_batches(png_clips):
    ld = native_loader.NativeClipLoader(
        png_clips, window=3, scale=4, crop_size=16, batch_size=2,
        num_workers=2, seed=7,
    )
    for _ in range(3):
        batch = next(ld)
        assert batch["lr"].shape == (2, 3, 16, 16, 3)
        assert batch["hr"].shape == (2, 64, 64, 3)
        assert 0.0 <= batch["lr"].min() and batch["lr"].max() <= 1.0
        assert batch["lr"].std() > 0.01  # real image content
    ld.close()


def test_native_loader_lr_consistent_with_degrade(png_clips):
    """LR window frames must equal python degradation of the HR frames (no
    augment, crop = full LR frame)."""
    ld = native_loader.NativeClipLoader(
        png_clips, window=3, scale=4, crop_size=24, batch_size=1,
        augment=False, num_workers=1, seed=3,
    )
    batch = next(ld)
    ld.close()
    # center LR frame degraded from SOME 96x96 HR frame: check it matches a
    # crop of the degradation of whichever frame it is
    lr_c = batch["lr"][0, 1]
    hr = batch["hr"][0]
    re_lr = degrade_bicubic(hr[None], 4)[0]
    # hr is the crop*scale HR patch aligned with the LR crop; interior match
    np.testing.assert_allclose(re_lr[2:-2, 2:-2], lr_c[2:-2, 2:-2], atol=2e-2)
