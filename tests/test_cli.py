"""CLI: train a few steps on synthetic clips, eval the checkpoint, infer."""

import json
import os
import subprocess
import sys

import numpy as np
import pytest

from video_super_resolution_tpu import cli
from video_super_resolution_tpu.data.synthetic import moving_gradient_clip

TINY_SET = [
    "model.pyramid_channels=8,16",
    "model.flow_estimator_channels=16,16",
    "model.context_channels=16,16",
    "model.depth_channels=8",
    "model.depth_levels=2",
    "model.fusion_channels=16",
    "model.sr_channels=16",
    "model.sr_blocks=2",
    "data.crop_size=16",
    "data.batch_size=2",
    "train.warmup_steps=0",
    "train.ckpt_every=4",
    "train.log_every=2",
]


@pytest.fixture(scope="module")
def clip_root(tmp_path_factory):
    root = tmp_path_factory.mktemp("clips")
    from PIL import Image

    for name in ["clip_a", "clip_b"]:
        d = root / name
        d.mkdir()
        frames, _ = moving_gradient_clip(num_frames=4, h=96, w=96,
                                         seed=hash(name) % 100)
        for i, f in enumerate(frames):
            Image.fromarray((f * 255).astype(np.uint8)).save(
                d / f"{i:04d}.png"
            )
    return str(root)


def test_cli_train_eval_infer(clip_root, tmp_path):
    ckpt = str(tmp_path / "ckpt")
    cli.main([
        "train", "--hr-root", clip_root, "--ckpt-dir", ckpt,
        "--steps", "4", "--set", *TINY_SET,
    ])
    assert os.path.isdir(ckpt)

    # eval prints JSON with psnr/ssim per clip
    import io
    from contextlib import redirect_stdout

    buf = io.StringIO()
    with redirect_stdout(buf):
        cli.main(["eval", "--hr-root", clip_root, "--ckpt-dir", ckpt])
    res = json.loads(buf.getvalue())
    assert "__average__" in res
    assert 5.0 < res["__average__"]["psnr"] < 100.0

    # infer writes x4 PNGs
    lr_root = str(tmp_path / "lr")
    out_root = str(tmp_path / "out")
    os.makedirs(lr_root + "/clip_a", exist_ok=True)
    from PIL import Image

    frames, _ = moving_gradient_clip(num_frames=3, h=24, w=24)
    for i, f in enumerate(frames):
        Image.fromarray((f * 255).astype(np.uint8)).save(
            f"{lr_root}/clip_a/{i:04d}.png"
        )
    cli.main(["infer", "--lr-root", lr_root, "--out-dir", out_root,
              "--ckpt-dir", ckpt])
    outs = sorted(os.listdir(out_root + "/clip_a"))
    assert len(outs) == 3
    im = Image.open(f"{out_root}/clip_a/{outs[0]}")
    assert im.size == (96, 96)


def test_cli_bad_override():
    with pytest.raises(SystemExit):
        cli.main(["train", "--hr-root", "/nonexistent",
                  "--set", "model.bogus=1"])
