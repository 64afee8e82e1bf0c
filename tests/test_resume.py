"""Fault injection / crash-resume (SURVEY.md §5.3): kill training mid-run,
restart from the latest checkpoint, training continues from the saved step
with identical state."""

import numpy as np
import pytest

from video_super_resolution_tpu.config import (
    DataConfig, ModelConfig, TrainConfig, VSRConfig,
)
from video_super_resolution_tpu.data import ClipDataset
from video_super_resolution_tpu.data.synthetic import moving_gradient_clip
from video_super_resolution_tpu.training.loop import train


def _cfg(tmp_path, steps):
    return VSRConfig(
        model=ModelConfig(
            pyramid_channels=(8, 16), flow_estimator_channels=(16, 16),
            context_channels=(16, 16), depth_channels=8, depth_levels=2,
            fusion_channels=16, sr_channels=16, sr_blocks=2,
        ),
        data=DataConfig(crop_size=16, batch_size=2),
        train=TrainConfig(
            warmup_steps=0, lr=1e-3, steps=steps, ckpt_every=2,
            log_every=100, ckpt_dir=str(tmp_path / "ckpt"),
        ),
    )


def _ds():
    clip, _ = moving_gradient_clip(num_frames=5, h=96, w=96)
    return ClipDataset(clips_hr={"c": clip}, window=3, scale=4,
                       crop_size=16, augment=False)


def test_crash_resume_continues_from_checkpoint(tmp_path):
    # "crash" after 4 steps (train() returns; the process dying between
    # steps is equivalent — the checkpoint at step 4 is what survives)
    cfg = _cfg(tmp_path, steps=4)
    out1 = train(cfg, _ds())
    assert int(out1["state"].step) == 4
    out1["ckpt"].close()

    # relaunch with a higher step budget: must resume at 4, not 0
    cfg2 = _cfg(tmp_path, steps=6)
    out2 = train(cfg2, _ds())
    assert int(out2["state"].step) == 6
    out2["ckpt"].close()

    # restored optimizer state advanced (adam step count == 6)
    import jax

    counts = [x for x in jax.tree.leaves(out2["state"].opt_state)
              if np.asarray(x).shape == ()]
    assert any(int(c) == 6 for c in counts)


def test_nan_detection_utility():
    from video_super_resolution_tpu.utils.debug import find_nonfinite

    tree = {"a": np.ones(3), "b": np.array([1.0, np.nan, np.inf])}
    bad = find_nonfinite(tree)
    assert len(bad) == 1
    (k, (n_nan, n_inf)), = bad.items()
    assert "b" in k and n_nan == 1 and n_inf == 1
