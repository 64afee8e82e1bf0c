"""Frozen golden end-to-end regression (VERDICT r1 item 4).

Runs the composed model with a FIXED init key on a FIXED synthetic window
and compares against values frozen on 2026-08-19 (f32, CPU). Catches
silent inter-round numerics regressions that per-op parity tests miss.
Regenerate the fixture ONLY for an intentional numerics change:

    python tests/test_golden_regression.py   # rewrites tests/golden/e2e.npz
"""

import os

import jax
import jax.numpy as jnp
import numpy as np

from video_super_resolution_tpu.config import ModelConfig
from video_super_resolution_tpu.models.vsr import VSRModel

GOLDEN = os.path.join(os.path.dirname(__file__), "golden", "e2e.npz")


def _cfg():
    return ModelConfig(
        window=3, pyramid_levels=3, pyramid_channels=(8, 16, 32),
        max_displacement=2, flow_finest_level=1,
        flow_estimator_channels=(16, 12), context_channels=(16, 12),
        depth_channels=8, depth_levels=2, fusion_channels=16,
        sr_channels=16, sr_blocks=3, sr_wide_blocks=False,
        warp_impl="gather",
        # pinned: the fixture was frozen with quarter-res depth (round 4);
        # the FIELD default reverted to legacy-derived in round 5
        depth_res_divisor=4,
    )


def _run():
    cfg = _cfg()
    model = VSRModel(cfg=cfg, dtype=jnp.float32)
    # fixed deterministic input: product-of-sinusoids moving pattern
    t = np.arange(3, dtype=np.float32)[:, None, None, None]
    y = np.arange(24, dtype=np.float32)[None, :, None, None]
    x = np.arange(32, dtype=np.float32)[None, None, :, None]
    c = np.arange(3, dtype=np.float32)[None, None, None, :]
    window = (0.5 + 0.4 * np.sin(0.3 * (x + 2 * t) + 0.7 * c)
              * np.cos(0.2 * (y - t)))[None].astype(np.float32)
    params = model.init(jax.random.key(42), jnp.asarray(window))["params"]
    out = model.apply({"params": params}, jnp.asarray(window))
    return np.asarray(out, np.float32)


def test_golden_e2e_frozen():
    out = _run()
    ref = np.load(GOLDEN)
    assert out.shape == tuple(ref["shape"])
    np.testing.assert_allclose(float(out.mean()), float(ref["mean"]),
                               rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(float(np.abs(out).max()),
                               float(ref["absmax"]), rtol=1e-5, atol=1e-6)
    sub = out[0, ::64, ::64, :]
    np.testing.assert_allclose(sub, ref["subsample"], rtol=1e-4, atol=1e-5)


if __name__ == "__main__":
    out = _run()
    os.makedirs(os.path.dirname(GOLDEN), exist_ok=True)
    np.savez(GOLDEN, shape=np.asarray(out.shape), mean=out.mean(),
             absmax=np.abs(out).max(), subsample=out[0, ::64, ::64, :])
    print("frozen", out.shape, out.mean())
