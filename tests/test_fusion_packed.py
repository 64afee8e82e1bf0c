"""Packed fusion/score paths (round 5): identical math to the unpacked
layout, verified at f32 where only reassociation noise remains.

- Score1.packed: block-diag contraction + parity-split tap adds must equal
  the unpacked contraction+shift formulation exactly.
- ScoreConv packed (VSR_SCORE_PACK) and the packed fusion tail
  (VSR_FUSION_PACK) engage behind env gates; the full model must agree
  with the gates off.
"""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from video_super_resolution_tpu.models.fusion import Score1


def test_score1_packed_matches_unpacked():
    rng = np.random.default_rng(0)
    b, h, w, f = 2, 16, 24, 64
    x = jnp.asarray(rng.random((b, h, w, f)), jnp.float32)
    m = Score1(f, dtype=jnp.float32)
    params = m.init(jax.random.key(0), x)
    ref = m.apply(params, x)                              # (B,H,W,1)
    xp = x.reshape(b, h, w // 2, 2 * f)
    out = m.apply(params, xp, packed=True)                # (B,H,W/2,2)
    got = out.reshape(b, h, w, 1)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)


@pytest.mark.parametrize("gates", [
    {"VSR_SCORE_PACK": "1"},
    {"VSR_FUSION_PACK": "1"},
    {"VSR_SCORE_PACK": "1", "VSR_FUSION_PACK": "1"},
])
def test_model_packed_gates_match_baseline(gates):
    import dataclasses

    from video_super_resolution_tpu.config import VSRConfig
    from video_super_resolution_tpu.training.state import create_train_state

    cfg = VSRConfig()
    cfg = cfg.replace(train=dataclasses.replace(
        cfg.train, compute_dtype="float32"))
    st = create_train_state(cfg)
    rng = np.random.default_rng(0)
    w = jnp.asarray(rng.random((1, 3, 32, 48, 3)), jnp.float32)

    keys = ("VSR_SCORE_PACK", "VSR_FUSION_PACK", "VSR_CONV_IMPL")
    saved = {k: os.environ.get(k) for k in keys}
    try:
        # force the kernel route so the packed branches engage (interpret
        # mode on CPU)
        os.environ["VSR_CONV_IMPL"] = "pallas"
        for k in ("VSR_SCORE_PACK", "VSR_FUSION_PACK"):
            os.environ[k] = "0"
        base = st.apply_fn({"params": st.params}, w)
        os.environ.update(gates)
        got = st.apply_fn({"params": st.params}, w)
    finally:
        for k, v in saved.items():
            if v is None:
                os.environ.pop(k, None)
            else:
                os.environ[k] = v
    np.testing.assert_allclose(np.asarray(got), np.asarray(base),
                               rtol=1e-4, atol=1e-5)
