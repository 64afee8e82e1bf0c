"""Model modules: shapes, padding, flow sanity on synthetic motion."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from video_super_resolution_tpu.config import ModelConfig
from video_super_resolution_tpu.models import (
    DepthGuidedFusion,
    DepthNet,
    FeaturePyramid,
    FlowNet,
    SRHead,
    VSRModel,
)

TINY = ModelConfig(
    pyramid_channels=(8, 16),
    flow_estimator_channels=(16, 16),
    context_channels=(16, 16),
    depth_channels=8,
    depth_levels=2,
    fusion_channels=16,
    sr_channels=16,
    sr_blocks=2,
)


def test_feature_pyramid_shapes(rng):
    m = FeaturePyramid(channels=(8, 16, 32))
    x = jnp.asarray(rng.random((2, 32, 64, 3)), jnp.float32)
    feats = m.apply(m.init(jax.random.key(0), x), x)
    assert [f.shape for f in feats] == [
        (2, 16, 32, 8), (2, 8, 16, 16), (2, 4, 8, 32)
    ]


def test_depth_net_shapes(rng):
    m = DepthNet(channels=8, levels=2)
    x = jnp.asarray(rng.random((1, 16, 24, 3)), jnp.float32)
    d = m.apply(m.init(jax.random.key(0), x), x)
    assert d.shape == (1, 16, 24, 1)
    assert float(d.min()) >= 0.0  # softplus output


def test_flow_net_shapes(rng):
    m = FlowNet(pyramid_channels=(8, 16), estimator_channels=(16, 16),
                context_channels=(16, 16), max_displacement=2)
    ref = jnp.asarray(rng.random((1, 16, 32, 3)), jnp.float32)
    nbr = jnp.asarray(rng.random((1, 16, 32, 3)), jnp.float32)
    params = m.init(jax.random.key(0), ref, nbr)
    flow = m.apply(params, ref, nbr)
    assert flow.shape == (1, 16, 32, 2)
    assert flow.dtype == jnp.float32


def test_fusion_shapes(rng):
    m = DepthGuidedFusion(features=16)
    rf = jnp.asarray(rng.random((2, 8, 8, 16)), jnp.float32)
    wf = jnp.asarray(rng.random((2, 3, 8, 8, 16)), jnp.float32)
    rd = jnp.asarray(rng.random((2, 8, 8, 1)), jnp.float32)
    wd = jnp.asarray(rng.random((2, 3, 8, 8, 1)), jnp.float32)
    out = m.apply(m.init(jax.random.key(0), rf, wf, rd, wd), rf, wf, rd, wd)
    assert out.shape == (2, 8, 8, 16)


def test_fusion_prefers_depth_consistent_neighbor(rng):
    """A neighbor with huge warped-depth disagreement should not dominate:
    softmax weights respond to the depth-difference input channel."""
    m = DepthGuidedFusion(features=8)
    rf = jnp.ones((1, 4, 4, 8))
    wf = jnp.stack([jnp.full((1, 4, 4, 8), 1.0), jnp.full((1, 4, 4, 8), -1.0)], 1)
    rd = jnp.ones((1, 4, 4, 1))
    wd_same = jnp.stack([jnp.ones((1, 4, 4, 1)), jnp.ones((1, 4, 4, 1))], 1)
    params = m.init(jax.random.key(0), rf, wf, rd, wd_same)
    out_same = m.apply(params, rf, wf, rd, wd_same)
    wd_diff = jnp.stack([jnp.ones((1, 4, 4, 1)), 50 * jnp.ones((1, 4, 4, 1))], 1)
    out_diff = m.apply(params, rf, wf, rd, wd_diff)
    # outputs must differ: depth disagreement feeds the gate
    assert float(jnp.abs(out_same - out_diff).max()) > 1e-6


@pytest.mark.parametrize("scale", [2, 4])
def test_sr_head_shapes(rng, scale):
    m = SRHead(features=16, blocks=2, scale=scale)
    fused = jnp.asarray(rng.random((1, 8, 12, 16)), jnp.float32)
    ref = jnp.asarray(rng.random((1, 8, 12, 3)), jnp.float32)
    out = m.apply(m.init(jax.random.key(0), fused, ref), fused, ref)
    assert out.shape == (1, 8 * scale, 12 * scale, 3)


@pytest.mark.parametrize("t,hw", [(3, (24, 32)), (5, (17, 23))])
def test_vsr_model_shapes(rng, t, hw):
    m = VSRModel(cfg=TINY)
    x = jnp.asarray(rng.random((1, t, *hw, 3)), jnp.float32)
    params = m.init(jax.random.key(0), x)
    out = m.apply(params, x)
    assert out.shape == (1, hw[0] * 4, hw[1] * 4, 3)


def test_vsr_model_aux(rng):
    m = VSRModel(cfg=TINY)
    x = jnp.asarray(rng.random((1, 3, 16, 16, 3)), jnp.float32)
    params = m.init(jax.random.key(0), x)
    aux = m.apply(params, x, return_aux=True)
    assert aux["hr"].shape == (1, 64, 64, 3)
    assert aux["flows"].shape == (1, 2, 16, 16, 2)
    assert aux["depth"].shape == (1, 16, 16, 1)


def test_vsr_model_bf16_runs(rng):
    m = VSRModel(cfg=TINY, dtype=jnp.bfloat16)
    x = jnp.asarray(rng.random((1, 3, 16, 16, 3)), jnp.float32)
    params = m.init(jax.random.key(0), x)
    out = m.apply(params, x)
    assert out.dtype == jnp.float32  # head/skip keep f32
    assert np.isfinite(np.asarray(out)).all()


def test_vsr_model_reference_layout_variant(rng):
    """two_stage SR head + feature warping (the reference-era layout)."""
    import dataclasses

    cfg = dataclasses.replace(TINY, warp_features=True,
                              sr_head_style="two_stage")
    m = VSRModel(cfg=cfg)
    x = jnp.asarray(rng.random((1, 3, 16, 16, 3)), jnp.float32)
    params = m.init(jax.random.key(0), x)
    out = m.apply(params, x)
    assert out.shape == (1, 64, 64, 3)
    assert np.isfinite(np.asarray(out)).all()


def test_sr_espcn_mid_knob():
    """sr_espcn_mid inserts an extra LR conv before the subpixel conv
    (QUALITY.md: recovers ~58% of the espcn-vs-two_stage gap at 4xC)."""
    import dataclasses

    import jax
    import jax.numpy as jnp
    import numpy as np

    from video_super_resolution_tpu.config import ModelConfig
    from video_super_resolution_tpu.models.vsr import VSRModel

    cfg = ModelConfig(
        window=3, pyramid_levels=3, pyramid_channels=(8, 16, 32),
        max_displacement=2, flow_estimator_channels=(16, 12),
        context_channels=(16, 12), depth_channels=8, depth_levels=2,
        fusion_channels=16, sr_channels=16, sr_blocks=1,
        warp_impl="gather",
    )
    x = jnp.asarray(np.random.default_rng(0).random((1, 3, 32, 48, 3)),
                    jnp.float32)
    for mid in (0, 32):
        c = dataclasses.replace(cfg, sr_espcn_mid=mid)
        m = VSRModel(cfg=c, dtype=jnp.float32)
        params = m.init(jax.random.key(0), x)["params"]
        leaves = jax.tree_util.tree_leaves_with_path(params)
        has_mid = any("espcn_mid" in jax.tree_util.keystr(p)
                      for p, _ in leaves)
        assert has_mid == (mid > 0)
        out = m.apply({"params": params}, x)
        assert out.shape == (1, 128, 192, 3)
        assert np.isfinite(np.asarray(out)).all()


def test_score_conv_fast_matches_fallback(rng):
    """ScoreConv's fused-res kernel route (use_pallas=True, interpret) must
    match the XLA fallback's f32-adds-then-lrelu numerics (round 4)."""
    import jax.numpy as jnp

    from video_super_resolution_tpu.models.fusion import ScoreConv

    b, n, h, w, f = 2, 2, 8, 16, 16
    ref_in = jnp.asarray(rng.standard_normal((b, h, w, f + 1)), jnp.float32)
    nbr_in = jnp.asarray(rng.standard_normal((b, n, h, w, f + 2)),
                         jnp.float32)
    m_x = ScoreConv(f, use_pallas=False)
    m_p = ScoreConv(f, use_pallas=True)
    params = m_x.init(jax.random.key(0), ref_in, nbr_in)
    assert (jax.tree.structure(params)
            == jax.tree.structure(m_p.init(jax.random.key(0), ref_in,
                                           nbr_in)))
    out_x = np.asarray(m_x.apply(params, ref_in, nbr_in))
    out_p = np.asarray(m_p.apply(params, ref_in, nbr_in))
    assert out_x.shape == (b, n, h, w, f)
    np.testing.assert_allclose(out_p, out_x, rtol=1e-4, atol=1e-4)


def test_depth_res_divisor_knob(rng):
    """depth_res_divisor=4 changes only the depth-branch resizes: the param
    tree must stay byte-identical to the default config (round 4)."""
    import dataclasses

    import jax.numpy as jnp

    cfg4 = dataclasses.replace(TINY, depth_res_divisor=4)
    x = jnp.asarray(rng.random((1, 3, 32, 48, 3)), jnp.float32)
    m0 = VSRModel(cfg=TINY)
    m4 = VSRModel(cfg=cfg4)
    p0 = m0.init(jax.random.key(0), x)
    p4 = m4.init(jax.random.key(0), x)
    assert jax.tree.structure(p0) == jax.tree.structure(p4)
    out = m4.apply(p4, x)
    assert out.shape == (1, 128, 192, 3)
    assert np.isfinite(np.asarray(out)).all()
