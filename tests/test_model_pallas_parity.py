"""Full model with use_pallas=True (interpret) == use_pallas=False, shared
params — guarantees the Pallas path is a drop-in (same param tree, same
math)."""

import jax
import jax.numpy as jnp
import numpy as np

from video_super_resolution_tpu.config import ModelConfig
from video_super_resolution_tpu.models import VSRModel

TINY = ModelConfig(
    pyramid_channels=(8, 16), flow_estimator_channels=(16, 16),
    context_channels=(16, 16), depth_channels=8, depth_levels=2,
    fusion_channels=16, sr_channels=16, sr_blocks=2,
)


def test_pallas_model_matches_xla_model(rng):
    x = jnp.asarray(rng.random((1, 3, 16, 16, 3)), jnp.float32)
    m_x = VSRModel(cfg=TINY, use_pallas=False)
    m_p = VSRModel(cfg=TINY, use_pallas=True)
    params = m_x.init(jax.random.key(0), x)

    # identical param trees
    tx = jax.tree.structure(params)
    tp = jax.tree.structure(m_p.init(jax.random.key(0), x))
    assert tx == tp

    out_x = np.asarray(m_x.apply(params, x))
    out_p = np.asarray(m_p.apply(params, x))
    np.testing.assert_allclose(out_p, out_x, rtol=1e-4, atol=1e-4)


def test_pallas_model_grads_match(rng):
    x = jnp.asarray(rng.random((1, 3, 16, 16, 3)), jnp.float32)
    y = jnp.asarray(rng.random((1, 64, 64, 3)), jnp.float32)
    m_x = VSRModel(cfg=TINY, use_pallas=False)
    m_p = VSRModel(cfg=TINY, use_pallas=True)
    params = m_x.init(jax.random.key(0), x)

    def loss(m):
        def f(p):
            return jnp.mean((m.apply(p, x) - y) ** 2)
        return f

    gx = jax.grad(loss(m_x))(params)
    gp = jax.grad(loss(m_p))(params)
    for a, b in zip(jax.tree.leaves(gx), jax.tree.leaves(gp)):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                   rtol=5e-3, atol=1e-5)
