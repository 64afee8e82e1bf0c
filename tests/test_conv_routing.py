"""Unit tests for the round-3 per-shape conv routing layer
(models/common.py: RoutedConv, SmallOutConv, use_pallas_conv).

The drop-in contract is the load-bearing part: RoutedConv/SmallOutConv
instantiated with name="Conv_0" must produce the SAME param tree (names,
shapes, init values) as the nn.Conv they replaced, or checkpoints and
torch-weight import silently break.
"""

import os

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from video_super_resolution_tpu.models.common import (
    RoutedConv,
    SmallOutConv,
    pallas_conv_wins,
    use_pallas_conv,
)


class _NNConvHost(nn.Module):
    features: int

    @nn.compact
    def __call__(self, x):
        return nn.Conv(self.features, (3, 3), padding="SAME",
                       dtype=jnp.float32, param_dtype=jnp.float32)(x)


class _RoutedHost(nn.Module):
    features: int

    @nn.compact
    def __call__(self, x):
        return RoutedConv(self.features, dtype=jnp.float32,
                          name="Conv_0")(x)


class _SmallHost(nn.Module):
    features: int

    @nn.compact
    def __call__(self, x):
        return SmallOutConv(self.features, dtype=jnp.float32,
                            name="Conv_0")(x)


def _init(mod, cin, key=0):
    x = jnp.zeros((1, 8, 12, cin), jnp.float32)
    return mod.init(jax.random.key(key), x)["params"]


def test_routed_conv_param_tree_matches_nn_conv():
    ref = _init(_NNConvHost(16), 24)
    got = _init(_RoutedHost(16), 24)
    assert jax.tree.structure(ref) == jax.tree.structure(got)
    for (pa, a), (pb, bv) in zip(
            jax.tree_util.tree_leaves_with_path(ref),
            jax.tree_util.tree_leaves_with_path(got)):
        assert pa == pb
        np.testing.assert_array_equal(np.asarray(a), np.asarray(bv))


def test_small_out_conv_param_tree_matches_nn_conv():
    ref = _init(_NNConvHost(2), 24)
    got = _init(_SmallHost(2), 24)
    assert jax.tree.structure(ref) == jax.tree.structure(got)
    for (pa, a), (pb, bv) in zip(
            jax.tree_util.tree_leaves_with_path(ref),
            jax.tree_util.tree_leaves_with_path(got)):
        assert pa == pb
        np.testing.assert_array_equal(np.asarray(a), np.asarray(bv))


def test_routed_conv_values_match_nn_conv():
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((2, 10, 14, 24)), jnp.float32)
    params = _init(_NNConvHost(16), 24)
    ref = _NNConvHost(16).apply({"params": params}, x)
    got = _RoutedHost(16).apply({"params": params}, x)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-6, atol=1e-6)


def test_small_out_conv_values_match_nn_conv():
    rng = np.random.default_rng(1)
    for cout in (1, 2, 3):
        x = jnp.asarray(rng.standard_normal((2, 9, 13, 20)), jnp.float32)
        params = _init(_NNConvHost(cout), 20, key=cout)
        ref = _NNConvHost(cout).apply({"params": params}, x)
        got = _SmallHost(cout).apply({"params": params}, x)
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                   rtol=2e-5, atol=2e-6)


def test_small_out_conv_grads_match_nn_conv():
    rng = np.random.default_rng(2)
    x = jnp.asarray(rng.standard_normal((1, 8, 12, 16)), jnp.float32)
    params = _init(_NNConvHost(2), 16)

    def loss(mod, p):
        return jnp.sum(mod.apply({"params": p}, x) ** 2)

    gref = jax.grad(lambda p: loss(_NNConvHost(2), p))(params)
    ggot = jax.grad(lambda p: loss(_SmallHost(2), p))(params)
    for a, bv in zip(jax.tree.leaves(gref), jax.tree.leaves(ggot)):
        np.testing.assert_allclose(np.asarray(bv), np.asarray(a),
                                   rtol=2e-4, atol=2e-5)


def test_routing_gates():
    # off-TPU (this test runs on CPU) auto never picks pallas
    assert not use_pallas_conv(None, 544, 960, 64, 64)
    # explicit force works regardless of platform
    assert use_pallas_conv("pallas", 4, 4, 3, 1)
    assert not use_pallas_conv("xla", 544, 960, 64, 64)
    # the win-domain predicate itself
    assert pallas_conv_wins(544, 960, 64, 64)
    assert not pallas_conv_wins(544, 960, 3, 64)      # tiny cin
    assert not pallas_conv_wins(17, 30, 128, 128)     # tiny map


def test_env_override(monkeypatch):
    monkeypatch.setenv("VSR_CONV_IMPL", "xla")
    assert not use_pallas_conv(None, 544, 960, 64, 64)
    monkeypatch.setenv("VSR_CONV_IMPL", "pallas")
    assert use_pallas_conv(None, 544, 960, 64, 64)
