"""Distributed tests on the 8-fake-CPU mesh (SURVEY.md §4.2): sharded ==
unsharded bit-for-fp32."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import NamedSharding, PartitionSpec as P

from video_super_resolution_tpu.config import MeshConfig, ModelConfig, VSRConfig
from video_super_resolution_tpu.models import VSRModel
from video_super_resolution_tpu.parallel.streaming import make_streaming_program
from video_super_resolution_tpu.parallel.temporal import temporal_shard_forward
from video_super_resolution_tpu.runtime.mesh import AXIS_TIME, build_mesh

TINY = ModelConfig(
    pyramid_channels=(8, 16), flow_estimator_channels=(16, 16),
    context_channels=(16, 16), depth_channels=8, depth_levels=2,
    fusion_channels=16, sr_blocks=2, sr_channels=16,
)


def needs_devices(n):
    return pytest.mark.skipif(
        len(jax.devices()) < n, reason=f"needs {n} devices"
    )


def _reference_sliding(model, params, frames, window):
    """Unsharded oracle: replicate-pad timeline, model per center frame."""
    t = frames.shape[0]
    r = window // 2
    ext = np.concatenate([frames[:1]] * r + [frames] + [frames[-1:]] * r, 0)
    outs = []
    for c in range(t):
        win = ext[c : c + window][None]
        outs.append(np.asarray(model.apply({"params": params}, jnp.asarray(win)))[0])
    return np.stack(outs)


@needs_devices(4)
def test_temporal_shard_matches_unsharded(rng):
    mesh = build_mesh(MeshConfig(time=4), devices=jax.devices()[:4])
    model = VSRModel(cfg=TINY)
    frames = rng.random((8, 16, 16, 3)).astype(np.float32)
    params = model.init(jax.random.key(0), jnp.zeros((1, 3, 16, 16, 3)))["params"]

    def forward_windows(windows):
        return model.apply({"params": params}, windows)

    fn = temporal_shard_forward(forward_windows, mesh, window=3)
    frames_sharded = jax.device_put(
        jnp.asarray(frames), NamedSharding(mesh, P(AXIS_TIME))
    )
    got = np.asarray(fn(frames_sharded))
    want = _reference_sliding(model, params, frames, 3)
    assert got.shape == (8, 64, 64, 3)
    np.testing.assert_allclose(got, want, rtol=2e-5, atol=2e-5)


@needs_devices(8)
def test_streaming_time_space_matches_unsharded(rng):
    from video_super_resolution_tpu.config import TrainConfig

    mesh_cfg = MeshConfig(time=2, space=2)
    mesh = build_mesh(mesh_cfg, devices=jax.devices()[:4])
    # fp32 compute so the sharded program is bit-comparable to the oracle
    cfg = VSRConfig(model=TINY, mesh=mesh_cfg,
                    train=TrainConfig(compute_dtype="float32"))
    model = VSRModel(cfg=TINY)
    frames = rng.random((4, 16, 16, 3)).astype(np.float32)
    params = model.init(jax.random.key(0), jnp.zeros((1, 3, 16, 16, 3)))["params"]

    program = make_streaming_program(cfg, mesh, (16, 16), frames_per_device=2)
    frames_sharded = jax.device_put(
        jnp.asarray(frames), NamedSharding(mesh, P(AXIS_TIME))
    )
    got = np.asarray(program(params, frames_sharded))
    want = _reference_sliding(model, params, frames, 3)
    np.testing.assert_allclose(got, want, rtol=2e-5, atol=2e-5)


@needs_devices(2)
def test_data_parallel_grads_match_single(rng):
    """DP train step on 2 devices == single-device step (psum correctness)."""
    from video_super_resolution_tpu.training import create_train_state, make_train_step
    from video_super_resolution_tpu.config import TrainConfig
    from video_super_resolution_tpu.runtime.mesh import AXIS_DATA

    # fp32 compute: bf16 reduction reordering across shards is ~0.3% noise
    cfg = VSRConfig(model=TINY, train=TrainConfig(
        warmup_steps=0, lr=1e-3, compute_dtype="float32"))
    batch = {
        "lr": jnp.asarray(rng.random((4, 3, 16, 16, 3)), jnp.float32),
        "hr": jnp.asarray(rng.random((4, 64, 64, 3)), jnp.float32),
    }
    state1 = create_train_state(cfg)
    step1 = make_train_step(donate=False)
    _, m1 = step1(state1, batch)

    mesh = build_mesh(MeshConfig(data=2), devices=jax.devices()[:2])
    state2 = create_train_state(cfg)
    step2 = make_train_step(mesh=mesh, donate=False)
    sharded = {
        "lr": jax.device_put(batch["lr"], NamedSharding(mesh, P(AXIS_DATA))),
        "hr": jax.device_put(batch["hr"], NamedSharding(mesh, P(AXIS_DATA))),
    }
    _, m2 = step2(state2, sharded)
    np.testing.assert_allclose(float(m1["loss"]), float(m2["loss"]), rtol=1e-6)
    np.testing.assert_allclose(
        float(m1["grad_norm"]), float(m2["grad_norm"]), rtol=1e-5
    )


def test_halo_exchange_values(rng):
    """halo_exchange_frames: interior shards see true neighbors, edges replicate."""
    if len(jax.devices()) < 4:
        pytest.skip("needs 4 devices")
    from video_super_resolution_tpu.parallel.temporal import halo_exchange_frames

    mesh = build_mesh(MeshConfig(time=4), devices=jax.devices()[:4])
    frames = jnp.arange(8, dtype=jnp.float32).reshape(8, 1, 1, 1)
    frames = jnp.broadcast_to(frames, (8, 2, 2, 1))

    fn = jax.jit(
        jax.shard_map(
            lambda x: halo_exchange_frames(x, 1),
            mesh=mesh, in_specs=P(AXIS_TIME), out_specs=P(AXIS_TIME),
        )
    )
    sharded = jax.device_put(frames, NamedSharding(mesh, P(AXIS_TIME)))
    out = np.asarray(fn(sharded))[..., 0, 0, 0]
    # per shard (2 own + 2 halo = 4 rows) concatenated over 4 shards
    want = [0, 0, 1, 2, 1, 2, 3, 4, 3, 4, 5, 6, 5, 6, 7, 7]
    np.testing.assert_array_equal(out, want)


def test_tensor_parallel_matches_single(rng):
    """Trunk TP (Megatron channel sharding over the "model" axis) must
    reproduce the unsharded forward — GSPMD inserts the per-block
    all-reduce from the param shardings alone (SURVEY.md §2.4 TP row)."""
    if len(jax.devices()) < 2:
        pytest.skip("needs 2 devices")
    from video_super_resolution_tpu.parallel.tensor import (
        make_tp_forward,
        shard_params_tp,
    )

    cfg = ModelConfig(
        pyramid_channels=(8, 16), flow_estimator_channels=(16, 16),
        context_channels=(16, 16), depth_channels=8, depth_levels=2,
        fusion_channels=16, sr_channels=16, sr_blocks=2,
        warp_impl="gather",
    )
    model = VSRModel(cfg=cfg, dtype=jnp.float32)
    x = jnp.asarray(rng.random((1, 3, 32, 48, 3)), jnp.float32)
    params = model.init(jax.random.key(0), x)["params"]
    want = np.asarray(model.apply({"params": params}, x))

    mesh = build_mesh(MeshConfig(model=2), devices=jax.devices()[:2])
    sharded = shard_params_tp(params, mesh)
    # conv1 kernels really are channel-sharded
    k = sharded["sr_head"]["ResBlock_0"]["ConvLReLU_0"]["kernel"]
    assert k.sharding.spec == P(None, None, None, "model")
    got = np.asarray(make_tp_forward(model.apply, mesh)(sharded, x))
    np.testing.assert_allclose(got, want, rtol=2e-5, atol=2e-5)


def test_tp_forward_no_global_side_effect(rng):
    """make_tp_forward must not mutate process state: a program traced
    AFTER a TP program keeps its own conv routing (ADVICE r4 medium #1 /
    VERDICT r4 weak #4 regression test)."""
    if len(jax.devices()) < 2:
        pytest.skip("needs 2 devices")
    import os

    from video_super_resolution_tpu.models.common import conv_impl_policy
    from video_super_resolution_tpu.parallel.tensor import (
        make_tp_forward,
        shard_params_tp,
    )

    assert "VSR_CONV_IMPL" not in os.environ
    cfg = ModelConfig(
        pyramid_channels=(8, 16), flow_estimator_channels=(16, 16),
        context_channels=(16, 16), depth_channels=8, depth_levels=2,
        fusion_channels=16, sr_channels=16, sr_blocks=2,
        warp_impl="gather",
    )
    model = VSRModel(cfg=cfg, dtype=jnp.float32)
    x = jnp.asarray(rng.random((1, 3, 32, 48, 3)), jnp.float32)
    params = model.init(jax.random.key(0), x)["params"]
    mesh = build_mesh(MeshConfig(model=2), devices=jax.devices()[:2])
    sharded = shard_params_tp(params, mesh)
    make_tp_forward(model.apply, mesh)(sharded, x)
    # the scoped override left no trace in the process
    assert "VSR_CONV_IMPL" not in os.environ
    assert conv_impl_policy() == "auto"


def test_tp_train_step_matches_single(rng):
    """Full train step on a (data x model) mesh: dp gradient all-reduce AND
    the per-ResBlock Megatron all-reduce, both from placements alone
    (VERDICT r4 next #5). Must match the single-device step."""
    if len(jax.devices()) < 4:
        pytest.skip("needs 4 devices")
    import dataclasses

    from video_super_resolution_tpu.parallel.tensor import (
        make_tp_train_step,
        shard_params_tp,
    )
    from video_super_resolution_tpu.runtime.mesh import AXIS_DATA
    from video_super_resolution_tpu.training.state import create_train_state
    from video_super_resolution_tpu.training.step import make_train_step

    cfg = VSRConfig(model=dataclasses.replace(TINY, warp_impl="gather"))
    cfg = cfg.replace(train=dataclasses.replace(cfg.train,
                                                compute_dtype="float32"))
    state = create_train_state(cfg)
    b, h, w = 2, 16, 24
    batch = {
        "lr": jnp.asarray(rng.random((b, 3, h, w, 3)), jnp.float32),
        "hr": jnp.asarray(rng.random((b, 4 * h, 4 * w, 3)), jnp.float32),
    }
    # single-device oracle
    ref_state, ref_metrics = make_train_step(donate=False)(state, batch)

    mesh = build_mesh(MeshConfig(data=2, model=2), devices=jax.devices()[:4])
    tp_state = state.replace(params=shard_params_tp(state.params, mesh))
    sharded_batch = {
        k: jax.device_put(v, NamedSharding(mesh, P(AXIS_DATA)))
        for k, v in batch.items()
    }
    new_state, metrics = make_tp_train_step(mesh)(tp_state, sharded_batch)
    np.testing.assert_allclose(float(metrics["loss"]),
                               float(ref_metrics["loss"]), rtol=1e-6)
    # trunk conv1 kernel stayed channel-sharded through the optimizer update
    k = new_state.params["sr_head"]["ResBlock_0"]["ConvLReLU_0"]["kernel"]
    assert k.sharding.spec == P(None, None, None, "model")
    ref_k = ref_state.params["sr_head"]["ResBlock_0"]["ConvLReLU_0"]["kernel"]
    np.testing.assert_allclose(np.asarray(k), np.asarray(ref_k),
                               rtol=2e-5, atol=2e-6)
