"""TrainState + optimizer construction (SURVEY.md §2.2 #10).

Adam with warmup + cosine (or classic step decay — the reference family used
step LR), global-norm gradient clipping, fp32 master params. The state is a
plain flax TrainState pytree so Orbax can save/restore it sharding-aware.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import optax
from flax.training import train_state

from video_super_resolution_tpu.config import TrainConfig, VSRConfig
from video_super_resolution_tpu.models.vsr import VSRModel
from video_super_resolution_tpu.runtime.dtypes import DTypePolicy


class TrainState(train_state.TrainState):
    pass


def make_schedule(cfg: TrainConfig) -> optax.Schedule:
    if cfg.lr_schedule == "const":
        base = optax.constant_schedule(cfg.lr)
    elif cfg.lr_schedule == "step":
        boundaries = {
            i * cfg.lr_step_every: cfg.lr_step_gamma
            for i in range(1, max(1, cfg.steps // cfg.lr_step_every) + 1)
        }
        base = optax.piecewise_constant_schedule(cfg.lr, boundaries)
    elif cfg.lr_schedule == "cosine":
        base = optax.cosine_decay_schedule(
            cfg.lr, max(1, cfg.steps - cfg.warmup_steps), alpha=0.01
        )
    else:
        raise ValueError(f"bad lr_schedule {cfg.lr_schedule}")
    if cfg.warmup_steps > 0:
        warm = optax.linear_schedule(0.0, cfg.lr, cfg.warmup_steps)
        return optax.join_schedules([warm, base], [cfg.warmup_steps])
    return base


def make_optimizer(cfg: TrainConfig) -> optax.GradientTransformation:
    sched = make_schedule(cfg)
    chain = [optax.clip_by_global_norm(cfg.grad_clip)] if cfg.grad_clip else []
    if cfg.weight_decay:
        chain.append(optax.adamw(sched, b1=cfg.adam_b1, b2=cfg.adam_b2,
                                 weight_decay=cfg.weight_decay))
    else:
        chain.append(optax.adam(sched, b1=cfg.adam_b1, b2=cfg.adam_b2))
    return optax.chain(*chain)


def create_train_state(
    cfg: VSRConfig,
    rng: Optional[jax.Array] = None,
    example_window: Optional[jax.Array] = None,
) -> TrainState:
    """Initialize model params + optimizer. ``example_window`` defaults to a
    tiny (1, T, 32, 32, 3) zeros array (shapes don't affect param shapes)."""
    policy = DTypePolicy.from_strings(cfg.train.compute_dtype, cfg.train.param_dtype)
    model = VSRModel(cfg=cfg.model, use_pallas=cfg.use_pallas,
                     dtype=policy.compute_dtype)
    if example_window is None:
        example_window = jnp.zeros((1, cfg.model.window, 32, 32, 3), jnp.float32)
    # Initialize on the host CPU backend: param init traces the full model
    # graph, which costs ~60 s to compile on the axon TPU toolchain vs
    # seconds on XLA-CPU (measured, tools/diag_cache.py), and threefry RNG
    # is bit-identical across backends so init values do not change.
    try:
        cpu = jax.local_devices(backend="cpu")[0]
    except RuntimeError:
        # Deployments pinning JAX_PLATFORMS without cpu have no CPU backend;
        # fall back to default-device init (slower cold compile, same values
        # — threefry is bit-identical across backends).
        cpu = None
    if cpu is not None:
        with jax.default_device(cpu):
            if rng is None:
                rng = jax.random.key(cfg.train.seed)
            else:
                rng = jax.device_put(rng, cpu)
            params = jax.jit(model.init)(rng, example_window)["params"]
    else:
        if rng is None:
            rng = jax.random.key(cfg.train.seed)
        params = jax.jit(model.init)(rng, example_window)["params"]
    # local_devices, not devices: in a multi-process run devices()[0] is a
    # GLOBAL device (possibly another process's) and device_put to it goes
    # through a cross-process consistency all-gather (measured: Gloo
    # timeout in test_multiprocess_resume when this said jax.devices()).
    default = jax.local_devices()[0]
    if default.platform != "cpu":
        params = jax.device_put(params, default)
    return TrainState.create(
        apply_fn=model.apply, params=params, tx=make_optimizer(cfg.train)
    )
