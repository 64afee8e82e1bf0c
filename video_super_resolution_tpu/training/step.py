"""jit-compiled train/eval steps (SURVEY.md §3.1 — the reference's whole
per-step stack collapses into ONE compiled program here).

Data parallelism is sharding-driven: the batch arrives sharded over the mesh
"data" axis; jit + GSPMD partitions the step and inserts the gradient
all-reduce (psum over ICI) automatically. No pmap, no hand-written
collectives in the step.
"""

from __future__ import annotations

import functools
from typing import Callable, Optional, Tuple

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from video_super_resolution_tpu.ops.losses import charbonnier_loss
from video_super_resolution_tpu.runtime.mesh import AXIS_DATA
from video_super_resolution_tpu.training.state import TrainState


def make_train_step(
    charbonnier_eps: float = 1e-6,
    mesh: Optional[Mesh] = None,
    donate: bool = True,
) -> Callable[[TrainState, dict], Tuple[TrainState, dict]]:
    """Returns train_step(state, batch) -> (state, metrics).

    batch: {"lr": (B,T,h,w,3), "hr": (B,H,W,3)}. With a mesh, batch inputs
    are constrained to be sharded over the "data" axis and params replicated.
    """
    step = _step_body(charbonnier_eps, mesh)
    return jax.jit(step, donate_argnums=(0,) if donate else ())


def _step_body(charbonnier_eps: float, mesh: Optional[Mesh]):
    def loss_fn(params, apply_fn, batch):
        pred = apply_fn({"params": params}, batch["lr"])
        loss = charbonnier_loss(pred, batch["hr"], charbonnier_eps)
        mse = jnp.mean(
            (pred.astype(jnp.float32) - batch["hr"].astype(jnp.float32)) ** 2
        )
        return loss, mse

    def step(state: TrainState, batch: dict):
        # compact-transfer decode (training/loop._compact_batches): HR may
        # arrive uint8 (exact for 8-bit-sourced pipelines; /255 here on
        # device) and LR in a reduced float dtype (the model casts to its
        # compute dtype anyway) — the host->device transfer is the
        # host-driven bottleneck on this platform (BENCH_dispatch_r5.json)
        if batch["hr"].dtype == jnp.uint8:
            batch = dict(batch, hr=batch["hr"].astype(jnp.float32) / 255.0)
        if batch["lr"].dtype != jnp.float32:
            # decode to f32 on device: the warp kernel's dequantization
            # rolls are 32-bit-only (Mosaic "Rotate with non-32-bit data")
            # and the flow/f32-pinned paths expect f32 frames; the model
            # re-casts to its compute dtype where it wants bf16
            batch = dict(batch, lr=batch["lr"].astype(jnp.float32))
        if mesh is not None:
            bspec = NamedSharding(mesh, P(AXIS_DATA))
            batch = jax.lax.with_sharding_constraint(
                batch, {"lr": bspec, "hr": bspec}
            )
        (loss, mse), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state.params, state.apply_fn, batch
        )
        gnorm = optax_global_norm(grads)
        state = state.apply_gradients(grads=grads)
        metrics = {
            "loss": loss,
            "psnr_proxy": -10.0 * jnp.log10(jnp.maximum(mse, 1e-12)),
            "grad_norm": gnorm,
        }
        return state, metrics

    return step


def make_multi_train_step(
    charbonnier_eps: float = 1e-6,
    mesh: Optional[Mesh] = None,
    donate: bool = True,
) -> Callable[[TrainState, dict], Tuple[TrainState, dict]]:
    """K steps per dispatch: ``multi_step(state, batches)`` scans the train
    step over a leading stack axis ({"lr": (K,B,T,h,w,3), "hr":
    (K,B,H,W,3)}) and returns the LAST step's metrics.

    Rationale (VERDICT r4 next #4): through the experimental axon tunnel a
    host-driven python loop ceilings on per-dispatch overhead, not device
    time (the dispatch-only control in tools/bench_dispatch.py measures the
    ceiling). Chaining K steps inside one program amortizes that overhead
    K-fold while the host pre-stacks the next K batches; numerics are the
    identical step applied K times. K is implicit in the batch stack (one
    compile per distinct K)."""
    step = _step_body(charbonnier_eps, mesh)

    def multi(state: TrainState, batches: dict):
        state, ms = jax.lax.scan(step, state, batches)
        return state, jax.tree.map(lambda m: m[-1], ms)

    return jax.jit(multi, donate_argnums=(0,) if donate else ())


def optax_global_norm(tree) -> jax.Array:
    leaves = jax.tree.leaves(tree)
    return jnp.sqrt(sum(jnp.sum(jnp.square(l.astype(jnp.float32))) for l in leaves))


def make_eval_step(apply_fn) -> Callable:
    """jit forward: (params, lr_window) -> hr prediction, clipped to [0,1]."""

    @jax.jit
    def eval_step(params, lr):
        pred = apply_fn({"params": params}, lr)
        return jnp.clip(pred.astype(jnp.float32), 0.0, 1.0)

    return eval_step
