"""Losses — Charbonnier (robust L1), the reference's training loss.

SURVEY.md §2.1 #8: ``sqrt((x-y)^2 + eps)`` averaged over all elements; the
eps is the *already-squared* constant (EDVR/DAIN-family convention,
eps = 1e-6 ≈ (1e-3)^2). Always accumulated in f32.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def charbonnier_loss(pred: jax.Array, target: jax.Array, eps: float = 1e-6) -> jax.Array:
    diff = pred.astype(jnp.float32) - target.astype(jnp.float32)
    return jnp.mean(jnp.sqrt(diff * diff + eps))


def psnr_loss_proxy(pred: jax.Array, target: jax.Array) -> jax.Array:
    """MSE in f32 (for logging PSNR during training without metric code)."""
    diff = pred.astype(jnp.float32) - target.astype(jnp.float32)
    return jnp.mean(diff * diff)
