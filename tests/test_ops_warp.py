"""Backward warp vs torch.nn.functional.grid_sample oracle (SURVEY.md §4.2)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch
import torch.nn.functional as F

from video_super_resolution_tpu.ops import backward_warp


def torch_warp(img, flow, padding_mode):
    """Oracle: grid_sample with align_corners=True, flow in pixels."""
    b, h, w, c = img.shape
    t_img = torch.from_numpy(img).permute(0, 3, 1, 2)       # NCHW
    ys, xs = np.meshgrid(np.arange(h), np.arange(w), indexing="ij")
    gx = xs[None] + flow[..., 0]
    gy = ys[None] + flow[..., 1]
    # normalize to [-1, 1] (align_corners=True convention)
    gx = 2.0 * gx / max(w - 1, 1) - 1.0
    gy = 2.0 * gy / max(h - 1, 1) - 1.0
    grid = torch.from_numpy(np.stack([gx, gy], axis=-1).astype(np.float32))
    out = F.grid_sample(t_img, grid, mode="bilinear",
                        padding_mode=padding_mode, align_corners=True)
    return out.permute(0, 2, 3, 1).numpy()


@pytest.mark.parametrize("padding_mode", ["zeros", "border"])
def test_warp_matches_torch(rng, padding_mode):
    img = rng.standard_normal((2, 10, 14, 3), dtype=np.float32)
    flow = (rng.standard_normal((2, 10, 14, 2)) * 3).astype(np.float32)
    got = np.asarray(backward_warp(jnp.asarray(img), jnp.asarray(flow), padding_mode))
    want = torch_warp(img, flow, padding_mode)
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)


def test_warp_zero_flow_identity(rng):
    img = rng.standard_normal((1, 8, 8, 4), dtype=np.float32)
    flow = np.zeros((1, 8, 8, 2), np.float32)
    got = np.asarray(backward_warp(jnp.asarray(img), jnp.asarray(flow)))
    np.testing.assert_allclose(got, img, rtol=1e-6, atol=1e-6)


def test_warp_integer_shift(rng):
    img = rng.standard_normal((1, 8, 8, 1), dtype=np.float32)
    flow = np.zeros((1, 8, 8, 2), np.float32)
    flow[..., 0] = 2.0  # sample from x+2
    got = np.asarray(backward_warp(jnp.asarray(img), jnp.asarray(flow)))
    np.testing.assert_allclose(got[:, :, :6], img[:, :, 2:], rtol=1e-6)
    np.testing.assert_allclose(got[:, :, 6:], 0.0, atol=1e-6)  # zeros pad


def test_warp_grad_flow(rng):
    """Grad w.r.t. flow vs torch autograd."""
    img = rng.standard_normal((1, 6, 7, 2), dtype=np.float32)
    flow = (rng.standard_normal((1, 6, 7, 2)) * 0.7).astype(np.float32)

    def loss_jax(fl):
        return jnp.sum(backward_warp(jnp.asarray(img), fl) ** 2)

    g_jax = np.asarray(jax.grad(loss_jax)(jnp.asarray(flow)))

    t_img = torch.from_numpy(img).permute(0, 3, 1, 2)
    t_flow = torch.from_numpy(flow).requires_grad_(True)
    h, w = 6, 7
    ys, xs = np.meshgrid(np.arange(h), np.arange(w), indexing="ij")
    base = torch.from_numpy(np.stack([xs, ys], -1).astype(np.float32))[None]
    grid = base + t_flow
    gx = 2.0 * grid[..., 0] / (w - 1) - 1.0
    gy = 2.0 * grid[..., 1] / (h - 1) - 1.0
    out = F.grid_sample(t_img, torch.stack([gx, gy], -1), mode="bilinear",
                        padding_mode="zeros", align_corners=True)
    torch.sum(out ** 2).backward()
    g_torch = t_flow.grad.numpy()
    np.testing.assert_allclose(g_jax, g_torch, rtol=1e-3, atol=1e-4)
