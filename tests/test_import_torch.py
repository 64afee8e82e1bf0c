"""Weight import: torch conv modules -> flax params, numerics must match."""

import jax
import jax.numpy as jnp
import numpy as np
import torch
import torch.nn as nn
import torch.nn.functional as F

import flax.linen as fnn

from video_super_resolution_tpu.training.import_torch import (
    conv_kernel_to_hwio,
    flatten_params,
    import_by_order,
    import_state_dict,
    linear_kernel,
)


def test_conv_import_numerics(rng):
    """A torch Conv2d and a flax Conv with imported weights agree."""
    tconv = nn.Conv2d(3, 8, 3, padding=1)
    x = rng.standard_normal((1, 6, 7, 3), dtype=np.float32)
    with torch.no_grad():
        want = (
            tconv(torch.from_numpy(x).permute(0, 3, 1, 2))
            .permute(0, 2, 3, 1)
            .numpy()
        )

    fconv = fnn.Conv(8, (3, 3), padding="SAME")
    params = fconv.init(jax.random.key(0), jnp.asarray(x))
    params = {
        "params": {
            "kernel": conv_kernel_to_hwio(tconv.weight.detach().numpy()),
            "bias": tconv.bias.detach().numpy(),
        }
    }
    got = np.asarray(fconv.apply(params, jnp.asarray(x)))
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)


def test_linear_kernel_numerics(rng):
    tl = nn.Linear(5, 7)
    x = rng.standard_normal((3, 5), dtype=np.float32)
    with torch.no_grad():
        want = tl(torch.from_numpy(x)).numpy()
    got = x @ linear_kernel(tl.weight.detach().numpy()) + tl.bias.detach().numpy()
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)


class _TorchStack(nn.Module):
    def __init__(self):
        super().__init__()
        self.c1 = nn.Conv2d(3, 8, 3, padding=1)
        self.c2 = nn.Conv2d(8, 4, 3, padding=1)

    def forward(self, x):
        return self.c2(F.leaky_relu(self.c1(x), 0.1))


class _FlaxStack(fnn.Module):
    @fnn.compact
    def __call__(self, x):
        x = fnn.Conv(8, (3, 3), padding="SAME", name="c1")(x)
        x = fnn.leaky_relu(x, negative_slope=0.1)
        return fnn.Conv(4, (3, 3), padding="SAME", name="c2")(x)


def test_import_state_dict_stack(rng):
    tm = _TorchStack()
    x = rng.standard_normal((2, 8, 8, 3), dtype=np.float32)
    with torch.no_grad():
        want = tm(torch.from_numpy(x).permute(0, 3, 1, 2)).permute(0, 2, 3, 1).numpy()

    fm = _FlaxStack()
    variables = fm.init(jax.random.key(0), jnp.asarray(x))
    imported = import_state_dict(
        tm.state_dict(),
        {"c1": ("c1",), "c2": ("c2",)},
        variables["params"],
    )
    got = np.asarray(fm.apply({"params": imported}, jnp.asarray(x)))
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)


def test_import_by_order_stack(rng):
    tm = _TorchStack()
    x = rng.standard_normal((1, 8, 8, 3), dtype=np.float32)
    with torch.no_grad():
        want = tm(torch.from_numpy(x).permute(0, 3, 1, 2)).permute(0, 2, 3, 1).numpy()
    fm = _FlaxStack()
    variables = fm.init(jax.random.key(0), jnp.asarray(x))
    imported = import_by_order(
        [(tm.c1.weight, tm.c1.bias), (tm.c2.weight, tm.c2.bias)],
        variables["params"],
    )
    got = np.asarray(fm.apply({"params": imported}, jnp.asarray(x)))
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)


def test_flatten_params_order():
    fm = _FlaxStack()
    variables = fm.init(jax.random.key(0), jnp.zeros((1, 4, 4, 3)))
    paths = [p for p, _ in flatten_params(variables["params"])]
    assert paths == [("c1",), ("c2",)]
