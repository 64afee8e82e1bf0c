"""Torch state_dict -> Flax params import tool (SURVEY.md §3.4, §5.4).

Matching the reference within ±0.05 dB requires loading its trained weights;
this converts a torch ``state_dict`` (pickle, readable with torch-CPU) into
this framework's param pytree:

- Conv2d: OIHW -> HWIO kernel transpose, bias passthrough.
- ConvTranspose2d: IOHW -> HWIO with spatial flip (gradient-vs-correlation
  convention) — provided for completeness.
- Linear: (out, in) -> (in, out).

Because the reference checkpoint's module names are unknown (mount empty —
SURVEY.md §0), the mapping is data-driven: ``import_state_dict`` takes an
explicit {torch_key_prefix: flax_path} table; ``import_by_order`` zips
same-shaped tensors in definition order for oracle round-trip tests.
"""

from __future__ import annotations

from typing import Any, Dict, List, Mapping, Sequence, Tuple

import numpy as np


def conv_kernel_to_hwio(w: np.ndarray) -> np.ndarray:
    """torch Conv2d weight (O, I, kH, kW) -> flax (kH, kW, I, O)."""
    return np.transpose(w, (2, 3, 1, 0))


def conv_transpose_kernel_to_hwio(w: np.ndarray) -> np.ndarray:
    """torch ConvTranspose2d weight (I, O, kH, kW) -> flax HWIO, flipped."""
    return np.transpose(w, (2, 3, 0, 1))[::-1, ::-1]


def linear_kernel(w: np.ndarray) -> np.ndarray:
    return np.transpose(w, (1, 0))


def _to_numpy(t) -> np.ndarray:
    if hasattr(t, "detach"):
        return t.detach().cpu().numpy()
    return np.asarray(t)


def import_state_dict(
    state_dict: Mapping[str, Any],
    key_map: Mapping[str, Tuple[str, ...]],
    params: Dict[str, Any],
) -> Dict[str, Any]:
    """Write torch tensors into a (copied) flax params dict.

    key_map: torch module prefix (e.g. "flow_net.conv1") -> flax path tuple
    (e.g. ("flow_net", "Conv_0")). For each prefix, ``.weight``/``.bias`` are
    converted to ``kernel``/``bias`` with the right transpose.
    """
    import copy

    out = copy.deepcopy(params)
    for prefix, path in key_map.items():
        node = out
        for p in path[:-1]:
            node = node[p]
        leaf = node[path[-1]]
        w = _to_numpy(state_dict[prefix + ".weight"])
        if w.ndim == 4:
            leaf["kernel"] = conv_kernel_to_hwio(w).astype(
                np.asarray(leaf["kernel"]).dtype
            )
        elif w.ndim == 2:
            leaf["kernel"] = linear_kernel(w).astype(
                np.asarray(leaf["kernel"]).dtype
            )
        else:
            raise ValueError(f"{prefix}: unsupported weight ndim {w.ndim}")
        bkey = prefix + ".bias"
        if bkey in state_dict and "bias" in leaf:
            leaf["bias"] = _to_numpy(state_dict[bkey]).astype(
                np.asarray(leaf["bias"]).dtype
            )
    return out


def flatten_params(params: Dict[str, Any], prefix: Tuple[str, ...] = ()):
    """Yield (path, leaf_dict) for every {kernel, bias} module in order."""
    if "kernel" in params:
        yield prefix, params
        return
    for k in sorted(params):
        v = params[k]
        if isinstance(v, dict):
            yield from flatten_params(v, prefix + (k,))


def import_by_order(
    torch_tensors: Sequence[Tuple[np.ndarray, np.ndarray]],
    params: Dict[str, Any],
) -> Dict[str, Any]:
    """Zip (weight, bias) pairs onto flax conv modules in sorted-path order.

    For oracle tests where both sides define modules in the same order;
    shapes are asserted to match after transpose.
    """
    import copy

    out = copy.deepcopy(params)
    mods = list(flatten_params(out))
    if len(torch_tensors) != len(mods):
        raise ValueError(f"{len(torch_tensors)} torch modules vs {len(mods)} flax")
    for (w, b), (path, leaf) in zip(torch_tensors, mods):
        w = _to_numpy(w)
        kern = conv_kernel_to_hwio(w) if w.ndim == 4 else linear_kernel(w)
        if kern.shape != np.asarray(leaf["kernel"]).shape:
            raise ValueError(f"{path}: shape {kern.shape} vs {leaf['kernel'].shape}")
        leaf["kernel"] = kern.astype(np.asarray(leaf["kernel"]).dtype)
        if b is not None and "bias" in leaf:
            leaf["bias"] = _to_numpy(b).astype(np.asarray(leaf["bias"]).dtype)
    return out


def load_torch_checkpoint(path: str) -> Dict[str, np.ndarray]:
    """Read a torch .pth/.pt checkpoint into numpy (CPU, weights_only)."""
    import torch

    obj = torch.load(path, map_location="cpu", weights_only=True)
    if isinstance(obj, dict) and "state_dict" in obj:
        obj = obj["state_dict"]
    return {k: _to_numpy(v) for k, v in obj.items()}
