"""Sanitizers / debug tooling (SURVEY.md §5.2).

The reference family had none (single CUDA stream, manual cuda-memcheck);
here the mechanisms are:

- ``checked_apply``: wrap a model apply in ``checkify`` so NaN/Inf and OOB
  errors surface as Python errors with source locations instead of garbage
  pixels.
- ``find_nonfinite``: walk an output pytree and report which leaves contain
  NaN/Inf (host-side triage).
- ``interpret_all_kernels``: context manager forcing every Pallas kernel
  through the interpreter (the race-free oracle path) — use to bisect
  compiled-kernel miscompiles.
- CI smoke tests run under ``jax.config.debug_nans`` (see tests/).
"""

from __future__ import annotations

import contextlib
from typing import Any, Callable, Dict, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import checkify


def checked_apply(apply_fn: Callable) -> Callable:
    """Wrap apply_fn so NaN/div errors raise with locations.

    Returns fn(*args) -> output; raises checkify.JaxRuntimeError on NaN.
    """

    def inner(*args, **kw):
        return apply_fn(*args, **kw)

    checked = checkify.checkify(
        inner, errors=checkify.float_checks | checkify.index_checks
    )

    def run(*args, **kw):
        err, out = checked(*args, **kw)
        err.throw()
        return out

    return run


def find_nonfinite(tree: Any, prefix: str = "") -> Dict[str, Tuple[int, int]]:
    """{path: (num_nan, num_inf)} for leaves containing non-finite values."""
    import numpy as np

    bad = {}
    flat, _ = jax.tree_util.tree_flatten_with_path(tree)
    for path, leaf in flat:
        arr = np.asarray(leaf)
        if not np.issubdtype(arr.dtype, np.floating):
            continue
        n_nan = int(np.isnan(arr).sum())
        n_inf = int(np.isinf(arr).sum())
        if n_nan or n_inf:
            bad[prefix + jax.tree_util.keystr(path)] = (n_nan, n_inf)
    return bad


@contextlib.contextmanager
def interpret_all_kernels():
    """Force every Pallas kernel through the interpreter (oracle path)."""
    import os

    old = os.environ.get("VSR_PALLAS_INTERPRET")
    os.environ["VSR_PALLAS_INTERPRET"] = "1"
    try:
        yield
    finally:
        if old is None:
            os.environ.pop("VSR_PALLAS_INTERPRET", None)
        else:
            os.environ["VSR_PALLAS_INTERPRET"] = old
