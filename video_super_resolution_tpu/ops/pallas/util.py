"""Shared Pallas helpers: interpret-mode policy (SURVEY.md §5.2).

Every kernel runs in interpreter mode off-TPU so tests/CI on the CPU backend
never block on device compiles, and the same numerics are checkable
everywhere. On the TPU backend kernels compile with Mosaic.
"""

from __future__ import annotations

import os

import jax


def should_interpret() -> bool:
    if os.environ.get("VSR_PALLAS_INTERPRET", "") == "1":
        return True
    # Honor an explicit jax.default_device(...) override: under it, jits
    # lower for that device while jax.default_backend() still reports the
    # highest-priority platform (measured on axon) — without this check,
    # CPU-placed traces (e.g. the CPU param-init fast path) would embed
    # compiled Mosaic calls that cannot lower for CPU.
    dev = jax.config.jax_default_device
    if dev is not None:
        # jax.default_device accepts a platform string as well as a Device.
        platform = dev if isinstance(dev, str) else dev.platform
        return platform not in ("tpu", "axon")
    # axon is the experimental TPU PJRT platform in this environment
    return jax.default_backend() not in ("tpu", "axon")
