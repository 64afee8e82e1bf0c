"""Test harness: run everything on CPU with 8 fake devices (SURVEY.md §4.2).

Must set XLA_FLAGS/JAX_PLATFORMS before jax initializes its backend, hence a
conftest at import time. The one real TPU chip (axon platform) is never used
by tests — its first-compiles are slow and it has only 1 device; multi-device
sharding tests need the fake CPU mesh.
"""

import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()
from video_super_resolution_tpu.runtime.cache import enable_cache
enable_cache("/tmp/jax_cache_tests")
import jax  # noqa: E402

# The axon PJRT plugin force-prepends "axon" to jax_platforms at import,
# overriding the env var — without this, tests silently run on the real TPU.
if jax.config.jax_platforms != "cpu":
    jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(0)


@pytest.fixture(scope="session", autouse=True)
def _build_native():
    """Best-effort build of the native data path so its tests run."""
    import subprocess

    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    so = os.path.join(root, "native", "libvsr_dataio.so")
    if not os.path.exists(so):
        subprocess.run(["make", "-C", os.path.join(root, "native")],
                       capture_output=True, timeout=120)
    yield
