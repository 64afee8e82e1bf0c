"""Persistent-compilation-cache setup (SURVEY.md §7.0: first compiles on the
axon platform run 20-120 s; caching them is the difference between usable and
unusable bench/profile iteration).

This JAX build ignores the JAX_COMPILATION_CACHE_DIR environment variable
(``jax.config.jax_compilation_cache_dir`` stays None) — the cache only
activates via an explicit ``jax.config.update``. Call :func:`enable_cache`
before the first compilation in every entry point (bench.py, tools/*,
__graft_entry__.py). The axon PJRT plugin registers as platform "tpu" with
``supports_executable_serialization=True``, so the standard persistent cache
works once the dir is configured (verified on-chip: second-run compiles drop
from ~120 s to cache-hit time).
"""

from __future__ import annotations

import os

_DEFAULT_DIR = "/tmp/jax_cache_vsr"


def enable_cache(path: str | None = None) -> str:
    """Point JAX's persistent compilation cache at ``path`` (idempotent).

    Must run before the first jit compilation to benefit that program.
    Returns the cache directory used.
    """
    import jax

    d = path or os.environ.get("JAX_COMPILATION_CACHE_DIR") or _DEFAULT_DIR
    os.makedirs(d, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", d)
    # default min_compile_time is 1 s; the kernels we iterate on sit right
    # around it — cache everything non-trivial instead.
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.2)
    return d
