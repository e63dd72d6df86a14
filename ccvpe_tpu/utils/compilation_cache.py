"""Persistent XLA compilation cache.

Full-model compiles cost minutes; enabling JAX's on-disk compilation cache
makes every CLI/benchmark invocation after the first start in seconds.
Called by the entry points; safe to call multiple times.
"""

from __future__ import annotations

import os


def enable(cache_dir: str | None = None):
    cache_dir = cache_dir or os.environ.get(
        "CCVPE_COMPILATION_CACHE",
        os.path.expanduser("~/.cache/ccvpe_tpu_xla"))
    try:
        import jax

        os.makedirs(cache_dir, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception as e:  # never let caching break the run
        print(f"compilation cache disabled: {e}")
