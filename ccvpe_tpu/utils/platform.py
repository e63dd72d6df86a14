"""Backend pinning for CLI entry points.

``JAX_PLATFORMS`` is not reliable on hosts whose site configuration
registers/forces a platform after the environment is read (e.g. a TPU-proxy
``sitecustomize``); the in-process config update always wins.  Setting
``CCVPE_PLATFORM=cpu`` drives any CLI on the host backend — the supported
way to smoke-test entry points on a machine whose accelerator is absent or
unreachable (``benchmarks/trace_eval.py --platform`` does the same thing
for the trace toolkit).
"""

from __future__ import annotations

import os


def apply_env_platform(default: str | None = None) -> str | None:
    """Pin jax to ``CCVPE_PLATFORM`` (or ``default``) if set.

    Must run before the first backend-initializing JAX call.  Returns the
    platform pinned, or None when unpinned.
    """
    platform = os.environ.get("CCVPE_PLATFORM", default)
    if platform:
        import jax

        jax.config.update("jax_platforms", platform)
    return platform or None
