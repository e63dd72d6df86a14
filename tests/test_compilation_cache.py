"""Persistent XLA compilation cache (``utils/compilation_cache.py``).

Operators hit compile time before any other number (full-model TPU compiles
are minutes); the contract that makes it a one-time cost is that cache keys
are stable ACROSS PROCESSES — a fresh interpreter pointed at the same
``CCVPE_COMPILATION_CACHE`` directory must load the executable another
process built.  This launches two real processes and asserts the second one
reports the persistent-cache hit for the probe function (JAX logs it
deterministically at DEBUG), rather than relying on timing.
"""

import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

_PROBE = r"""
import logging, sys
logging.basicConfig(level=logging.DEBUG)
import jax
jax.config.update("jax_platforms", "cpu")
from ccvpe_tpu.utils import compilation_cache
compilation_cache.enable()
# the probe compiles in ms; drop enable()'s 1s floor so it is cacheable
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
import jax.numpy as jnp

def cc_probe(x):
    return jnp.tanh(x @ x.T).sum()

print("result:", jax.jit(cc_probe)(jnp.ones((64, 64))))
"""


def _run(cache_dir: str) -> str:
    env = dict(os.environ, CCVPE_COMPILATION_CACHE=cache_dir,
               JAX_PLATFORMS="cpu")
    p = subprocess.run([sys.executable, "-c", _PROBE], cwd=REPO, env=env,
                       stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
                       text=True, timeout=300)
    assert p.returncode == 0, p.stdout
    return p.stdout


def test_cache_hits_across_processes(tmp_path):
    cache = str(tmp_path / "xla_cache")
    hit_line = "Persistent compilation cache hit for 'jit_cc_probe'"

    first = _run(cache)
    assert hit_line not in first  # cold: a real compile
    entries = [f for f in os.listdir(cache) if "cc_probe" in f]
    assert entries, os.listdir(cache)

    second = _run(cache)
    assert hit_line in second, second
    # the hit loaded the existing entry; nothing new was written for it
    assert [f for f in os.listdir(cache) if "cc_probe" in f] == entries
