#!/usr/bin/env python
"""Cold vs cache-warm time-to-first-step (compile-time observability).

Operators hit compile latency before any throughput number: a full-model
TPU compile is minutes, and whether the second run starts in seconds
depends on the persistent compilation cache actually hitting across
processes (``utils/compilation_cache.py``;
``tests/test_compilation_cache.py`` pins the cross-process key-stability
contract).  This bench measures it: for each headline config it launches a
FRESH python process (so nothing in-process is reused) and records
time-to-first-step-done twice — against an empty cache directory (cold)
and against the directory the cold run populated (warm).

Writes benchmarks/COMPILE_TIME.json; the ARCHITECTURE.md table comes from
the TPU v5e run.
"""

import json
import os
import subprocess
import sys
import tempfile
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

_CHILD = r"""
import logging, os, sys, time
t0 = time.perf_counter()
sys.path.insert(0, os.environ["CCVPE_REPO"])

# Deterministic hit/miss detection: the remote-compile service's latency
# has minutes-scale variance under load, so wall time alone cannot tell a
# cache hit from a lucky compile.  JAX logs every persistent-cache hit at
# DEBUG in jax._src.compiler; capture those records.
_hits = []
class _HitHandler(logging.Handler):
    def emit(self, record):
        msg = record.getMessage()
        if "Persistent compilation cache hit for" in msg:
            _hits.append(msg.split("'")[1])  # the jit function name
_complog = logging.getLogger("jax._src.compiler")
_complog.setLevel(logging.DEBUG)
_complog.addHandler(_HitHandler())

from ccvpe_tpu.utils.platform import apply_env_platform
apply_env_platform()
from ccvpe_tpu.utils import compilation_cache
compilation_cache.enable()
import jax, jax.numpy as jnp
from ccvpe_tpu.models import cvm
from ccvpe_tpu.train import loop as train_loop
from ccvpe_tpu.ops import gt as gt_ops
import numpy as np

mode = os.environ["CCVPE_CT_MODE"]
b = int(os.environ.get("CCVPE_CT_BATCH", "128"))
cfg = cvm.PRESETS[os.environ.get("CCVPE_BENCH_PRESET", "VIGOR")]
rng = np.random.default_rng(0)
grd = jnp.asarray(rng.standard_normal((b, *cfg.grd_hw, 3)), jnp.float32)
sat = jnp.asarray(rng.standard_normal((b, *cfg.sat_hw, 3)), jnp.float32)
t_import = time.perf_counter() - t0

if mode == "eval":
    params, state = cvm.init(jax.random.PRNGKey(0), cfg)

    @jax.jit
    def step(p, s, g, a):
        out, _ = cvm.forward(cfg, p, s, g.astype(jnp.bfloat16),
                             a.astype(jnp.bfloat16), train=False)
        return jnp.sum(out.heatmap.astype(jnp.float32))

    t1 = time.perf_counter()
    float(step(params, state, grd, sat))
else:
    opt = train_loop.make_optimizer()
    tstep = train_loop.make_train_step(cfg, opt, remat="encoder",
                                       compute_dtype=jnp.bfloat16)
    jstep = jax.jit(tstep, donate_argnums=(0,))
    st = train_loop.create_train_state(cfg, jax.random.PRNGKey(0), opt)
    h, w = cfg.sat_hw
    gt, wts, omap = gt_ops.synthesize_batch_factored(
        jnp.asarray(rng.uniform(-20, 20, b), jnp.float32),
        jnp.asarray(rng.uniform(-20, 20, b), jnp.float32),
        jnp.asarray(rng.uniform(0, 360, b), jnp.float32),
        height=h, width=w, bins=cfg.bins)
    batch = {"grd": grd, "sat": sat, "gt": gt, "bin_weights": wts,
             "orientation": omap}
    t1 = time.perf_counter()
    st, parts = jstep(st, batch, jax.random.PRNGKey(1))
    float(parts["loss"])

main_fn = "jit_step" if mode == "eval" else "jit_train_step"
print(json.dumps({"import_and_data_s": round(t_import, 1),
                  "first_step_s": round(time.perf_counter() - t1, 1),
                  "total_s": round(time.perf_counter() - t0, 1),
                  "main_program_cache_hit": main_fn in _hits,
                  "cache_hits": len(_hits)}))
""".replace("json.dumps", "__import__('json').dumps")


def run_child(mode: str, batch: int, cache_dir: str) -> dict:
    env = dict(os.environ, CCVPE_REPO=REPO, CCVPE_CT_MODE=mode,
               CCVPE_CT_BATCH=str(batch),
               CCVPE_COMPILATION_CACHE=cache_dir)
    p = subprocess.run([sys.executable, "-c", _CHILD], env=env,
                       stdout=subprocess.PIPE, text=True, timeout=3600)
    assert p.returncode == 0, p.stdout
    return json.loads(p.stdout.strip().splitlines()[-1])


def main():
    out = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                       "COMPILE_TIME.json")
    results = []
    for mode, batch in (("eval", 128), ("train", 128)):
        with tempfile.TemporaryDirectory() as cache:
            cold = run_child(mode, batch, cache)
            entries = len(os.listdir(cache))
            warm = run_child(mode, batch, cache)
        row = {"config": f"{mode} B={batch} bf16"
                         + (" remat-encoder" if mode == "train" else ""),
               "cold": cold, "cache_entries_after_cold": entries,
               "warm": warm}
        results.append(row)
        print(json.dumps(row), flush=True)
    with open(out, "w") as f:
        json.dump({"results": results}, f, indent=1)
    print(f"wrote {out}", flush=True)


if __name__ == "__main__":
    main()
