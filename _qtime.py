"""Per-dispatch eval forward timing: bf16 vs int8-all vs int8-mxu240.

Distinguishes 'int8 is genuinely slower' from 'the bench's in-jit scan
penalizes int8' (e.g. per-iteration layout converts of int8 weights).
Times N sequential dispatches of the AOT-compiled forward; in-order TPU
execution means elapsed ~= N*step + one round trip (final float() forces
real completion through the tunnel).
"""
import time

import jax
import jax.numpy as jnp

from ccvpe_tpu.models import cvm
from ccvpe_tpu.nn import quant as quant_lib
from ccvpe_tpu.utils import compilation_cache

compilation_cache.enable()

cfg = cvm.PRESETS["VIGOR"]
B = 128
params, state = cvm.init(jax.random.PRNGKey(0), cfg)
key = jax.random.PRNGKey(1)
grd = jax.random.normal(key, (B, *cfg.grd_hw, 3), jnp.float32)
sat = jax.random.normal(key, (B, *cfg.sat_hw, 3), jnp.float32)


def make_fwd():
    def fwd(p, g, s):
        out, _ = cvm.forward(cfg, p, state, g.astype(jnp.bfloat16),
                             s.astype(jnp.bfloat16), train=False)
        return (jnp.sum(out.heatmap.astype(jnp.float32))
                + jnp.sum(out.ori.astype(jnp.float32)))
    return fwd


def calib_fwd(p, g, s):
    out, _ = cvm.forward(cfg, p, state, g.astype(jnp.bfloat16),
                         s.astype(jnp.bfloat16), train=False)
    return out.logits_flattened


ranges = quant_lib.calibrate(calib_fwd, params, [(grd, sat)])
host_params = jax.device_get(params)

variants = {
    "bf16": params,
    "int8-all": quant_lib.quantize_params(
        host_params, ranges, select=quant_lib.resolve_select("all")),
    "int8-mxu240": quant_lib.quantize_params(
        host_params, ranges, select=quant_lib.resolve_select("mxu:240")),
}

ITERS = 20
for name, p in variants.items():
    fwd = jax.jit(make_fwd())
    compiled = fwd.lower(p, grd, sat).compile()
    float(compiled(p, grd, sat))  # warmup, forces completion
    t0 = time.perf_counter()
    r = None
    for _ in range(ITERS):
        r = compiled(p, grd, sat)
    final = float(r)
    dt = (time.perf_counter() - t0) / ITERS
    print(f"{name:12s} {dt*1e3:8.2f} ms/dispatch  {B/dt:8.1f} pairs/s"
          f"  (check {final:.1f})", flush=True)
