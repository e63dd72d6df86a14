"""Capture a TPU trace of the batch-128 bf16 VIGOR forward + dump top HLO ops
by cost from the compiled module's per-op stats if available."""
import os, time, json
import jax, jax.numpy as jnp
from ccvpe_tpu.utils import compilation_cache
compilation_cache.enable()
from ccvpe_tpu.models import cvm

cfg = cvm.PRESETS["VIGOR"]
params, state = cvm.init(jax.random.PRNGKey(0), cfg)

@jax.jit
def fwd(params, state, grd, sat):
    out, _ = cvm.forward(cfg, params, state, grd.astype(jnp.bfloat16),
                         sat.astype(jnp.bfloat16), train=False)
    return out.heatmap, out.ori

key = jax.random.PRNGKey(1)
B = 128
grd = jax.random.normal(key, (B, *cfg.grd_hw, 3), jnp.float32)
sat = jax.random.normal(key, (B, *cfg.sat_hw, 3), jnp.float32)
r = fwd(params, state, grd, sat); jax.block_until_ready(r)
# memory analysis
c = fwd.lower(params, state, grd, sat).compile()
ma = c.memory_analysis()
print("memory:", ma)
t0=time.perf_counter()
for _ in range(3):
    r = fwd(params, state, grd, sat)
jax.block_until_ready(r)
print("ms/fwd:", (time.perf_counter()-t0)/3*1000)
os.makedirs("/tmp/tpu_trace", exist_ok=True)
jax.profiler.start_trace("/tmp/tpu_trace")
r = fwd(params, state, grd, sat); jax.block_until_ready(r)
jax.profiler.stop_trace()
print("trace done")
