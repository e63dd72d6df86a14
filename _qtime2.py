"""Per-call wall times, plain jit (the serving dispatch path), int8-all."""
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


@jax.jit
def fwd(p, g, s):
    out, _ = cvm.forward(cfg, p, state, g.astype(jnp.bfloat16),
                         s.astype(jnp.bfloat16), train=False)
    return (jnp.sum(out.heatmap.astype(jnp.float32))
            + jnp.sum(out.ori.astype(jnp.float32)))


def calib_fwd(p, g, s):
    out, _ = cvm.forward(cfg, p, state, g.astype(jnp.bfloat16),
                         s.astype(jnp.bfloat16), train=False)
    return out.logits_flattened


ranges = quant_lib.calibrate(calib_fwd, params, [(grd, sat)])
qp = quant_lib.quantize_params(jax.device_get(params), ranges,
                               select=quant_lib.resolve_select("all"))
n_leaves = len(jax.tree_util.tree_leaves(qp))
print(f"leaves: {n_leaves}", flush=True)
for i in range(6):
    t0 = time.perf_counter()
    r = float(fwd(qp, grd, sat))
    print(f"call {i}: {time.perf_counter()-t0:8.2f} s  ({r:.1f})", flush=True)
