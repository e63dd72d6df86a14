import jax, jax.numpy as jnp
from ccvpe_tpu.models import cvm
cfg = cvm.PRESETS["VIGOR"]
params, state = cvm.init(jax.random.PRNGKey(0), cfg)
def fwd(params, state, grd, sat):
    out, _ = cvm.forward(cfg, params, state, grd.astype(jnp.bfloat16),
                         sat.astype(jnp.bfloat16), train=False)
    return out.heatmap, out.ori
B = 128
grd = jax.ShapeDtypeStruct((B, *cfg.grd_hw, 3), jnp.float32)
sat = jax.ShapeDtypeStruct((B, *cfg.sat_hw, 3), jnp.float32)
c = jax.jit(fwd).lower(params, state, grd, sat).compile()
txt = c.as_text()
open("/tmp/hlo.txt", "w").write(txt)
print(len(txt))
