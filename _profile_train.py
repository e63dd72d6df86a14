import time, glob
import numpy as np
import jax, jax.numpy as jnp
from ccvpe_tpu.utils import compilation_cache
compilation_cache.enable()
from ccvpe_tpu.models import cvm
from ccvpe_tpu.ops import gt as gt_ops
from ccvpe_tpu.train import loop as train_loop

cfg = cvm.PRESETS["VIGOR"]
opt = train_loop.make_optimizer()
step = train_loop.make_train_step(cfg, opt, remat=True,
                                  compute_dtype=jnp.bfloat16)
import jax.sharding as shd
from ccvpe_tpu.parallel import mesh as mesh_lib
mesh = mesh_lib.create_mesh(n_data=1, n_model=1)
train_step = train_loop.compile_train_step(step, mesh)
state = train_loop.create_train_state(cfg, jax.random.PRNGKey(0), opt)
state = mesh_lib.replicate(mesh, state)

B = 128
rng = jax.random.PRNGKey(1)
grd = jax.random.normal(rng, (B, *cfg.grd_hw, 3), jnp.float32)
sat = jax.random.normal(rng, (B, *cfg.sat_hw, 3), jnp.float32)
row = jnp.zeros((B,)); col = jnp.zeros((B,)); ang = jnp.zeros((B,))
gt, weights, omap = gt_ops.synthesize_batch_factored(
    row, col, ang, height=512, width=512, bins=20, clockwise=False)
batch = {"grd": grd, "sat": sat, "gt": gt, "bin_weights": weights,
         "orientation": omap}
batch = mesh_lib.shard_batch(mesh, batch)

state, parts = train_step(state, batch, rng)
jax.block_until_ready(parts)
t0 = time.perf_counter()
state, parts = train_step(state, batch, rng)
print("loss", float(parts["loss"]))
print("ms/step (incl fetch):", (time.perf_counter()-t0)*1000)
jax.profiler.start_trace("/tmp/tpu_train_trace")
state, parts = train_step(state, batch, rng)
_ = float(parts["loss"])
jax.profiler.stop_trace()
print("trace done")
