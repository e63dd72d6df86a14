#!/usr/bin/env python
"""Training-step throughput benchmark (single chip).

Usage: python benchmarks/train_bench.py [preset] [batch,batch...] [dtype]
Env:   CCVPE_TRAIN_BENCH_REMAT=1|all|encoder|decoder   remat the backward
       CCVPE_TRAIN_BENCH_BF16_PARAMS=1  bf16-resident weights (f32 master)

Each configuration gets a fresh TrainState (the step donates its input
buffers).  Reports ms/step and pairs/sec after one compile + warmup step.
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    preset = sys.argv[1] if len(sys.argv) > 1 else "VIGOR"
    batches = [int(b) for b in
               (sys.argv[2] if len(sys.argv) > 2 else "8,16").split(",")]
    dtype_name = sys.argv[3] if len(sys.argv) > 3 else "bfloat16"
    remat_env = os.environ.get("CCVPE_TRAIN_BENCH_REMAT", "")
    remat = {"": False, "0": False, "1": True}.get(remat_env, remat_env)
    grad_accum = int(os.environ.get("CCVPE_TRAIN_BENCH_ACCUM", "1"))
    bf16_params = os.environ.get("CCVPE_TRAIN_BENCH_BF16_PARAMS") == "1"

    import jax
    import jax.numpy as jnp

    from ccvpe_tpu.models import cvm
    from ccvpe_tpu.ops import gt as gt_ops
    from ccvpe_tpu.train import loop as train_loop

    cfg = cvm.PRESETS[preset]
    dtype = {"float32": jnp.float32, "bfloat16": jnp.bfloat16}[dtype_name]
    opt = train_loop.make_optimizer(f32_master=bf16_params)
    param_dtype = jnp.bfloat16 if bf16_params else None
    step = train_loop.make_train_step(cfg, opt, remat=remat,
                                      compute_dtype=dtype,
                                      grad_accum=grad_accum)
    jstep = jax.jit(step, donate_argnums=(0,))

    for b in batches:
        state = train_loop.create_train_state(cfg, jax.random.PRNGKey(0), opt,
                                              param_dtype=param_dtype)
        rng = np.random.default_rng(0)
        h, w = cfg.sat_hw
        gt, weights, omap = gt_ops.synthesize_batch_factored(
            jnp.asarray(rng.uniform(-20, 20, b), jnp.float32),
            jnp.asarray(rng.uniform(-20, 20, b), jnp.float32),
            jnp.asarray(rng.uniform(0, 360, b), jnp.float32),
            height=h, width=w, bins=cfg.bins)
        batch = {
            "grd": jnp.asarray(rng.standard_normal((b, *cfg.grd_hw, 3)),
                               jnp.float32),
            "sat": jnp.asarray(rng.standard_normal((b, h, w, 3)),
                               jnp.float32),
            "gt": gt, "bin_weights": weights, "orientation": omap,
        }
        try:
            state, parts = jstep(state, batch, jax.random.PRNGKey(1))
            float(parts["loss"])  # force completion (compile + warmup)
        except Exception as e:
            print(f"{preset} B={b} {dtype_name} remat={remat}: "
                  f"FAILED ({type(e).__name__}: {e})", flush=True)
            continue
        n = 10
        t0 = time.perf_counter()
        for i in range(n):
            state, parts = jstep(state, batch, jax.random.PRNGKey(i))
        loss = float(parts["loss"])
        dt = (time.perf_counter() - t0) / n

        # MFU: XLA's FLOP count of the compiled step (fwd+bwd+Adam, incl.
        # remat recompute) over the chip's dense bf16 peak (see bench.py)
        mfu = ""
        import bench as bench_mod

        try:  # reuses jstep's cached executable — no recompile
            cost = jstep.lower(state, batch,
                               jax.random.PRNGKey(0)).compile().cost_analysis()
            if isinstance(cost, (list, tuple)):
                cost = cost[0]
            flops = float(cost["flops"])
        except Exception:
            flops = None
        if flops is not None:
            achieved = flops / dt
            mfu = f", {achieved / 1e12:.1f} TFLOP/s"
            peak = bench_mod.peak_flops(jax.devices()[0])
            if peak:
                mfu += f" = {100 * achieved / peak:.1f}% MFU"
        print(f"{preset} B={b} {dtype_name} remat={remat} "
              f"accum={grad_accum} "
              f"bf16_params={bf16_params}: "
              f"{dt * 1e3:.0f} ms/step -> {b / dt:.1f} pairs/s "
              f"(loss {loss:.0f}{mfu})", flush=True)


if __name__ == "__main__":
    main()
