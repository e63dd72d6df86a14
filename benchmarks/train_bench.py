#!/usr/bin/env python
"""Training-step throughput benchmark (single chip).

Usage:
  python benchmarks/train_bench.py [preset] [batch,batch...] [dtype]
  python benchmarks/train_bench.py --headline [--out benchmarks/TRAIN_BENCH.json]

Env:   CCVPE_TRAIN_BENCH_REMAT=1|all|encoder|decoder   remat the backward
       CCVPE_TRAIN_BENCH_BF16_PARAMS=1  bf16-resident weights (f32 master)
       CCVPE_TRAIN_BENCH_ACCUM=N        grad accumulation microbatches

``--headline`` measures the three headline train configs from
ARCHITECTURE.md — f32 B=8 (the reference's training config,
``/root/reference/train_VIGOR.py:30,104``), bf16 + ``--remat encoder``
B=128 (the single-chip HBM frontier), and bf16 + remat + ``--grad_accum 2``
B=256 — and writes them as ONE json artifact so train-step regressions are
visible in the per-round artifact trail, not just in prose.

Each configuration gets a fresh TrainState (the step donates its input
buffers).  Reports ms/step and pairs/sec after one compile + warmup step.
"""

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

HEADLINE = [
    # (label, batch, dtype, remat, grad_accum) — keep in sync with
    # ARCHITECTURE.md "Training throughput"
    ("f32 B=8 (reference config)", 8, "float32", False, 1),
    ("bf16 remat-encoder B=128", 128, "bfloat16", "encoder", 1),
    ("bf16 remat-encoder grad-accum-2 B=256", 256, "bfloat16", "encoder", 2),
]


def measure(preset: str, b: int, dtype_name: str, remat, grad_accum: int,
            bf16_params: bool, iters: int = 10) -> dict:
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

    record = {"preset": preset, "batch": b, "dtype": dtype_name,
              "remat": remat or False, "grad_accum": grad_accum,
              "bf16_params": bf16_params}
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
        record["error"] = f"{type(e).__name__}: {e}"
        return record
    t0 = time.perf_counter()
    for i in range(iters):
        state, parts = jstep(state, batch, jax.random.PRNGKey(i))
    loss = float(parts["loss"])
    dt = (time.perf_counter() - t0) / iters

    record.update(ms_per_step=round(dt * 1e3, 1),
                  pairs_per_sec=round(b / dt, 1), loss=round(loss, 1))

    # MFU: XLA's FLOP count of the compiled step (fwd+bwd+Adam, incl.
    # remat recompute) over the chip's dense bf16 peak (see bench.py)
    import bench as bench_mod

    try:  # reuses jstep's cached executable — no recompile
        cost = jstep.lower(state, batch,
                           jax.random.PRNGKey(0)).compile().cost_analysis()
        if isinstance(cost, (list, tuple)):
            cost = cost[0]
        flops = float(cost["flops"])
        if grad_accum > 1:
            # XLA's cost analysis counts a lax.scan/while body ONCE; the
            # grad-accum step runs it grad_accum times.  Scale the scanned
            # microbatch work (the optimizer update outside the scan is
            # FLOP-negligible) so MFU is comparable across configs.
            flops *= grad_accum
            record["flops_note"] = (f"scan body x{grad_accum} "
                                    "(cost_analysis counts it once)")
    except Exception:
        flops = None
    if flops is not None:
        achieved = flops / dt
        record["tflops_per_sec"] = round(achieved / 1e12, 2)
        peak = bench_mod.peak_flops(jax.devices()[0])
        if peak:
            record["mfu_pct"] = round(100 * achieved / peak, 1)
    return record


def _print(r: dict):
    if "error" in r:
        print(f"{r['preset']} B={r['batch']} {r['dtype']} "
              f"remat={r['remat']}: FAILED ({r['error']})", flush=True)
        return
    mfu = (f", {r['tflops_per_sec']} TFLOP/s"
           if "tflops_per_sec" in r else "")
    if "mfu_pct" in r:
        mfu += f" = {r['mfu_pct']}% MFU"
    print(f"{r['preset']} B={r['batch']} {r['dtype']} remat={r['remat']} "
          f"accum={r['grad_accum']} bf16_params={r['bf16_params']}: "
          f"{r['ms_per_step']} ms/step -> {r['pairs_per_sec']} pairs/s "
          f"(loss {r['loss']}{mfu})", flush=True)


def main():
    from ccvpe_tpu.utils import compilation_cache
    from ccvpe_tpu.utils.platform import apply_env_platform
    apply_env_platform()  # CCVPE_PLATFORM=cpu -> host-backend smoke
    compilation_cache.enable()

    if "--headline" in sys.argv:
        argv = [a for a in sys.argv[1:] if a != "--headline"]
        out = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                           "TRAIN_BENCH.json")
        if "--out" in argv:
            i = argv.index("--out")
            out = argv[i + 1]
        import jax

        preset = os.environ.get("CCVPE_BENCH_PRESET", "VIGOR")
        dev = jax.devices()[0]
        results = []
        for label, b, dtype_name, remat, accum in HEADLINE:
            r = measure(preset, b, dtype_name, remat, accum,
                        bf16_params=False)
            r["label"] = label
            _print(r)
            results.append(r)
        with open(out, "w") as f:
            json.dump({"device": dev.device_kind, "platform": dev.platform,
                       "unit": "pairs/sec/chip", "results": results}, f,
                      indent=1)
        print(f"wrote {out}", flush=True)
        return

    preset = sys.argv[1] if len(sys.argv) > 1 else "VIGOR"
    batches = [int(b) for b in
               (sys.argv[2] if len(sys.argv) > 2 else "8,16").split(",")]
    dtype_name = sys.argv[3] if len(sys.argv) > 3 else "bfloat16"
    remat_env = os.environ.get("CCVPE_TRAIN_BENCH_REMAT", "")
    remat = {"": False, "0": False, "1": True}.get(remat_env, remat_env)
    grad_accum = int(os.environ.get("CCVPE_TRAIN_BENCH_ACCUM", "1"))
    bf16_params = os.environ.get("CCVPE_TRAIN_BENCH_BF16_PARAMS") == "1"
    for b in batches:
        _print(measure(preset, b, dtype_name, remat, grad_accum,
                       bf16_params))


if __name__ == "__main__":
    main()
