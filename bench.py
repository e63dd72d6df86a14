#!/usr/bin/env python
"""Headline benchmark: VIGOR query-aerial pairs/sec/chip.

Runs the flagship CVM_VIGOR inference forward (320x640 panorama + 512x512
aerial -> heatmap + orientation field, all 20 orientation bins) in a jitted
steady-state loop on the default device and prints ONE JSON line.

Baseline: the reference's published per-frame pose throughput, 14 FPS on GPU
(``/root/reference/README.md:21``; see BASELINE.md).

Env knobs:
  CCVPE_BENCH_BATCH   global batch (default 128)
  CCVPE_BENCH_DTYPE   float32 | bfloat16 activations (default bfloat16)
  CCVPE_BENCH_ITERS   timed iterations (default 30)
  CCVPE_BENCH_PRESET  model preset (default VIGOR)
  CCVPE_BENCH_MATCHING  einsum | pallas | reference (default einsum)
  CCVPE_BENCH_PLATFORM  pin the jax backend, e.g. cpu (debug/CI)
  CCVPE_BENCH_QUANT   int8 -> post-training-quantized forward (nn/quant.py:
                      calibrate on the bench batch, per-channel int8 weights,
                      static activation scales; MXU int8 path)
  CCVPE_QUANT_SELECT  conv selection policy for int8: all (default) |
                      mxu[:threshold] (only compute-bound convs,
                      nn/quant.py::mxu_bound_select)
"""

import json
import os
import sys
import time

# Dense bf16 peak FLOP/s per chip by device kind (public TPU specs; the MXU
# runs bf16-multiply/f32-accumulate, so this is the honest MFU denominator
# for both dtype modes).
PEAK_FLOPS = (
    ("v6", 918e12),       # Trillium / v6e
    ("v5p", 459e12),
    ("v5", 197e12),       # v5e reports device_kind "TPU v5 lite"
    ("v4", 275e12),
    ("v3", 123e12),
    ("v2", 46e12),
)


def peak_flops(device) -> float | None:
    kind = getattr(device, "device_kind", "").lower()
    if device.platform != "tpu":
        return None
    for tag, peak in PEAK_FLOPS:
        if tag in kind:
            return peak
    return None


def compiled_flops(fn, *args) -> float | None:
    """FLOPs of one execution from XLA's cost model of the compiled HLO."""
    import jax

    try:
        cost = jax.jit(fn).lower(*args).compile().cost_analysis()
        if isinstance(cost, (list, tuple)):
            cost = cost[0]
        return float(cost["flops"])
    except Exception:
        return None


def main():
    batch = int(os.environ.get("CCVPE_BENCH_BATCH", "128"))
    dtype_name = os.environ.get("CCVPE_BENCH_DTYPE", "bfloat16")
    iters = int(os.environ.get("CCVPE_BENCH_ITERS", "30"))
    preset = os.environ.get("CCVPE_BENCH_PRESET", "VIGOR")
    matching = os.environ.get("CCVPE_BENCH_MATCHING", "einsum")

    import jax

    # CCVPE_BENCH_PLATFORM=cpu pins the backend (debug/CI runs; the
    # environment's sitecustomize may override JAX_PLATFORMS itself)
    platform = os.environ.get("CCVPE_BENCH_PLATFORM")
    if platform:
        jax.config.update("jax_platforms", platform)
    import jax.numpy as jnp

    from ccvpe_tpu.utils import compilation_cache
    compilation_cache.enable()

    from ccvpe_tpu.models import cvm

    # Watchdog: a dead TPU tunnel makes backend init hang forever inside
    # jax.devices() (observed in this environment) — emit an honest error
    # record and exit instead of stalling the driver's round-end bench.
    import threading
    init_done = threading.Event()
    try:
        init_timeout = float(os.environ.get("CCVPE_BENCH_INIT_TIMEOUT",
                                            "1800"))
    except ValueError:
        print("warning: bad CCVPE_BENCH_INIT_TIMEOUT, using 1800s",
              file=sys.stderr)
        init_timeout = 1800.0

    def _watchdog():
        timeout = init_timeout
        if not init_done.wait(timeout):
            print(json.dumps({
                "metric": f"{preset} inference throughput",
                "value": 0.0, "unit": "pairs/sec/chip", "vs_baseline": 0.0,
                "error": f"device backend failed to initialize within "
                         f"{timeout:.0f}s (TPU tunnel down?)"}))
            sys.stdout.flush()
            os._exit(3)

    threading.Thread(target=_watchdog, daemon=True).start()
    dev = jax.devices()[0]
    init_done.set()
    dtype = jnp.bfloat16 if dtype_name == "bfloat16" else jnp.float32

    cfg = cvm.PRESETS[preset]
    params, state = cvm.init(jax.random.PRNGKey(0), cfg)

    def one_forward(params, state, grd, sat):
        out, _ = cvm.forward(cfg, params, state, grd.astype(dtype),
                             sat.astype(dtype), train=False,
                             matching_impl=matching)
        return out.heatmap, out.ori

    @jax.jit
    def timed_loop(params, state, grd, sat):
        # Device-side loop: amortizes host<->device dispatch latency out of
        # the measurement.  The carry perturbs the input so XLA cannot hoist
        # the loop-invariant forward out of the scan.
        def step(carry, _):
            hm, ori = one_forward(params, state, grd + carry * 1e-6, sat)
            return (jnp.sum(hm) + jnp.sum(ori)).astype(jnp.float32), None

        total, _ = jax.lax.scan(step, jnp.float32(0.0), None, length=iters)
        return total

    key = jax.random.PRNGKey(1)
    grd = jax.random.normal(key, (batch, *cfg.grd_hw, 3), jnp.float32)
    sat = jax.random.normal(key, (batch, *cfg.sat_hw, 3), jnp.float32)

    quant_mode = os.environ.get("CCVPE_BENCH_QUANT", "")
    if quant_mode == "int8":
        from ccvpe_tpu.nn import quant as quant_lib

        def calib_fwd(p, g, s):
            out, _ = cvm.forward(cfg, p, state, g.astype(dtype),
                                 s.astype(dtype), train=False,
                                 matching_impl=matching)
            return out.logits_flattened

        ranges = quant_lib.calibrate(calib_fwd, params, [(grd, sat)])
        params = quant_lib.quantize_params(
            jax.device_get(params), ranges,
            select=quant_lib.resolve_select(
                os.environ.get("CCVPE_QUANT_SELECT", "all")))
        # commit the tree to the device: quantize_params leaves
        # non-selected weights as host numpy, and uncommitted leaves
        # re-upload per executable call — the round-3 "int8 loses" result
        # (907 vs 1239) was THIS artifact, not the int8 program
        # (benchmarks/QUANT_BENCH.json round 5)
        params = jax.device_put(params)
    elif quant_mode:
        raise SystemExit(f"unknown CCVPE_BENCH_QUANT={quant_mode!r}")

    float(timed_loop(params, state, grd, sat))  # compile + warmup
    t0 = time.perf_counter()
    float(timed_loop(params, state, grd, sat))  # fetch forces completion
    dt = time.perf_counter() - t0

    pairs_per_sec = batch * iters / dt
    baseline_fps = 14.0  # reference README.md:21

    # MFU accounting: XLA's own FLOP count of the compiled forward vs the
    # chip's dense bf16 peak (VERDICT r1 item 8)
    record = {
        "metric": f"{preset} inference throughput (batch {batch}, "
                  f"{dtype_name}{'+int8 PTQ' if quant_mode else ''}, "
                  f"{dev.platform})",
        "value": round(pairs_per_sec, 2),
        "unit": "pairs/sec/chip",
        "vs_baseline": round(pairs_per_sec / baseline_fps, 2),
    }
    flops = compiled_flops(one_forward, params, state, grd, sat)
    if flops is not None:
        record["flops_per_pair"] = round(flops / batch)
        achieved = flops * pairs_per_sec / batch
        record["tflops_per_sec"] = round(achieved / 1e12, 2)
        peak = peak_flops(dev)
        if peak is not None:
            record["mfu_pct"] = round(100 * achieved / peak, 2)
    print(json.dumps(record))


if __name__ == "__main__":
    sys.exit(main())
