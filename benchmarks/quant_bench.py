#!/usr/bin/env python
"""End-to-end int8-PTQ throughput: bf16 vs quant selection policies.

Closes the evidence loop on the int8 conv-selection policies
(``nn/quant.py``): round 3's recorded all-conv *loss* (907 vs 1239
pairs/s) turned out to be an uncommitted-params artifact, not the int8
program (see ARCHITECTURE.md "Lower precision") — with the quantized tree
committed to the device, int8 wins under every policy (``all`` +12.8%
steady state, ``mxu:120`` best per dispatch).  This bench measures bf16
against each policy on the chip, in one committed artifact
(``benchmarks/QUANT_BENCH.json``).

Each variant is timed two ways in one process (shared backend + compile
cache):

  scan      iters forwards inside one jitted ``lax.scan`` — the same
            steady-state loop as ``bench.py``, comparable to BENCH_r*.json
  dispatch  N sequential dispatches of the AOT-compiled forward — the
            serving path (per-call dispatch included); in-order TPU
            execution makes elapsed ~= N*step + one final round trip

Usage: python benchmarks/quant_bench.py [--out benchmarks/QUANT_BENCH.json]
Env: CCVPE_BENCH_BATCH / CCVPE_BENCH_ITERS / CCVPE_BENCH_PRESET as bench.py.
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp


def build(cfg, state, matching):
    from ccvpe_tpu.models import cvm

    def fwd(p, g, s):
        out, _ = cvm.forward(cfg, p, state, g.astype(jnp.bfloat16),
                             s.astype(jnp.bfloat16), train=False,
                             matching_impl=matching)
        return (jnp.sum(out.heatmap.astype(jnp.float32))
                + jnp.sum(out.ori.astype(jnp.float32)))

    return fwd


def time_dispatch(fwd, params, grd, sat, iters):
    compiled = jax.jit(fwd).lower(params, grd, sat).compile()
    float(compiled(params, grd, sat))  # warmup, forces completion
    t0 = time.perf_counter()
    r = None
    for _ in range(iters):
        r = compiled(params, grd, sat)
    float(r)  # one final round trip
    return (time.perf_counter() - t0) / iters


def time_scan(fwd, params, grd, sat, iters):
    @jax.jit
    def loop(p, g, s):
        def step(carry, _):
            # perturb the input so XLA cannot hoist the forward out
            return fwd(p, g + carry * 1e-6, s), None

        total, _ = jax.lax.scan(step, jnp.float32(0.0), None, length=iters)
        return total

    float(loop(params, grd, sat))  # compile + warmup
    t0 = time.perf_counter()
    float(loop(params, grd, sat))
    return (time.perf_counter() - t0) / iters


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default=os.path.join(
        os.path.dirname(os.path.abspath(__file__)), "QUANT_BENCH.json"))
    ap.add_argument("--selects", nargs="*",
                    default=["bf16", "all", "mxu", "mxu:120", "mxu:400"])
    args = ap.parse_args()

    from ccvpe_tpu.utils import compilation_cache
    from ccvpe_tpu.utils.platform import apply_env_platform
    apply_env_platform()  # CCVPE_PLATFORM=cpu -> host-backend smoke
    compilation_cache.enable()
    from ccvpe_tpu.models import cvm
    from ccvpe_tpu.nn import quant as quant_lib

    batch = int(os.environ.get("CCVPE_BENCH_BATCH", "128"))
    iters = int(os.environ.get("CCVPE_BENCH_ITERS", "30"))
    preset = os.environ.get("CCVPE_BENCH_PRESET", "VIGOR")
    matching = os.environ.get("CCVPE_BENCH_MATCHING", "einsum")

    dev = jax.devices()[0]
    cfg = cvm.PRESETS[preset]
    params, state = cvm.init(jax.random.PRNGKey(0), cfg)
    key = jax.random.PRNGKey(1)
    grd = jax.random.normal(key, (batch, *cfg.grd_hw, 3), jnp.float32)
    sat = jax.random.normal(key, (batch, *cfg.sat_hw, 3), jnp.float32)
    fwd = build(cfg, state, matching)

    def calib_fwd(p, g, s):
        out, _ = cvm.forward(cfg, p, state, g.astype(jnp.bfloat16),
                             s.astype(jnp.bfloat16), train=False,
                             matching_impl=matching)
        return out.logits_flattened

    ranges = quant_lib.calibrate(calib_fwd, params, [(grd, sat)])
    host_params = jax.device_get(params)

    results = []
    for spec in args.selects:
        if spec == "bf16":
            p, qfrac = params, 0.0
        else:
            p = quant_lib.quantize_params(
                host_params, ranges, select=quant_lib.resolve_select(spec))
            # commit to device once (api.quantize_int8 does the same);
            # uncommitted host leaves re-upload on every dispatch
            p = jax.device_put(p)
            qfrac = quant_lib.quantized_fraction(p)
        row = {"variant": spec,
               "quantized_weight_fraction": round(qfrac, 4)}
        for mode, timer in (("scan", time_scan), ("dispatch", time_dispatch)):
            dt = timer(fwd, p, grd, sat, iters)
            row[f"{mode}_pairs_per_sec"] = round(batch / dt, 1)
            row[f"{mode}_ms_per_batch"] = round(dt * 1e3, 2)
        results.append(row)
        print(json.dumps(row), flush=True)

    bf16 = next((r for r in results if r["variant"] == "bf16"), None)
    record = {
        "device": dev.device_kind, "platform": dev.platform,
        "preset": preset, "batch": batch, "iters": iters,
        "matching_impl": matching,
        "results": results,
    }
    if bf16:
        for r in results:
            r["scan_vs_bf16"] = round(
                r["scan_pairs_per_sec"] / bf16["scan_pairs_per_sec"], 3)
            r["dispatch_vs_bf16"] = round(
                r["dispatch_pairs_per_sec"] / bf16["dispatch_pairs_per_sec"],
                3)
    with open(args.out, "w") as f:
        json.dump(record, f, indent=1)
    print(f"wrote {args.out}", flush=True)


if __name__ == "__main__":
    main()
