#!/usr/bin/env python
"""Capture a device trace of the eval forward or train step + roofline report.

Writes the trace under --logdir (XProf/TensorBoard compatible), dumps the
compiled HLO next to it, then runs ``utils.trace_analysis`` to attribute
device time per fusion family / output shape / op with achieved GB/s — all
headless (no TensorBoard server required).  ``--memory`` additionally prints
XLA's memory analysis of the compiled program (the tool behind the "B=128 is
the HBM frontier" claim in ARCHITECTURE.md).

Usage (real TPU):
    python benchmarks/trace_eval.py --batch 128 --top 30 --memory
    python benchmarks/trace_eval.py --mode train --batch 32 --remat encoder
    python benchmarks/trace_eval.py --analyze_only --logdir /tmp/eval_trace
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from ccvpe_tpu.utils import trace_analysis  # noqa: E402


def _print_memory(compiled) -> None:
    try:
        ma = compiled.memory_analysis()
    except Exception as e:  # backend without the API
        print(f"memory analysis unavailable: {e}")
        return
    gib = 1 << 30
    print(f"memory: args {ma.argument_size_in_bytes / gib:.2f} GiB, "
          f"outputs {ma.output_size_in_bytes / gib:.2f} GiB, "
          f"temps {ma.temp_size_in_bytes / gib:.2f} GiB, "
          f"generated code {ma.generated_code_size_in_bytes / gib:.3f} GiB; "
          f"aliased {ma.alias_size_in_bytes / gib:.2f} GiB")


def _eval_fn(cfg, batch, quant: str = ""):
    import jax
    import jax.numpy as jnp

    from ccvpe_tpu.models import cvm

    params, state = cvm.init(jax.random.PRNGKey(0), cfg)

    def fwd(params, state, grd, sat):
        out, _ = cvm.forward(cfg, params, state,
                             grd.astype(jnp.bfloat16),
                             sat.astype(jnp.bfloat16), train=False)
        return out.heatmap, out.ori

    key = jax.random.PRNGKey(1)
    grd = jax.random.normal(key, (batch, *cfg.grd_hw, 3), jnp.float32)
    sat = jax.random.normal(key, (batch, *cfg.sat_hw, 3), jnp.float32)
    if quant == "int8":
        # same PTQ recipe as bench.py CCVPE_BENCH_QUANT=int8: calibrate on
        # the bench batch, per-channel int8 weights, static activation scales
        from ccvpe_tpu.nn import quant as quant_lib

        def calib_fwd(p, g, s):
            out, _ = cvm.forward(cfg, p, state, g.astype(jnp.bfloat16),
                                 s.astype(jnp.bfloat16), train=False)
            return out.logits_flattened

        ranges = quant_lib.calibrate(calib_fwd, params, [(grd, sat)])
        params = quant_lib.quantize_params(
            jax.device_get(params), ranges,
            select=quant_lib.resolve_select(
                os.environ.get("CCVPE_QUANT_SELECT", "all")))
    elif quant:
        raise SystemExit(f"unknown --quant {quant!r}")
    return jax.jit(fwd), (params, state, grd, sat), False


def _train_fn(cfg, batch, remat):
    import jax
    import jax.numpy as jnp
    import numpy as np

    from ccvpe_tpu.ops import gt as gt_ops
    from ccvpe_tpu.train import loop as train_loop

    opt = train_loop.make_optimizer()
    step = train_loop.make_train_step(cfg, opt, remat=remat,
                                      compute_dtype=jnp.bfloat16)
    state = train_loop.create_train_state(cfg, jax.random.PRNGKey(0), opt)
    rng = np.random.default_rng(0)
    h, w = cfg.sat_hw
    gt, weights, omap = gt_ops.synthesize_batch_factored(
        jnp.asarray(rng.uniform(-20, 20, batch), jnp.float32),
        jnp.asarray(rng.uniform(-20, 20, batch), jnp.float32),
        jnp.asarray(rng.uniform(0, 360, batch), jnp.float32),
        height=h, width=w, bins=cfg.bins)
    b = {"grd": jnp.asarray(rng.standard_normal((batch, *cfg.grd_hw, 3)),
                            jnp.float32),
         "sat": jnp.asarray(rng.standard_normal((batch, h, w, 3)),
                            jnp.float32),
         "gt": gt, "bin_weights": weights, "orientation": omap}
    # no donation: the traced loop reuses the same state across iterations
    return jax.jit(step), (state, b, jax.random.PRNGKey(1)), True


def capture(args) -> None:
    import jax

    from ccvpe_tpu.models import cvm
    from ccvpe_tpu.utils import compilation_cache, profiling

    if args.platform:
        # the environment's sitecustomize may override JAX_PLATFORMS itself,
        # so an env var is not enough to pin the backend (same as bench.py)
        jax.config.update("jax_platforms", args.platform)
    compilation_cache.enable()
    cfg = cvm.PRESETS[args.preset]
    if args.mode == "train":
        if args.quant:
            # quantized trees are inference-only (nn/quant.py); silently
            # ignoring --quant here would mislabel trace_meta.json
            raise SystemExit("--quant applies to --mode eval only "
                             "(the int8 path has no gradient)")
        fn, fargs, is_step = _train_fn(cfg, args.batch, args.remat)
    else:
        fn, fargs, is_step = _eval_fn(cfg, args.batch, args.quant)

    # AOT-compile once and call THAT executable for warmup and the traced
    # loop (a plain fn(*fargs) would re-enter the pjit cache and recompile),
    # so module.hlo.txt is exactly the program whose trace is analyzed.
    compiled = fn.lower(*fargs).compile()
    os.makedirs(args.logdir, exist_ok=True)
    with open(os.path.join(args.logdir, "module.hlo.txt"), "w") as f:
        f.write(compiled.as_text())
    with open(os.path.join(args.logdir, "trace_meta.json"), "w") as f:
        json.dump({"iters": args.iters, "mode": args.mode,
                   "batch": args.batch, "preset": args.preset,
                   "quant": args.quant}, f)
    if args.memory:
        _print_memory(compiled)

    jax.block_until_ready(compiled(*fargs))  # warmup
    with profiling.trace(args.logdir):
        out = None
        for _ in range(args.iters):
            out = compiled(*fargs)
            if is_step:
                out = out[1]  # drop the new TrainState, keep the loss parts
        jax.block_until_ready(out)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--logdir", default="/tmp/eval_trace")
    ap.add_argument("--mode", choices=["eval", "train"], default="eval")
    ap.add_argument("--batch", type=int, default=128)
    ap.add_argument("--preset", default="VIGOR")
    ap.add_argument("--remat", default=False,
                    help="train-mode remat scope (1/all/encoder/decoder)")
    ap.add_argument("--quant", default="",
                    help="eval-mode PTQ: 'int8' quantizes params first "
                         "(calibrated on the bench batch, as bench.py)")
    ap.add_argument("--iters", type=int, default=3)
    ap.add_argument("--top", type=int, default=30)
    ap.add_argument("--memory", action="store_true",
                    help="print XLA memory analysis of the compiled program")
    ap.add_argument("--platform", default="",
                    help="pin the jax backend (e.g. cpu for debug/CI)")
    ap.add_argument("--analyze_only", action="store_true")
    ap.add_argument("--json_out", default="",
                    help="also write the full report as JSON")
    args = ap.parse_args()
    if args.remat in ("0", "", False):
        args.remat = False
    elif args.remat == "1":
        args.remat = True
    if not args.analyze_only:
        capture(args)
    # per-iter numbers must use the capture-time iteration count, not this
    # invocation's flag — read it back from the sidecar when available
    meta_path = os.path.join(args.logdir, "trace_meta.json")
    if os.path.exists(meta_path):
        with open(meta_path) as f:
            args.iters = json.load(f)["iters"]
    elif args.analyze_only:
        print(f"warning: no trace_meta.json under {args.logdir}; "
              f"normalizing by --iters {args.iters}")
    durations, _ = trace_analysis.load_device_durations(args.logdir)
    hlo_path = os.path.join(args.logdir, "module.hlo.txt")
    hlo = None
    if os.path.exists(hlo_path):
        hlo = trace_analysis.HloIndex.from_text(open(hlo_path).read())
    report = trace_analysis.summarize(durations, iters=args.iters, hlo=hlo,
                                      top=args.top)
    trace_analysis.print_report(report, top=args.top)
    if args.json_out:
        with open(args.json_out, "w") as f:
            json.dump(report, f, indent=1)


if __name__ == "__main__":
    main()
