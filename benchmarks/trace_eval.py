#!/usr/bin/env python
"""Capture a device trace of the eval forward and print a roofline report.

Writes the trace under --logdir (XProf/TensorBoard compatible), dumps the
compiled HLO next to it, then runs ``utils.trace_analysis`` to attribute
device time per fusion family / output shape / op with achieved GB/s — all
headless (no TensorBoard server required).

Usage (real TPU):
    python benchmarks/trace_eval.py --batch 128 --top 30
    python benchmarks/trace_eval.py --analyze_only --logdir /tmp/eval_trace
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from ccvpe_tpu.utils import trace_analysis  # noqa: E402


def capture(logdir: str, batch: int, preset: str, iters: int) -> None:
    import jax
    import jax.numpy as jnp

    from ccvpe_tpu.models import cvm
    from ccvpe_tpu.utils import compilation_cache

    compilation_cache.enable()
    cfg = cvm.PRESETS[preset]
    params, state = cvm.init(jax.random.PRNGKey(0), cfg)

    @jax.jit
    def fwd(params, state, grd, sat):
        out, _ = cvm.forward(cfg, params, state,
                             grd.astype(jnp.bfloat16),
                             sat.astype(jnp.bfloat16), train=False)
        return out.heatmap, out.ori

    key = jax.random.PRNGKey(1)
    grd = jax.random.normal(key, (batch, *cfg.grd_hw, 3), jnp.float32)
    sat = jax.random.normal(key, (batch, *cfg.sat_hw, 3), jnp.float32)

    jax.block_until_ready(fwd(params, state, grd, sat))  # compile
    os.makedirs(logdir, exist_ok=True)
    with open(os.path.join(logdir, "module.hlo.txt"), "w") as f:
        f.write(jax.jit(fwd).lower(params, state, grd, sat)
                .compile().as_text())
    jax.profiler.start_trace(logdir)
    for _ in range(iters):
        hm, ori = fwd(params, state, grd, sat)
    jax.block_until_ready((hm, ori))
    jax.profiler.stop_trace()


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--logdir", default="/tmp/eval_trace")
    ap.add_argument("--batch", type=int, default=128)
    ap.add_argument("--preset", default="VIGOR")
    ap.add_argument("--iters", type=int, default=3)
    ap.add_argument("--top", type=int, default=30)
    ap.add_argument("--analyze_only", action="store_true")
    ap.add_argument("--json_out", default="",
                    help="also write the full report as JSON")
    args = ap.parse_args()
    if not args.analyze_only:
        capture(args.logdir, args.batch, args.preset, args.iters)
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
