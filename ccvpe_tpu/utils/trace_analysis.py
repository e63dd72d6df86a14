"""Offline analysis of ``jax.profiler`` device traces — roofline attribution.

The reference has no profiling story at all (SURVEY.md §5.1); XProf needs a
TensorBoard server, which production TPU hosts often lack.  This module parses
the perfetto ``*.trace.json.gz`` that ``jax.profiler.stop_trace`` writes next
to the xplane file and answers, headlessly:

* where device time goes, per HLO fusion / fusion family / output shape;
* which fusions run at the HBM roofline and which are compute- or
  lane-fill-bound (achieved GB/s per op, from the HLO operand/result shapes).

Used by ``benchmarks/trace_eval.py`` and usable against any trace captured via
``utils.profiling.trace`` (e.g. the Trainer's ``--profile_dir``).

The round-3 VIGOR eval-forward findings derived with this tool are recorded in
ARCHITECTURE.md ("where inference time goes").
"""

from __future__ import annotations

import collections
import glob
import gzip
import json
import os
import re
from dataclasses import dataclass, field

_DTYPE_BYTES = {"f32": 4, "s32": 4, "u32": 4, "bf16": 2, "f16": 2,
                "s16": 2, "u16": 2, "s8": 1, "u8": 1, "pred": 1, "f64": 8,
                "s64": 8, "u64": 8}

# an HLO instruction line: "[ROOT ]%name = <type> <op>(operands...), meta..."
# The op kind is matched generically (any identifier followed by "(") rather
# than by allowlist: entry parameters/constants MUST be indexed so that
# fusions reading model weights or batch inputs count those operand bytes in
# moved_bytes — an allowlist that omitted them undercounted achieved GB/s
# ~10x on encoder convs; ROOT lines carry the module output (the conv tail).
_INSTR = re.compile(r"(?:ROOT )?%?([\w.\-]+) = (.+?) ([\w\-]+)\((.*)")
_SHAPE = re.compile(r"(\w+)\[([\d,]*)\]")
_META_SRC = re.compile(r'source_file="([^"]+)" source_line=(\d+)')
_META_OP = re.compile(r'op_name="([^"]*)"')


def shape_bytes(type_str: str) -> int:
    """Total bytes of every array literal in an HLO type string (tuples sum)."""
    total = 0
    for dt, dims in _SHAPE.findall(type_str):
        if dt not in _DTYPE_BYTES:
            continue
        n = 1
        for d in dims.split(","):
            if d:
                n *= int(d)
        total += n * _DTYPE_BYTES[dt]
    return total


@dataclass
class HloIndex:
    """Instruction name -> (result type, operand names, source, op_name)."""

    types: dict = field(default_factory=dict)
    operands: dict = field(default_factory=dict)
    source: dict = field(default_factory=dict)

    @classmethod
    def from_text(cls, hlo_text: str) -> "HloIndex":
        idx = cls()
        for line in hlo_text.splitlines():
            m = _INSTR.match(line.strip())
            if not m:
                continue
            name, ty, _kind, rest = m.groups()
            args = rest.split(", kind=")[0].split(", metadata=")[0]
            idx.types[name] = ty.strip()
            idx.operands[name] = re.findall(r"%([\w.\-]+)", args)
            src = _META_SRC.search(line)
            op = _META_OP.search(line)
            idx.source[name] = (
                f"{os.path.basename(src.group(1))}:{src.group(2)}" if src
                else None,
                op.group(1).split("/")[-1] if op else None)
        return idx

    def moved_bytes(self, name: str) -> int | None:
        """Result + operand bytes — a lower bound on the fusion's HBM moves."""
        if name not in self.types:
            return None
        b = shape_bytes(self.types[name])
        for o in self.operands.get(name, ()):
            if o in self.types:
                b += shape_bytes(self.types[o])
        return b


def load_device_durations(logdir: str, exclude_prefix: str = "jit_",
                          ) -> tuple[collections.Counter, int]:
    """Sum device-op wall time (us) by HLO op name from the newest trace.

    A device pid carries several threads ("XLA Ops", "XLA Modules", "Steps",
    framework-op rows); only "XLA Ops" holds the per-instruction spans —
    summing the others would double-count the module/step envelopes.  When
    thread metadata is absent (minimal traces), falls back to skipping the
    outer ``jit_<fn>`` module span by name prefix.  Returns
    ``(durations, n_trace_files_considered)``.
    """
    # newest by mtime: lexicographic order lies when hostname/timestamp
    # directory layouts mix across captures
    paths = sorted(glob.glob(os.path.join(
        logdir, "**", "*.trace.json.gz"), recursive=True),
        key=os.path.getmtime)
    if not paths:
        raise FileNotFoundError(f"no *.trace.json.gz under {logdir}")
    with gzip.open(paths[-1], "rt") as f:
        trace = json.load(f)
    events = trace.get("traceEvents", [])
    pid_names = {e["pid"]: e.get("args", {}).get("name", "")
                 for e in events
                 if e.get("ph") == "M" and e.get("name") == "process_name"}
    tid_names = {(e["pid"], e["tid"]): e.get("args", {}).get("name", "")
                 for e in events
                 if e.get("ph") == "M" and e.get("name") == "thread_name"}
    device_pids = {p for p, n in pid_names.items()
                   if "TPU" in n or "XLA" in n or "/device:" in n}
    if device_pids:
        op_tids = {k for k, n in tid_names.items()
                   if k[0] in device_pids and n == "XLA Ops"}
    else:
        # pure-CPU backend (CI smoke): per-op spans run on host threads
        # named tf_XLAEigen/... — keep those, drop the runtime envelopes
        device_pids = set(pid_names)
        op_tids = {k for k, n in tid_names.items() if n.startswith("tf_XLA")}
    def _collect(tids) -> collections.Counter:
        durations: collections.Counter = collections.Counter()
        for e in events:
            if e.get("ph") != "X" or e.get("pid") not in device_pids:
                continue
            if tids and (e.get("pid"), e.get("tid")) not in tids:
                continue
            name = e.get("name", "?")
            if name.startswith(exclude_prefix) or "::" in name:
                continue
            durations[name] += e.get("dur", 0)
        return durations

    durations = _collect(op_tids)
    if not durations and op_tids:
        # XLA:CPU sometimes runs a small program inline on the calling
        # thread while the tf_XLA* pool threads (whose metadata persists
        # from an earlier dispatch) stay idle — the tid filter then drops
        # every op span.  Re-collect across all threads; the name filters
        # still drop the jit_<fn> module envelopes and runtime frames.
        durations = _collect(None)
    return durations, len(paths)


def family(name: str) -> str:
    """Fusion family: strip the trailing .N instance counter."""
    return re.sub(r"\.\d+$", "", name)


def summarize(durations: collections.Counter, iters: int = 1,
              hlo: HloIndex | None = None, top: int = 30) -> dict:
    """Build the full attribution report as a JSON-friendly dict."""
    total = sum(durations.values())
    by_family: collections.Counter = collections.Counter()
    by_shape: collections.Counter = collections.Counter()
    for n, d in durations.items():
        by_family[family(n)] += d
        if hlo is not None and n in hlo.types:
            by_shape[re.sub(r"\{[^}]*\}", "", hlo.types[n])] += d
    ops = []
    for n, d in durations.most_common(top):
        row = {"name": n, "us": d, "pct": round(100 * d / total, 2),
               "ms_per_iter": round(d / iters / 1e3, 3)}
        if hlo is not None:
            b = hlo.moved_bytes(n)
            if b:
                row["gb_per_s"] = round(b * iters / (d * 1e-6) / 1e9, 4)
            src, op = hlo.source.get(n, (None, None))
            if src:
                row["source"] = src
            if op:
                row["op"] = op
        ops.append(row)
    return {
        "device_ms_per_iter": round(total / iters / 1e3, 2),
        "distinct_ops": len(durations),
        "by_family": [
            {"family": f, "pct": round(100 * d / total, 2),
             "ms_per_iter": round(d / iters / 1e3, 2)}
            for f, d in by_family.most_common(top)],
        "by_shape": [
            {"shape": s, "pct": round(100 * d / total, 2),
             "ms_per_iter": round(d / iters / 1e3, 2)}
            for s, d in by_shape.most_common(top)],
        "top_ops": ops,
    }


def print_report(report: dict, top: int = 25) -> None:
    print(f"device: {report['device_ms_per_iter']} ms/iter, "
          f"{report['distinct_ops']} distinct ops")
    print("\n-- by fusion family --")
    for r in report["by_family"][:top]:
        print(f"{r['pct']:6.2f}%  {r['ms_per_iter']:8.2f} ms  {r['family']}")
    if report["by_shape"]:
        print("\n-- by output shape --")
        for r in report["by_shape"][:top]:
            print(f"{r['pct']:6.2f}%  {r['ms_per_iter']:8.2f} ms  "
                  f"{r['shape'][:80]}")
    print("\n-- top ops (achieved GB/s where HLO shapes are known) --")
    for r in report["top_ops"][:top]:
        gbs = f"{r['gb_per_s']:7.0f}" if "gb_per_s" in r else "      ?"
        src = r.get("source", "")
        print(f"{r['pct']:6.2f}%  {r['ms_per_iter']:8.3f} ms {gbs} GB/s  "
              f"{r['name'][:36]:36s} {src}")
