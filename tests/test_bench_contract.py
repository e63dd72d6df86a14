"""bench.py driver contract: prints exactly one JSON line with the required
schema (metric/value/unit/vs_baseline) on any backend."""

import json
import os
import subprocess
import sys


def test_bench_json_contract():
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    env = dict(os.environ,
               CCVPE_BENCH_PRESET="NANO", CCVPE_BENCH_BATCH="2",
               CCVPE_BENCH_ITERS="2", CCVPE_BENCH_PLATFORM="cpu")
    out = subprocess.run([sys.executable, "bench.py"], cwd=repo, env=env,
                         capture_output=True, text=True, timeout=600)
    assert out.returncode == 0, out.stderr[-2000:]
    lines = [ln for ln in out.stdout.strip().splitlines()
             if ln.startswith("{")]
    assert len(lines) == 1, out.stdout
    rec = json.loads(lines[0])
    for key in ("metric", "value", "unit", "vs_baseline"):
        assert key in rec, rec
    assert rec["value"] > 0 and rec["vs_baseline"] > 0
    assert rec["unit"] == "pairs/sec/chip"
    # MFU accounting keys ride along when cost analysis is available
    if "flops_per_pair" in rec:
        assert rec["flops_per_pair"] > 0
