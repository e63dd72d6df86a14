#!/usr/bin/env python
"""End-to-end HTTP serving benchmark: through-the-stack pairs/s + latency.

Every other committed number (``bench.py``, ``QUANT_BENCH.json``) times the
*device program*; this one measures what a deployment actually delivers:
JSON + base64 + image decode + micro-batcher + jitted forward + response,
through the real ``ccvpe_tpu.serve`` server over HTTP.  The reference has
no serving surface at all (inference only via training scripts,
``/root/reference/train_VIGOR.py:244-338``), so this is a framework-quality
artifact, not a parity one.

Method: the server runs in its own OS process (own GIL — client timing is
not distorted by server-side work); N closed-loop client threads POST
pre-encoded JPEG pairs for a fixed window after a compile + saturation
warmup.  Reported: achieved requests/s, client-side p50/p95/p99 latency,
503/error counts, the server's own /metrics snapshot (server-side latency
percentiles, batch fill), and host CPU count — on a small host the stack is
host-bound (image decode), which is exactly what an operator needs to see
before sizing (docs/SERVING.md).

Usage:
  python benchmarks/serve_bench.py [--preset VIGOR] [--batch 64]
      [--clients 32] [--duration 20] [--quantize int8]
      [--out benchmarks/SERVE_BENCH.json]

Smoke (CI / no TPU): CCVPE_PLATFORM=cpu --preset NANO --duration 2.
"""

import argparse
import base64
import io
import json
import os
import socket
import subprocess
import sys
import threading
import time
import urllib.error
import urllib.request

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def free_port() -> int:
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


def get(url, timeout=10.0):
    with urllib.request.urlopen(url, timeout=timeout) as r:
        return json.loads(r.read())


def post(url, body: bytes, timeout: float):
    req = urllib.request.Request(
        url, data=body, headers={"Content-Type": "application/json"})
    with urllib.request.urlopen(req, timeout=timeout) as r:
        return r.status, json.loads(r.read())


def encode_payloads(grd_hw, sat_hw, n: int) -> list[bytes]:
    """n distinct request bodies (JPEG pairs at model size, seeded)."""
    from PIL import Image

    rng = np.random.default_rng(0)

    def jpg(hw):
        arr = rng.integers(0, 256, (*hw, 3), dtype=np.uint8)
        buf = io.BytesIO()
        Image.fromarray(arr).save(buf, format="JPEG", quality=90)
        return base64.b64encode(buf.getvalue()).decode()

    return [json.dumps({"grd": jpg(grd_hw), "sat": jpg(sat_hw)}).encode()
            for _ in range(n)]


def run_load(url: str, payloads: list[bytes], clients: int,
             duration: float, timeout: float):
    """Closed loop: `clients` threads POST until the deadline; returns
    (latencies_s, ok, rejected_503, errors, window_s)."""
    latencies: list[float] = []
    counts = {"ok": 0, "503": 0, "err": 0}
    lock = threading.Lock()
    start = time.monotonic()
    deadline = start + duration

    def worker(wid: int):
        i = wid
        while time.monotonic() < deadline:
            body = payloads[i % len(payloads)]
            i += clients
            t0 = time.monotonic()
            try:
                post(url, body, timeout)
                ok, rej, err = 1, 0, 0
            except urllib.error.HTTPError as e:
                ok, rej, err = 0, int(e.code == 503), int(e.code != 503)
                e.read()
            except Exception:
                ok, rej, err = 0, 0, 1
            dt = time.monotonic() - t0
            with lock:
                counts["ok"] += ok
                counts["503"] += rej
                counts["err"] += err
                if ok:
                    latencies.append(dt)

    threads = [threading.Thread(target=worker, args=(w,))
               for w in range(clients)]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    window = time.monotonic() - start
    return latencies, counts, window


def pct(sorted_vals, q):
    return sorted_vals[min(len(sorted_vals) - 1, int(len(sorted_vals) * q))]


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    ap.add_argument("--preset", default="VIGOR")
    ap.add_argument("--batch", type=int, default=64,
                    help="server micro-batch size (1 = no batcher)")
    ap.add_argument("--max_wait_ms", type=float, default=5.0)
    ap.add_argument("--clients", type=int, default=32,
                    help="closed-loop client threads")
    ap.add_argument("--duration", type=float, default=20.0,
                    help="timed window seconds (after warmup)")
    ap.add_argument("--quantize", default="", choices=["", "int8"])
    ap.add_argument("--payloads", type=int, default=8,
                    help="distinct pre-encoded image pairs cycled by clients")
    ap.add_argument("--compile_timeout", type=float, default=900.0,
                    help="first-request budget (pays the jit compile)")
    ap.add_argument("--startup_timeout", type=float, default=300.0,
                    help="budget for the server process to answer /healthz "
                         "(model init; generous for contended 1-core hosts)")
    ap.add_argument("--out", default="",
                    help="write the JSON record here (default: print only)")
    args = ap.parse_args(argv)

    port = free_port()
    cmd = [sys.executable, "-m", "ccvpe_tpu.serve", "--preset", args.preset,
           "--host", "127.0.0.1", "--port", str(port),
           "--batch", str(args.batch), "--max_wait_ms", str(args.max_wait_ms)]
    if args.quantize:
        cmd += ["--quantize", args.quantize]
    env = dict(os.environ)  # CCVPE_PLATFORM passes through to the server
    slog = open(f"/tmp/serve_bench_{port}.log", "w+b")
    proc = subprocess.Popen(cmd, cwd=REPO, env=env,
                            stdout=slog, stderr=subprocess.STDOUT)
    base = f"http://127.0.0.1:{port}"

    def server_tail() -> str:
        slog.flush()
        slog.seek(0)
        return slog.read()[-2000:].decode(errors="replace")

    try:
        deadline = time.monotonic() + args.startup_timeout
        info = None
        while time.monotonic() < deadline:
            if proc.poll() is not None:
                raise RuntimeError(f"server exited early: rc={proc.returncode}"
                                   f"\n--- server log tail ---\n{server_tail()}")
            try:
                info = get(base + "/healthz", timeout=2.0)
                break
            except Exception:
                time.sleep(0.5)
        if info is None:
            raise RuntimeError("server never became healthy within "
                               f"--startup_timeout={args.startup_timeout}s"
                               f"\n--- server log tail ---\n{server_tail()}")

        payloads = encode_payloads(info["grd_hw"], info["sat_hw"],
                                   args.payloads)
        url = base + "/predict"

        # warmup 1: first request pays the jit compile
        t0 = time.monotonic()
        post(url, payloads[0], args.compile_timeout)
        compile_s = time.monotonic() - t0
        # warmup 2: one concurrent round so the batcher path (padded full
        # batch) is compiled and threads/queues are hot before timing
        run_load(url, payloads, args.clients, min(5.0, args.duration),
                 args.compile_timeout)

        latencies, counts, window = run_load(
            url, payloads, args.clients, args.duration,
            timeout=max(60.0, args.duration))
        metrics = get(base + "/metrics")
    finally:
        proc.terminate()
        try:
            proc.wait(timeout=30)
        except subprocess.TimeoutExpired:  # e.g. wedged mid-compile
            proc.kill()
            proc.wait(timeout=30)
        slog.close()

    latencies.sort()
    record = {
        "preset": args.preset,
        "device": info.get("device", "?"),
        "host_cpus": os.cpu_count(),
        "batch": args.batch,
        "max_wait_ms": args.max_wait_ms,
        "clients": args.clients,
        "quantize": args.quantize or "bf16",
        "duration_s": round(window, 2),
        "first_request_s": round(compile_s, 2),
        "requests_ok": counts["ok"],
        "rejected_503": counts["503"],
        "errors": counts["err"],
        "pairs_per_sec": round(counts["ok"] / window, 2),
        "client_latency_ms": {
            "p50": round(pct(latencies, 0.50) * 1e3, 1),
            "p95": round(pct(latencies, 0.95) * 1e3, 1),
            "p99": round(pct(latencies, 0.99) * 1e3, 1),
        } if latencies else None,
        "server_metrics": metrics,
    }
    print(json.dumps(record), flush=True)
    if args.out:
        with open(args.out, "w") as f:
            json.dump(record, f, indent=1)
        print(f"wrote {args.out}", flush=True)
    return record


if __name__ == "__main__":
    main()
