"""serve_bench client machinery (fast) + full HTTP-stack smoke (slow).

The benchmark itself (`benchmarks/serve_bench.py`) measures the deployed
serving stack end to end; these tests pin its load generator's accounting
(ok/503/error classification, latency capture) against a scripted local
HTTP server, and — in the slow tier — drive the real subprocess benchmark
on the CPU backend.
"""

import json
import os
import subprocess
import sys
import threading
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.join(REPO, "benchmarks"))

import serve_bench  # noqa: E402


class _ScriptedHandler(BaseHTTPRequestHandler):
    """Every 5th request -> 503; every 7th -> 400; otherwise a pose."""

    counter = 0
    lock = threading.Lock()

    def do_POST(self):
        self.rfile.read(int(self.headers.get("Content-Length", 0)))
        with _ScriptedHandler.lock:
            _ScriptedHandler.counter += 1
            n = _ScriptedHandler.counter
        if n % 5 == 0:
            code, body = 503, {"error": "overloaded"}
        elif n % 7 == 0:
            code, body = 400, {"error": "bad"}
        else:
            code, body = 200, {"row": 1, "col": 2,
                               "orientation_deg": 3.0, "probability": 0.5}
        data = json.dumps(body).encode()
        self.send_response(code)
        self.send_header("Content-Type", "application/json")
        self.send_header("Content-Length", str(len(data)))
        self.end_headers()
        self.wfile.write(data)

    def log_message(self, fmt, *args):
        pass


@pytest.fixture()
def scripted_server():
    _ScriptedHandler.counter = 0
    srv = ThreadingHTTPServer(("127.0.0.1", 0), _ScriptedHandler)
    thread = threading.Thread(target=srv.serve_forever, daemon=True)
    thread.start()
    yield f"http://127.0.0.1:{srv.server_address[1]}/predict"
    srv.shutdown()


def test_run_load_classifies_status_codes(scripted_server):
    payloads = [json.dumps({"grd": "x", "sat": "y"}).encode()]
    latencies, counts, window = serve_bench.run_load(
        scripted_server, payloads, clients=4, duration=1.5, timeout=10.0)
    total = counts["ok"] + counts["503"] + counts["err"]
    assert total > 0
    # latencies recorded only for successes
    assert len(latencies) == counts["ok"]
    # the script produces both rejection and error statuses at this volume
    if total >= 10:
        assert counts["503"] > 0
        assert counts["err"] > 0
    assert window >= 1.5
    assert all(lat >= 0 for lat in latencies)


def test_encode_payloads_distinct_and_decodable():
    payloads = serve_bench.encode_payloads((16, 32), (24, 24), 3)
    assert len({p for p in payloads}) == 3
    body = json.loads(payloads[0])
    assert set(body) == {"grd", "sat"}
    # round-trips through the server's own decoder at the right size
    from ccvpe_tpu import serve

    img = serve._decode_image(body["grd"])
    assert img.shape == (16, 32, 3)


def test_pct_bounds():
    vals = sorted([1.0, 2.0, 3.0, 4.0])
    assert serve_bench.pct(vals, 0.0) == 1.0
    assert serve_bench.pct(vals, 0.99) == 4.0
    assert serve_bench.pct([7.0], 0.5) == 7.0


@pytest.mark.slow
def test_full_stack_smoke(tmp_path):
    """The real benchmark against the real server (NANO, CPU backend):
    server subprocess, JPEG payloads, batcher, JSON artifact."""
    out = str(tmp_path / "SERVE_BENCH.json")
    env = dict(os.environ, CCVPE_PLATFORM="cpu")
    r = subprocess.run(
        [sys.executable, "benchmarks/serve_bench.py", "--preset", "NANO",
         "--batch", "2", "--clients", "2", "--duration", "2",
         "--startup_timeout", "600", "--out", out],
        cwd=REPO, env=env, capture_output=True, text=True, timeout=900)
    assert r.returncode == 0, r.stdout + r.stderr
    with open(out) as f:
        record = json.load(f)
    assert record["requests_ok"] > 0
    assert record["errors"] == 0
    assert record["pairs_per_sec"] > 0
    assert record["client_latency_ms"]["p50"] > 0
    assert record["server_metrics"]["requests"] >= record["requests_ok"]
