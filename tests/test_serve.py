"""HTTP serving endpoint: healthz + predict round-trip on an ephemeral port
(NANO preset; exercises JSON/base64 decode, the FoV/ori_noise plumbing, and
error paths)."""

import base64
import io
import json
import threading
import urllib.request

import numpy as np
import pytest
from PIL import Image

from ccvpe_tpu import api, serve
from ccvpe_tpu.models import cvm


@pytest.fixture(scope="module")
def server():
    import jax

    model = api.CVMModel(cvm.NANO, *cvm.init(jax.random.PRNGKey(0), cvm.NANO))
    service = serve.PoseService(model, "NANO")
    srv = serve.build_server(service, host="127.0.0.1", port=0)
    thread = threading.Thread(target=srv.serve_forever, daemon=True)
    thread.start()
    yield f"http://127.0.0.1:{srv.server_address[1]}", model
    srv.shutdown()


def _b64_png(arr) -> str:
    buf = io.BytesIO()
    Image.fromarray(arr).save(buf, format="PNG")
    return base64.b64encode(buf.getvalue()).decode()


def _post(url, payload):
    req = urllib.request.Request(
        url + "/predict", data=json.dumps(payload).encode(),
        headers={"Content-Type": "application/json"})
    try:
        with urllib.request.urlopen(req) as r:
            return r.status, json.loads(r.read())
    except urllib.error.HTTPError as e:
        return e.code, json.loads(e.read())


def test_healthz(server):
    url, model = server
    with urllib.request.urlopen(url + "/healthz") as r:
        info = json.loads(r.read())
    assert info["status"] == "ok"
    assert info["preset"] == "NANO"
    assert info["grd_hw"] == list(model.cfg.grd_hw)


def test_predict_matches_direct_api(server):
    url, model = server
    rng = np.random.default_rng(0)
    grd = rng.integers(0, 255, (*model.cfg.grd_hw, 3), dtype=np.uint8)
    sat = rng.integers(0, 255, (*model.cfg.sat_hw, 3), dtype=np.uint8)
    code, got = _post(url, {"grd": _b64_png(grd), "sat": _b64_png(sat),
                            "return_heatmap": True})
    assert code == 200
    want = model.predict(grd, sat, return_heatmap=True)
    assert (got["row"], got["col"]) == (want.row, want.col)
    np.testing.assert_allclose(got["probability"], want.probability,
                               rtol=1e-6)
    np.testing.assert_allclose(np.asarray(got["heatmap"]), want.heatmap,
                               rtol=0, atol=1e-7)


def test_predict_fov_and_prior(server):
    url, model = server
    rng = np.random.default_rng(1)
    grd = rng.integers(0, 255, (*model.cfg.grd_hw, 3), dtype=np.uint8)
    sat = rng.integers(0, 255, (*model.cfg.sat_hw, 3), dtype=np.uint8)
    code, got = _post(url, {"grd": _b64_png(grd), "sat": _b64_png(sat),
                            "fov": 180.0, "ori_noise": 18.0})
    assert code == 200
    want = model.predict(grd, sat, fov=180.0, ori_noise=18.0)
    assert (got["row"], got["col"]) == (want.row, want.col)


def test_predict_errors(server):
    url, _ = server
    code, got = _post(url, {"grd": "not-base64!!"})
    assert code in (400, 500)
    assert "error" in got
    with urllib.request.urlopen(url + "/healthz") as r:
        assert r.status == 200  # server survived the bad request


def test_micro_batcher_concurrent_requests():
    """PoseService(batch=4) coalesces concurrent requests into one padded
    device batch and each caller gets the same pose as the direct API."""
    import concurrent.futures

    import jax

    model = api.CVMModel(cvm.NANO, *cvm.init(jax.random.PRNGKey(2), cvm.NANO))
    service = serve.PoseService(model, "NANO", batch=4, max_wait_ms=50.0)
    rng = np.random.default_rng(3)
    pairs = [(rng.integers(0, 255, (*cvm.NANO.grd_hw, 3), dtype=np.uint8),
              rng.integers(0, 255, (*cvm.NANO.sat_hw, 3), dtype=np.uint8))
             for _ in range(6)]

    def call(i):
        grd, sat = pairs[i]
        return service.predict({"grd": _b64_png(grd), "sat": _b64_png(sat)})

    with concurrent.futures.ThreadPoolExecutor(6) as pool:
        got = list(pool.map(call, range(6)))

    for (grd, sat), g in zip(pairs, got):
        want = model.predict(grd, sat)
        assert (g["row"], g["col"]) == (want.row, want.col), (g, want)
        np.testing.assert_allclose(g["probability"], want.probability,
                                   rtol=1e-5)
    service.batcher.stop()


def test_micro_batcher_mixed_parameters_batch_per_key():
    """Requests overriding ori_noise/fov batch among themselves (one
    micro-batcher per parameter key) instead of collapsing to the
    single-pair path: under concurrent mixed load each off-default key
    still serves >1 requests per device dispatch (VERDICT r2 item 5)."""
    import concurrent.futures

    import jax

    model = api.CVMModel(cvm.NANO, *cvm.init(jax.random.PRNGKey(4), cvm.NANO))
    service = serve.PoseService(model, "NANO", batch=4, max_wait_ms=500.0)
    rng = np.random.default_rng(5)
    pairs = [(rng.integers(0, 255, (*cvm.NANO.grd_hw, 3), dtype=np.uint8),
              rng.integers(0, 255, (*cvm.NANO.sat_hw, 3), dtype=np.uint8))
             for _ in range(8)]

    def call(i):
        grd, sat = pairs[i]
        noise = 18.0 if i % 2 else 180.0  # interleave default / override
        return service.predict({"grd": _b64_png(grd), "sat": _b64_png(sat),
                                "ori_noise": noise})

    # warm both compiled shapes so the timed window isn't one compile long
    call(0), call(1)
    with concurrent.futures.ThreadPoolExecutor(8) as pool:
        got = list(pool.map(call, range(8)))

    for i, g in enumerate(got):
        grd, sat = pairs[i]
        want = model.predict(grd, sat, ori_noise=18.0 if i % 2 else 180.0)
        assert (g["row"], g["col"]) == (want.row, want.col), (i, g, want)

    override = service.batchers[(18.0, 360.0)]
    assert override.items_served > override.dispatches, (
        f"off-default key never coalesced: {override.items_served} items "
        f"in {override.dispatches} dispatches")
    service.stop()


def test_non_finite_parameters_rejected():
    """NaN ori_noise/fov must be rejected, not become a batcher key
    (NaN != NaN would spawn a fresh worker+compile per request)."""
    import jax
    import pytest

    model = api.CVMModel(cvm.NANO, *cvm.init(jax.random.PRNGKey(8), cvm.NANO))
    service = serve.PoseService(model, "NANO", batch=2, max_wait_ms=5.0)
    rng = np.random.default_rng(8)
    grd = rng.integers(0, 255, (*cvm.NANO.grd_hw, 3), dtype=np.uint8)
    sat = rng.integers(0, 255, (*cvm.NANO.sat_hw, 3), dtype=np.uint8)
    with pytest.raises(ValueError, match="finite"):
        service.predict({"grd": _b64_png(grd), "sat": _b64_png(sat),
                         "ori_noise": float("nan")})
    assert list(service.batchers) == [(180.0, 360.0)]
    service.stop()


def test_micro_batcher_key_cap_falls_back():
    """Beyond max_batcher_keys distinct parameter keys, requests use the
    single-pair path instead of spawning unbounded workers/compiles."""
    import jax

    model = api.CVMModel(cvm.NANO, *cvm.init(jax.random.PRNGKey(6), cvm.NANO))
    service = serve.PoseService(model, "NANO", batch=4, max_wait_ms=5.0,
                                max_batcher_keys=1)  # default key only
    rng = np.random.default_rng(7)
    grd = rng.integers(0, 255, (*cvm.NANO.grd_hw, 3), dtype=np.uint8)
    sat = rng.integers(0, 255, (*cvm.NANO.sat_hw, 3), dtype=np.uint8)
    got = service.predict({"grd": _b64_png(grd), "sat": _b64_png(sat),
                           "ori_noise": 18.0})
    want = model.predict(grd, sat, ori_noise=18.0)
    assert (got["row"], got["col"]) == (want.row, want.col)
    assert list(service.batchers) == [(180.0, 360.0)]
    service.stop()


def test_metrics_endpoint(server):
    """/metrics reports request counts and latency percentiles."""
    url, model = server
    rng = np.random.default_rng(9)
    grd = rng.integers(0, 255, (*model.cfg.grd_hw, 3), dtype=np.uint8)
    sat = rng.integers(0, 255, (*model.cfg.sat_hw, 3), dtype=np.uint8)
    _post(url, {"grd": _b64_png(grd), "sat": _b64_png(sat)})
    _post(url, {"grd": "broken"})  # counted as an error
    with urllib.request.urlopen(url + "/metrics") as r:
        m = json.loads(r.read())
    assert m["requests"] >= 1
    assert m["errors"] >= 1
    assert m["latency_ms"]["p50"] > 0
    assert m["latency_ms"]["p95"] >= m["latency_ms"]["p50"]


def test_micro_batcher_stop_mid_drain():
    """stop() while the worker is draining a partial batch must not kill the
    worker before pending requests complete (review regression: the None
    sentinel used to be consumed as a request item)."""
    import threading
    import time

    import jax

    model = api.CVMModel(cvm.NANO, *cvm.init(jax.random.PRNGKey(5), cvm.NANO))
    batcher = serve.MicroBatcher(model, batch=4, max_wait_ms=2000.0)
    rng = np.random.default_rng(6)
    grd = rng.integers(0, 255, (*cvm.NANO.grd_hw, 3), dtype=np.uint8)
    sat = rng.integers(0, 255, (*cvm.NANO.sat_hw, 3), dtype=np.uint8)

    results = []
    t = threading.Thread(
        target=lambda: results.append(batcher.submit(grd, sat, False)))
    t.start()
    time.sleep(0.3)   # the worker is now mid-drain, waiting for more items
    batcher.stop()    # sentinel lands inside the drain loop
    t.join(timeout=120)
    assert not t.is_alive(), "pending request hung after stop()"
    assert results and 0 <= results[0].row < cvm.NANO.sat_hw[0]
