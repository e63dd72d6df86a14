"""io/pretrained.py: URL-map resolution, atomic cached download, sha256
verification — the framework-side equivalent of the reference's
``from_pretrained`` auto-download (``efficientnet_pytorch/utils.py:701-762``),
exercised fully offline against a local HTTP server."""

import functools
import hashlib
import http.server
import os
import threading

import pytest

from ccvpe_tpu.io import pretrained


class _CountingHandler(http.server.SimpleHTTPRequestHandler):
    requests = []

    def log_message(self, *a):  # silence
        pass

    def do_GET(self):
        type(self).requests.append(self.path)
        super().do_GET()


@pytest.fixture()
def weight_server(tmp_path, monkeypatch):
    """Serve ``tmp_path/srv`` over HTTP; cache in ``tmp_path/cache``.

    Returns (srv_dir, publish) where ``publish(content)`` writes the bytes
    under their true-hash release name and patches URL_MAP['efficientnet-b0']
    to it.
    """
    srv = tmp_path / "srv"
    srv.mkdir()
    handler = type("H", (_CountingHandler,), {"requests": []})
    httpd = http.server.ThreadingHTTPServer(
        ("127.0.0.1", 0),
        functools.partial(handler, directory=str(srv)))
    t = threading.Thread(target=httpd.serve_forever, daemon=True)
    t.start()
    base = f"http://127.0.0.1:{httpd.server_address[1]}/"
    monkeypatch.setenv("CCVPE_PRETRAINED_URL_BASE", base)
    monkeypatch.setenv("CCVPE_PRETRAINED_CACHE", str(tmp_path / "cache"))

    def publish(content: bytes, name: str | None = None) -> str:
        if name is None:
            prefix = hashlib.sha256(content).hexdigest()[:8]
            name = f"efficientnet-b0-{prefix}.pth"
        (srv / name).write_bytes(content)
        monkeypatch.setitem(pretrained.URL_MAP, "efficientnet-b0", name)
        return name

    yield srv, publish, handler
    httpd.shutdown()
    httpd.server_close()


def test_local_path_passthrough(tmp_path):
    p = tmp_path / "weights.pth"
    p.write_bytes(b"x")
    assert pretrained.resolve(str(p)) == str(p)


def test_missing_local_path_raises(tmp_path):
    with pytest.raises(FileNotFoundError):
        pretrained.resolve(str(tmp_path / "nope.pth"))


def test_unknown_spec_raises():
    with pytest.raises(KeyError):
        pretrained.resolve("resnet-50")


def test_canonical_names():
    for spec in ("auto", "b0", "B0", "efficientnet-b0", "EFFICIENTNET-B0"):
        assert pretrained._canonical_name(spec) == "efficientnet-b0"
    assert pretrained._canonical_name("b7") == "efficientnet-b7"


def test_url_maps_match_reference():
    """Every reference url_map entry is present with the same release file
    (reference efficientnet_pytorch/utils.py:701-726)."""
    assert len(pretrained.URL_MAP) == 8
    assert len(pretrained.URL_MAP_ADVPROP) == 9
    assert pretrained.URL_MAP["efficientnet-b0"] == \
        "efficientnet-b0-355c32eb.pth"
    assert pretrained.URL_MAP_ADVPROP["efficientnet-b8"] == \
        "adv-efficientnet-b8-22a8fe65.pth"
    for name, fn in list(pretrained.URL_MAP.items()) + \
            list(pretrained.URL_MAP_ADVPROP.items()):
        assert pretrained._expected_prefix(fn), (name, fn)


def test_download_caches_and_verifies(weight_server):
    srv, publish, handler = weight_server
    content = b"fake-b0-state-dict" * 100
    publish(content)

    path = pretrained.resolve("auto", progress=False)
    assert open(path, "rb").read() == content
    assert len(handler.requests) == 1
    # second resolve: cache hit, no HTTP traffic
    assert pretrained.resolve("b0", progress=False) == path
    assert len(handler.requests) == 1
    # no torn .part files left behind
    assert not [f for f in os.listdir(os.path.dirname(path)) if ".part" in f]


def test_corrupt_cache_detected(weight_server):
    srv, publish, handler = weight_server
    publish(b"good-content")
    path = pretrained.resolve("auto", progress=False)
    with open(path, "wb") as f:
        f.write(b"bit-rotted")
    with pytest.raises(IOError, match="corrupt"):
        pretrained.resolve("auto", progress=False)


def test_corrupt_download_rejected(weight_server, monkeypatch):
    srv, publish, handler = weight_server
    # serve wrong bytes under a hash-named file the content doesn't match
    publish(b"tampered", name="efficientnet-b0-355c32eb.pth")
    with pytest.raises(IOError, match="corrupt"):
        pretrained.resolve("auto", progress=False)


def test_download_retries_then_fails(tmp_path, monkeypatch):
    monkeypatch.setenv("CCVPE_PRETRAINED_URL_BASE",
                       "http://127.0.0.1:1/")  # nothing listens
    monkeypatch.setenv("CCVPE_PRETRAINED_CACHE", str(tmp_path / "cache"))
    monkeypatch.setattr(pretrained.time, "sleep", lambda s: None)
    with pytest.raises(IOError, match="failed to download"):
        pretrained.resolve("auto", progress=False)


def test_advprop_map(weight_server, monkeypatch):
    srv, publish, handler = weight_server
    content = b"advprop-weights"
    prefix = hashlib.sha256(content).hexdigest()[:8]
    name = f"adv-efficientnet-b0-{prefix}.pth"
    (srv / name).write_bytes(content)
    monkeypatch.setitem(pretrained.URL_MAP_ADVPROP, "efficientnet-b0", name)
    path = pretrained.resolve("auto", advprop=True, progress=False)
    assert open(path, "rb").read() == content


@pytest.mark.slow
def test_create_train_state_auto(weight_server, torch_oracle, tmp_path):
    """Full path: ``create_train_state(pretrained_b0='auto')`` downloads the
    release file through the cache and seeds both encoders (the reference's
    no-weights_path ``from_pretrained`` branch, utils.py:744-748)."""
    torch = torch_oracle
    import efficientnet_pytorch.model as enm
    import jax
    import numpy as np

    b0 = enm.EfficientNet.from_name("efficientnet-b0", False)
    buf = tmp_path / "real_b0.pth"
    torch.save(b0.state_dict(), str(buf))
    srv, publish, handler = weight_server
    publish(buf.read_bytes())

    from ccvpe_tpu.models import cvm
    from ccvpe_tpu.train import loop as train_loop

    opt = train_loop.make_optimizer()
    state = train_loop.create_train_state(
        cvm.TINY, jax.random.PRNGKey(0), opt, pretrained_b0="auto")
    stem = b0.state_dict()["_conv_stem.weight"].numpy().transpose(2, 3, 1, 0)
    for enc in ("grd_efficientnet", "sat_efficientnet"):
        np.testing.assert_array_equal(
            np.asarray(state.params[enc]["conv_stem"]["w"]), stem)
    assert len(handler.requests) == 1
