"""Native C++ loader: build, decode parity vs PIL, Pillow-exact resize."""

import os

import numpy as np
import pytest
from PIL import Image

from ccvpe_tpu.data import native_loader


pytestmark = pytest.mark.skipif(
    not native_loader.available(),
    reason=f"native loader unavailable: {native_loader.build_error()}")


@pytest.fixture(scope="module")
def images(tmp_path_factory):
    d = tmp_path_factory.mktemp("imgs")
    rng = np.random.default_rng(0)
    paths = {}
    arr = rng.integers(0, 255, (123, 217, 3), dtype=np.uint8)
    Image.fromarray(arr).save(d / "a.png")
    paths["png"] = (str(d / "a.png"), arr)
    arr2 = rng.integers(0, 255, (64, 96, 3), dtype=np.uint8)
    Image.fromarray(arr2).save(d / "b.jpg", quality=95)
    paths["jpg"] = (str(d / "b.jpg"),
                    np.asarray(Image.open(d / "b.jpg").convert("RGB")))
    return paths


def test_resize_matches_pil_exactly():
    rng = np.random.default_rng(1)
    for in_hw, out_hw in [((640, 640), (512, 512)),   # VIGOR satellite
                          ((1024, 2048), (320, 640)),  # VIGOR panorama
                          ((375, 1242), (256, 1024)),  # KITTI ground
                          ((800, 800), (512, 512)),    # Oxford crop
                          ((100, 50), (154, 231))]:    # upscale
        img = rng.integers(0, 255, (*in_hw, 3), dtype=np.uint8)
        want = np.asarray(Image.fromarray(img).resize(
            (out_hw[1], out_hw[0]), Image.BILINEAR))
        got = native_loader.resize_bilinear(img, out_hw)
        np.testing.assert_array_equal(got, want)


def test_png_decode_exact(images):
    path, arr = images["png"]
    out, status = native_loader.load_batch([path], arr.shape[:2])
    assert status[0] == 0
    np.testing.assert_array_equal(out[0], arr)


def test_jpeg_decode_close(images):
    # libjpeg and PIL may differ by tiny IDCT rounding; require closeness
    path, arr = images["jpg"]
    out, status = native_loader.load_batch([path], arr.shape[:2])
    assert status[0] == 0
    assert np.mean(np.abs(out[0].astype(int) - arr.astype(int))) < 1.0


def test_batch_and_failure_status(images):
    path, arr = images["png"]
    out, statuses = native_loader.load_batch(
        [path, "/nonexistent/file.png", path], (64, 64), n_threads=3)
    assert statuses[0] == 0 and statuses[2] == 0
    assert statuses[1] != 0
    want = np.asarray(Image.fromarray(arr).resize((64, 64), Image.BILINEAR))
    np.testing.assert_array_equal(out[0], want)
    np.testing.assert_array_equal(out[2], want)
