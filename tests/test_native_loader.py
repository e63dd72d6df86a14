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


@pytest.fixture(scope="module")
def mini_vigor_root(tmp_path_factory):
    """One-city synthetic VIGOR root (PNG so decode is bit-exact vs PIL)."""
    root = str(tmp_path_factory.mktemp("vigor_native"))
    rng = np.random.default_rng(7)
    for other in ["Seattle", "SanFrancisco", "Chicago"]:
        os.makedirs(os.path.join(root, "splits_new", other), exist_ok=True)
        for base in ["satellite_list.txt", "same_area_balanced_train.txt"]:
            open(os.path.join(root, "splits_new", other, base), "w").close()
    city = "NewYork"
    sats = [f"sat_{i}.png" for i in range(3)]
    os.makedirs(os.path.join(root, "splits_new", city), exist_ok=True)
    with open(os.path.join(root, "splits_new", city,
                           "satellite_list.txt"), "w") as f:
        f.write("\n".join(sats) + "\n")
    for i, s in enumerate(sats):
        arr = rng.integers(0, 255, (100, 100, 3), dtype=np.uint8)
        os.makedirs(os.path.join(root, city, "satellite"), exist_ok=True)
        Image.fromarray(arr).save(os.path.join(root, city, "satellite", s))
    lines = []
    for j in range(6):
        pano = f"pano_{j}.png"
        os.makedirs(os.path.join(root, city, "panorama"), exist_ok=True)
        arr = rng.integers(0, 255, (50, 100, 3), dtype=np.uint8)
        Image.fromarray(arr).save(os.path.join(root, city, "panorama", pano))
        fields = [pano]
        for k in range(4):
            fields += [sats[(j + k) % 3], str(rng.uniform(-20, 20)),
                       str(rng.uniform(-20, 20))]
        lines.append(" ".join(fields))
    with open(os.path.join(root, "splits_new", city,
                           "same_area_balanced_train.txt"), "w") as f:
        f.write("\n".join(lines) + "\n")
    return root


def test_loader_native_batch_matches_python_path(mini_vigor_root):
    """pipeline.Loader(native_batch=True) decodes whole batches in C++ via
    the sampler plan/assemble protocol and produces bit-identical batches to
    the per-sample PIL path (VERDICT r1 item 7)."""
    from ccvpe_tpu.data import pipeline, vigor

    idx = vigor.VigorIndex.load(mini_vigor_root, "samearea", train=True)
    frozen = np.linspace(0, 359, len(idx))  # no RNG -> thread-order-proof

    def build(native):
        sampler = vigor.VigorSampler(idx, random_orientation=frozen,
                                     grd_hw=(32, 64), sat_hw=(64, 64))
        return pipeline.Loader(sampler, np.arange(len(idx)), batch_size=3,
                               num_workers=2, native_batch=native)

    ref_loader, nat_loader = build(False), build(True)
    assert nat_loader.native_batch and not ref_loader.native_batch
    for ref, nat in zip(ref_loader, nat_loader):
        assert set(ref) == set(nat)
        for key in ref:
            np.testing.assert_array_equal(ref[key], nat[key]), key


def test_loader_native_batch_unreadable_fallback(mini_vigor_root, tmp_path):
    """Unreadable panoramas get the blank-image fallback through the native
    batch path too (reference datasets.py:100-105)."""
    from ccvpe_tpu.data import pipeline, vigor

    idx = vigor.VigorIndex.load(mini_vigor_root, "samearea", train=True)
    bad = str(tmp_path / "missing.png")
    idx.grd_paths[1] = bad
    frozen = np.zeros(len(idx))
    sampler = vigor.VigorSampler(idx, random_orientation=frozen,
                                 grd_hw=(32, 64), sat_hw=(64, 64))
    loader = pipeline.Loader(sampler, np.arange(3), batch_size=3,
                             num_workers=2, native_batch=True)
    (batch,) = list(loader)
    assert batch["grd"][1].max() == 0
    assert batch["grd"][0].max() > 0


def test_loader_native_batch_kitti_and_oxford(tmp_path):
    """KITTI/Oxford samplers also speak the plan/assemble protocol: the
    native-batch loader reproduces the Python path bit-for-bit (test/eval
    splits are RNG-free, so both paths are deterministic)."""
    from ccvpe_tpu.data import kitti, oxford, pipeline

    def wimg(path, hw, seed):
        os.makedirs(os.path.dirname(path), exist_ok=True)
        Image.fromarray(np.random.default_rng(seed).integers(
            0, 255, (*hw, 3), dtype=np.uint8)).save(path)

    # -- KITTI (test split: shifts from file columns) --
    kroot = str(tmp_path / "kitti")
    drive = "2011_09_26/2011_09_26_drive_0001_sync/"
    names = [drive + f"000000000{i}.png" for i in range(2)]
    for i, name in enumerate(names):
        wimg(os.path.join(kroot, "satmap", name), (512, 512), i)
        img_no = name[38:]
        wimg(os.path.join(kroot, "raw_data", drive, "image_02/data", img_no),
             (375, 1242), 10 + i)
        ox = os.path.join(kroot, "raw_data", drive, "oxts/data",
                          img_no.replace(".png", ".txt"))
        os.makedirs(os.path.dirname(ox), exist_ok=True)
        with open(ox, "w") as f:
            f.write("49.01 8.43 112.99 0.01 0.01 0.3 " + "0.0 " * 24 + "\n")
    with open(os.path.join(kroot, "test_files.txt"), "w") as f:
        f.write("".join(f"{n} 0.31 -0.62 0.47\n" for n in names))

    index = kitti.KittiIndex.load(
        kroot, os.path.join(kroot, "test_files.txt"), test=True)
    for device_augment in (False, True):
        def build(native):
            sampler = kitti.KittiSampler(index, rotation_range=10,
                                         device_augment=device_augment)
            return pipeline.Loader(sampler, np.arange(2), batch_size=2,
                                   num_workers=2, native_batch=native)

        (ref,), (nat,) = list(build(False)), list(build(True))
        for key in ref:
            np.testing.assert_array_equal(ref[key], nat[key])

    # -- Oxford (eval split: deterministic grid crop) --
    oroot = str(tmp_path / "oxford") + "/"
    wimg(os.path.join(oroot, "map.png"), (2048, 2048), 5)
    for i in range(3):
        wimg(os.path.join(oroot, f"f{i}.png"), (160, 240), i)
    files = [f"f{i}.png 0 619500.0 5735900.0" for i in range(3)]
    for j in range(3):
        with open(oroot + f"test{j+1}_j.txt", "w") as f:
            f.write(files[j] + "\n")
    np.save(oroot + "test_yaw.npy", np.asarray([0.3, 1.0, 4.0]))

    oidx = oxford.OxfordIndex.load(oroot, oroot + "map.png", "test")

    def obuild(native):
        sampler = oxford.OxfordSampler(oidx)
        return pipeline.Loader(sampler, np.arange(3), batch_size=3,
                               num_workers=2, native_batch=native)

    (ref,), (nat,) = list(obuild(False)), list(obuild(True))
    assert obuild(True).native_batch
    for key in ref:
        np.testing.assert_array_equal(ref[key], nat[key])
