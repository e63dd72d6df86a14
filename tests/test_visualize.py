"""Generic visualizer (python -m ccvpe_tpu.visualize) renders all three
datasets on synthetic roots with the NANO preset."""

import os

import numpy as np
import pytest
from PIL import Image

matplotlib = pytest.importorskip("matplotlib")


def _wimg(path, hw, seed):
    os.makedirs(os.path.dirname(path), exist_ok=True)
    Image.fromarray(np.random.default_rng(seed).integers(
        0, 255, (*hw, 3), dtype=np.uint8)).save(path)


def test_visualize_kitti(tmp_path):
    from ccvpe_tpu import visualize

    root = str(tmp_path / "kitti")
    drive = "2011_09_26/2011_09_26_drive_0001_sync/"
    name = drive + "0000000000.png"
    _wimg(os.path.join(root, "satmap", name), (512, 512), 1)
    _wimg(os.path.join(root, "raw_data", drive, "image_02/data",
                       "0000000000.png"), (375, 1242), 2)
    ox = os.path.join(root, "raw_data", drive, "oxts/data", "0000000000.txt")
    os.makedirs(os.path.dirname(ox), exist_ok=True)
    with open(ox, "w") as f:
        f.write("49.01 8.43 112.99 0.01 0.01 0.3 " + "0.0 " * 24 + "\n")
    with open(os.path.join(root, "test1_files.txt"), "w") as f:
        f.write(f"{name} 0.31 -0.62 0.47\n")

    out = str(tmp_path / "kitti.png")
    args = visualize.parse_args([
        "--dataset", "KITTI", "--dataset_root", root,
        "--model_preset", "NANO", "--test_model_path", "", "--out", out])
    visualize.run("KITTI", args)
    assert os.path.exists(out) and os.path.getsize(out) > 0


def test_visualize_oxford(tmp_path):
    from ccvpe_tpu import visualize

    root = str(tmp_path / "oxford") + "/"
    _wimg(os.path.join(root, "map.png"), (2048, 2048), 5)
    _wimg(os.path.join(root, "f0.png"), (160, 240), 0)
    for j in range(3):
        with open(root + f"test{j+1}_j.txt", "w") as f:
            f.write("f0.png 0 619500.0 5735900.0\n" if j == 0 else "")
    np.save(root + "test_yaw.npy", np.asarray([0.3]))

    out = str(tmp_path / "oxford.png")
    args = visualize.parse_args([
        "--dataset", "OxfordRobotCar", "--dataset_root", root,
        "--sat_path", root + "map.png",
        "--model_preset", "NANO", "--test_model_path", "", "--out", out])
    visualize.run("OxfordRobotCar", args)
    assert os.path.exists(out) and os.path.getsize(out) > 0
