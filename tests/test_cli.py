"""End-to-end CLI smoke tests: train a couple of steps + eval on synthetic
VIGOR data with the NANO preset through the real entry point."""

import os
import sys

import numpy as np
import pytest
from PIL import Image

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


@pytest.fixture(scope="module")
def synthetic_vigor(tmp_path_factory):
    root = str(tmp_path_factory.mktemp("vigor_cli"))
    rng = np.random.default_rng(0)

    def wimg(path, hw, seed):
        os.makedirs(os.path.dirname(path), exist_ok=True)
        Image.fromarray(np.random.default_rng(seed).integers(
            0, 255, (*hw, 3), dtype=np.uint8)).save(path)

    for city in ["NewYork", "Seattle", "SanFrancisco", "Chicago"]:
        sats = [f"s{i}.png" for i in range(3)]
        os.makedirs(os.path.join(root, "splits_new", city), exist_ok=True)
        with open(os.path.join(root, "splits_new", city,
                               "satellite_list.txt"), "w") as f:
            f.write("\n".join(sats) + "\n")
        for s in sats:
            wimg(os.path.join(root, city, "satellite", s), (128, 128),
                 hash(city + s) % 97)
        lines = []
        for j in range(6):
            pano = f"p{j}.png"
            wimg(os.path.join(root, city, "panorama", pano), (64, 128), j)
            fields = [pano]
            for k in range(4):
                fields += [sats[(j + k) % 3], str(rng.uniform(-20, 20)),
                           str(rng.uniform(-20, 20))]
            lines.append(" ".join(fields))
        for base in ["same_area_balanced_train.txt",
                     "same_area_balanced_test.txt"]:
            with open(os.path.join(root, "splits_new", city, base), "w") as f:
                f.write("\n".join(lines) + "\n")
    return root


def test_train_vigor_cli_smoke(synthetic_vigor, tmp_path):
    import train_VIGOR

    train_VIGOR.main([
        "--dataset_root", synthetic_vigor,
        "--model_preset", "NANO",
        "--epochs", "1",
        "--steps_per_epoch", "2",
        "-b", "4",
        "--checkpoint_dir", str(tmp_path / "ckpt"),
        "--results_dir", str(tmp_path / "results"),
        "--num_workers", "2",
    ])
    # reference-format results files were appended
    files = os.listdir(tmp_path / "results")
    assert any("median_distance_error" in f for f in files)
    assert any("summary.json" in f for f in files)


def test_eval_vigor_cli_smoke(synthetic_vigor, tmp_path):
    import train_VIGOR

    # evaluation with a known-orientation prior (ori_noise 0 -> single bin)
    summary = train_VIGOR.main([
        "--dataset_root", synthetic_vigor,
        "--model_preset", "NANO",
        "--training", "False",
        "--ori_noise", "0",
        "--steps_per_epoch", "2",
        "-b", "4",
        "--test_model_path", str(tmp_path / "nonexistent"),
        "--results_dir", str(tmp_path / "results"),
        "--num_workers", "2",
    ])
    assert "median_distance_m" in summary
    assert np.isfinite(summary["median_distance_m"])
