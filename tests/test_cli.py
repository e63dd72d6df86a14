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


def test_train_vigor_warmstart_from_torch(synthetic_vigor, tmp_path,
                                          torch_oracle):
    """--init_model_path: fine-tune from a reference-format .pt — weights
    load verbatim, optimizer state starts fresh, training then runs."""
    import jax

    import train_VIGOR
    from ccvpe_tpu.io.torch_import import save_torch_checkpoint
    from ccvpe_tpu.models import cvm
    from ccvpe_tpu.train import harness, loop as train_loop

    cfg = cvm.PRESETS["NANO"]
    opt = train_loop.make_optimizer()
    src = train_loop.create_train_state(cfg, jax.random.PRNGKey(3), opt)
    pt = str(tmp_path / "warm.pt")
    save_torch_checkpoint(pt, jax.device_get(src.params),
                          jax.device_get(src.bn_state))

    # the imported state carries the exact saved weights and step 0
    tr = harness.Trainer(cfg, results_dir=str(tmp_path / "r0"))
    tr.load_torch_checkpoint(pt)
    jax.tree_util.tree_map(
        np.testing.assert_array_equal,
        jax.device_get(tr.state.params), jax.device_get(src.params))
    assert int(jax.device_get(tr.state.step)) == 0

    train_VIGOR.main([
        "--dataset_root", synthetic_vigor,
        "--model_preset", "NANO",
        "--epochs", "1",
        "--steps_per_epoch", "2",
        "-b", "4",
        "--init_model_path", pt,
        "--checkpoint_dir", str(tmp_path / "ckpt"),
        "--results_dir", str(tmp_path / "results"),
        "--num_workers", "2",
    ])
    assert any("summary.json" in f
               for f in os.listdir(tmp_path / "results"))


@pytest.fixture(scope="module")
def synthetic_kitti(tmp_path_factory):
    root = str(tmp_path_factory.mktemp("kitti_cli"))
    drive = "2011_09_26/2011_09_26_drive_0001_sync/"

    def wimg(path, hw, seed):
        os.makedirs(os.path.dirname(path), exist_ok=True)
        Image.fromarray(np.random.default_rng(seed).integers(
            0, 255, (*hw, 3), dtype=np.uint8)).save(path)

    names = []
    for i in range(8):
        name = drive + f"{i:010d}.png"
        names.append(name)
        wimg(os.path.join(root, "satmap", name), (128, 128), i)
        wimg(os.path.join(root, "raw_data", drive, "image_02/data",
                          f"{i:010d}.png"), (94, 311), 50 + i)
        oxts = os.path.join(root, "raw_data", drive, "oxts/data",
                            f"{i:010d}.txt")
        os.makedirs(os.path.dirname(oxts), exist_ok=True)
        with open(oxts, "w") as f:
            f.write(f"49.01 8.43 112.9 0.0 0.0 {0.1 * i} "
                    + "0.0 " * 24 + "\n")
    with open(os.path.join(root, "train_files.txt"), "w") as f:
        f.write("\n".join(names) + "\n")
    for tn in ("test1_files.txt", "test2_files.txt"):
        with open(os.path.join(root, tn), "w") as f:
            f.write("\n".join(f"{n} 0.2 -0.4 0.3" for n in names[:4]) + "\n")
    return root


def test_train_kitti_cli_smoke(synthetic_kitti, tmp_path):
    import train_KITTI

    train_KITTI.main([
        "--dataset_root", synthetic_kitti,
        "--model_preset", "NANO",
        "--rotation_range", "10",
        "--epochs", "1",
        "--steps_per_epoch", "1",
        "-b", "4",
        "--checkpoint_dir", str(tmp_path / "ckpt"),
        "--results_dir", str(tmp_path / "results"),
        "--num_workers", "2",
    ])
    files = os.listdir(tmp_path / "results")
    assert any("test1" in f for f in files)


def test_eval_kitti_cli_smoke(synthetic_kitti, tmp_path):
    import train_KITTI

    results = train_KITTI.main([
        "--dataset_root", synthetic_kitti,
        "--model_preset", "NANO",
        "--training", "False",
        "--rotation_range", "10",
        "--steps_per_epoch", "1",
        "-b", "4",
        "--test_model_path", str(tmp_path / "nonexistent"),
        "--results_dir", str(tmp_path / "results"),
        "--num_workers", "2",
    ])
    assert "test1" in results and "test2" in results
    assert "lateral_recall@5m" in results["test1"]


@pytest.fixture(scope="module")
def synthetic_oxford(tmp_path_factory):
    root = str(tmp_path_factory.mktemp("oxford_cli")) + "/"

    def wimg(path, hw, seed):
        os.makedirs(os.path.dirname(path), exist_ok=True)
        Image.fromarray(np.random.default_rng(seed).integers(
            0, 255, (*hw, 3), dtype=np.uint8)).save(path)

    wimg(root + "satellite_map_new.png", (2400, 2400), 9)
    n = 8
    lines = [f"g{i}.png 0 {619400 + 30 * i}.0 {5735300 + 20 * i}.0"
             for i in range(n)]
    for split, fn in [("training.txt", "train_yaw.npy"),
                      ("validation.txt", "val_yaw.npy")]:
        with open(root + split, "w") as f:
            f.write("\n".join(lines) + "\n")
        np.save(root + fn, np.linspace(0, 5, n))
    for i, t in enumerate(("test1_j.txt", "test2_j.txt", "test3_j.txt")):
        with open(root + t, "w") as f:
            f.write("\n".join(lines[2 * i:2 * i + 2]) + "\n")
    np.save(root + "test_yaw.npy", np.linspace(0, 5, 6))
    for i in range(n):
        wimg(root + f"g{i}.png", (77, 115), 20 + i)
    return root


def test_train_and_eval_oxford_cli_smoke(synthetic_oxford, tmp_path):
    import train_OxfordRobotCar

    train_OxfordRobotCar.main([
        "--grd_image_root", synthetic_oxford,
        "--model_preset", "NANO",
        "--epochs", "1",
        "--steps_per_epoch", "1",
        "-b", "4",
        "--checkpoint_dir", str(tmp_path / "ckpt"),
        "--results_dir", str(tmp_path / "results"),
        "--num_workers", "2",
    ])
    results = train_OxfordRobotCar.main([
        "--grd_image_root", synthetic_oxford,
        "--model_preset", "NANO",
        "--training", "False",
        "-b", "2",
        "--test_model_path", str(tmp_path / "ckpt") + "-missing",
        "--results_dir", str(tmp_path / "results"),
        "--num_workers", "2",
    ])
    assert set(results) == {"test1", "test2", "test3"}
    # Oxford eval runs with per-frame headings: the full reference metric
    # contract (per-axis mean/median + recalls,
    # reference train_OxfordRobotCar.py:250-266) is present
    for t in results.values():
        for key in ("mean_longitudinal_m", "median_longitudinal_m",
                    "mean_lateral_m", "median_lateral_m",
                    "longitudinal_recall@1m", "lateral_recall@5m"):
            assert key in t, key


def test_train_kitti_device_augment_cli(synthetic_kitti, tmp_path):
    import train_KITTI

    train_KITTI.main([
        "--dataset_root", synthetic_kitti,
        "--model_preset", "NANO",
        "--rotation_range", "10",
        "--device_augment",
        "--epochs", "1",
        "--steps_per_epoch", "1",
        "-b", "4",
        "--results_dir", str(tmp_path / "results"),
        "--num_workers", "2",
    ])
    assert any("summary.json" in f
               for f in os.listdir(tmp_path / "results"))


def test_eval_vigor_frozen_orientation_cli(synthetic_vigor, tmp_path):
    """Unknown-orientation eval consumes the frozen per-sample rotations
    (reference train_VIGOR.py:73-79 semantics) from --orientation_dir."""
    import train_VIGOR
    from ccvpe_tpu.data import vigor

    index = vigor.VigorIndex.load(synthetic_vigor, "samearea", False)
    frozen = np.linspace(0, 359, len(index))
    np.save(tmp_path / "samearea_orientation_test.npy", frozen)

    summary = train_VIGOR.main([
        "--dataset_root", synthetic_vigor,
        "--model_preset", "NANO",
        "--training", "False",
        "--ori_noise", "180",
        "--steps_per_epoch", "1",
        "-b", "4",
        "--test_model_path", str(tmp_path / "none"),
        "--orientation_dir", str(tmp_path),
        "--results_dir", str(tmp_path / "results"),
        "--num_workers", "2",
    ])
    assert np.isfinite(summary["median_distance_m"])


def test_checkpoint_every_steps(synthetic_vigor, tmp_path):
    import train_VIGOR

    train_VIGOR.main([
        "--dataset_root", synthetic_vigor,
        "--model_preset", "NANO",
        "--epochs", "1",
        "--steps_per_epoch", "3",
        "-b", "4",
        "--checkpoint_every_steps", "2",
        "--checkpoint_dir", str(tmp_path / "ckpt"),
        "--results_dir", str(tmp_path / "results"),
        "--num_workers", "2",
    ])
    from ccvpe_tpu.io.checkpoint import CheckpointManager

    mngr = CheckpointManager(str(tmp_path / "ckpt"))
    # 3 steps with checkpoint_every_steps=2: mid-epoch save at global step 2
    # plus the end-of-epoch save at step 3
    assert mngr.all_steps() == [2, 3]


def test_train_vigor_cli_perf_flags_smoke(synthetic_vigor, tmp_path):
    """All perf levers combined: bf16 compute + bf16-resident params +
    block remat, end to end through the CLI."""
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
        "--bf16", "--bf16_params", "--remat",
    ])
    files = os.listdir(tmp_path / "results")
    assert any("summary.json" in f for f in files)


@pytest.mark.slow
def test_profile_dir_captures_trace(synthetic_vigor, tmp_path):
    """--profile_dir produces a jax.profiler trace even on a short epoch
    (VERDICT r2 #6: the flag must reach Trainer(profile_dir=...))."""
    import train_VIGOR

    prof = tmp_path / "trace"
    train_VIGOR.main([
        "--dataset_root", synthetic_vigor,
        "--model_preset", "NANO",
        "--epochs", "1",
        "--steps_per_epoch", "2",
        "-b", "4",
        "--checkpoint_dir", str(tmp_path / "ckpt"),
        "--results_dir", str(tmp_path / "results"),
        "--num_workers", "2",
        "--profile_dir", str(prof),
    ])
    # jax.profiler writes plugins/profile/<ts>/*.xplane.pb under the dir
    captured = [p for p in prof.rglob("*") if p.is_file()]
    assert captured, "no trace files captured under --profile_dir"

    # the headless analyzer must attribute real op time from this capture
    # (CPU backend: ops run on tf_XLA* host threads, envelopes dropped)
    from ccvpe_tpu.utils import trace_analysis

    durations, _ = trace_analysis.load_device_durations(str(prof))
    assert durations, "analyzer found no op spans in the captured trace"
    report = trace_analysis.summarize(durations, iters=3)
    assert report["device_ms_per_iter"] > 0
    assert not any("::" in r["name"] for r in report["top_ops"]), \
        "runtime envelopes leaked into the op attribution"


def test_baseline_eval_runner(synthetic_vigor, synthetic_oxford, tmp_path):
    """One command executes the BASELINE.json configs and writes the parity
    report (SURVEY.md §7 step 8); smoke on two configs for speed."""
    import json

    from ccvpe_tpu.eval.__main__ import main as eval_main

    report = eval_main([
        "--configs", "2,5",
        "--vigor_root", synthetic_vigor,
        "--oxford_root", synthetic_oxford,
        "--model_preset", "NANO",
        "--steps", "1",
        "--batch_size", "2",
        "--num_workers", "2",
        "--results_dir", str(tmp_path / "results"),
        "--out", str(tmp_path / "report.json"),
    ])
    assert report["n_ok"] == 2 and report["n_failed"] == 0
    saved = json.loads((tmp_path / "report.json").read_text())
    assert {r["id"] for r in saved["results"]} == {2, 5}
    vigor_metrics = next(r for r in saved["results"]
                         if r["id"] == 2)["metrics"]
    assert "median_distance_m" in vigor_metrics
    assert "pairs_per_sec" in vigor_metrics
    oxford_metrics = next(r for r in saved["results"]
                          if r["id"] == 5)["metrics"]
    assert set(oxford_metrics) == {"test1", "test2", "test3"}


def test_keep_checkpoints_zero_keeps_all(synthetic_vigor, tmp_path):
    """--keep_checkpoints 0 retains every per-epoch checkpoint (the
    reference's keep-all behavior); the default bounds retention."""
    import train_VIGOR

    ck = str(tmp_path / "ckpt")
    train_VIGOR.main([
        "--dataset_root", synthetic_vigor, "--model_preset", "NANO",
        "--epochs", "3", "--steps_per_epoch", "1", "-b", "4",
        "--checkpoint_dir", ck, "--results_dir", str(tmp_path / "r"),
        "--num_workers", "2", "--keep_checkpoints", "0",
    ])
    from ccvpe_tpu.io.checkpoint import CheckpointManager

    steps = CheckpointManager(ck, max_to_keep=None).all_steps()
    assert steps == [1, 2, 3], steps


def test_eval_runner_finalize_lockstep_on_failure():
    """If a config's CLI main() dies BEFORE its finalize_run barrier, the
    runner catches up the per-process finalize count so a multi-host eval
    stays barrier-aligned for the remaining configs (each finalize uses a
    counted, distinct barrier name — see parallel/mesh.py)."""
    from ccvpe_tpu.eval import run_config
    from ccvpe_tpu.parallel import mesh

    before = mesh.finalize_count()
    rec = run_config({"id": 99, "name": "boom",
                      "module": "tests.fake_failing_cli", "argv": []})
    assert rec["status"] == "failed"
    assert "boom" in rec["metrics"]["error"]
    assert mesh.finalize_count() == before + 1
