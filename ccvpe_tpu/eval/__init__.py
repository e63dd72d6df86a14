"""BASELINE parity harness: run every benchmark config in one command.

The five headline configurations (``/root/repo/BASELINE.json`` "configs",
mirroring the reference's published eval protocols, SURVEY.md §3.2/§6) are
individually reachable through the CLI flags; this runner executes them all
and writes a single JSON parity report — per-config metrics plus throughput
— so the moment real datasets/checkpoints land, one command produces the
released-checkpoint infidelity check:

    python -m ccvpe_tpu.eval --configs all \
        --vigor_root ... --kitti_root ... --oxford_root ... \
        --vigor_samearea_model m1.pt --vigor_crossarea_model m2.pt \
        --kitti_model m3.pt --oxford_model m4.pt --out report.json

Each config reuses the corresponding trainer CLI's eval path verbatim (same
flag semantics as the reference scripts), so the report measures exactly
what the public entry points measure.
"""

from __future__ import annotations

import json
import time


def _missing(path: str) -> str:
    # the trainer CLIs fall back to random init when the checkpoint path
    # does not exist (smoke/synthetic mode); route "" through that path
    return path or "/nonexistent/model-not-provided"


def build_configs(args) -> list[dict]:
    """The five BASELINE.json configs as (name, runner-module, argv)."""
    common = ["--num_workers", str(args.num_workers),
              "--results_dir", args.results_dir]
    if args.steps:
        common += ["--steps_per_epoch", str(args.steps)]
    if args.model_preset:
        preset = ["--model_preset", args.model_preset]
    else:
        preset = []
    cfgs = [
        {
            "id": 1,
            "name": "VIGOR samearea single-pair inference, known orientation"
                    " (ori_noise 0)",
            "module": "train_VIGOR",
            "argv": ["--training", "False", "--area", "samearea",
                     "--ori_noise", "0", "-b", "1",
                     "--dataset_root", args.vigor_root,
                     "--test_model_path", _missing(args.vigor_samearea_model),
                     ] + preset + common,
        },
        {
            "id": 2,
            "name": "VIGOR samearea full test set, no orientation prior"
                    " (ori_noise 180), batched",
            "module": "train_VIGOR",
            "argv": ["--training", "False", "--area", "samearea",
                     "--ori_noise", "180", "-b", str(args.batch_size),
                     "--dataset_root", args.vigor_root,
                     "--test_model_path", _missing(args.vigor_samearea_model),
                     "--orientation_dir", args.orientation_dir,
                     ] + preset + common,
        },
        {
            "id": 3,
            "name": "VIGOR crossarea + limited HFoV (180/108) eval",
            "module": "train_VIGOR",
            "sub": [
                ["--training", "False", "--area", "crossarea",
                 "--ori_noise", "180", "--FoV", str(fov),
                 "-b", str(args.batch_size),
                 "--dataset_root", args.vigor_root,
                 "--test_model_path", _missing(args.vigor_crossarea_model),
                 "--orientation_dir", args.orientation_dir,
                 ] + preset + common
                for fov in (180, 108)
            ],
            "sub_names": ["FoV180", "FoV108"],
        },
        {
            "id": 4,
            "name": "KITTI eval with [-10, +10] deg orientation prior"
                    " (rotation_range 10)",
            "module": "train_KITTI",
            "argv": ["--training", "False", "--rotation_range", "10",
                     "-b", str(args.batch_size),
                     "--dataset_root", args.kitti_root,
                     "--test_model_path", _missing(args.kitti_model),
                     ] + preset + common,
        },
        {
            "id": 5,
            "name": "Oxford RobotCar sequential per-frame pose"
                    " (3 streaming traversals)",
            "module": "train_OxfordRobotCar",
            "argv": ["--training", "False", "-b", str(args.batch_size),
                     "--grd_image_root", args.oxford_root,
                     "--test_model_path", _missing(args.oxford_model),
                     ] + preset + common,
        },
    ]
    if args.configs != "all":
        wanted = {int(x) for x in args.configs.split(",")}
        cfgs = [c for c in cfgs if c["id"] in wanted]
    return cfgs


def run_config(cfg: dict) -> dict:
    import importlib

    from ..parallel import mesh

    mod = importlib.import_module(cfg["module"])
    t0 = time.time()
    # Each CLI main() ends with mesh.finalize_run() — a named, counted
    # multi-host barrier.  If this host's main() fails BEFORE reaching it
    # while the other hosts' succeed, this host must still join that
    # barrier or every subsequent config desyncs; track the per-process
    # finalize count and catch up in the failure paths.
    expect = mesh.finalize_count() + (len(cfg["sub"]) if "sub" in cfg else 1)
    try:
        if "sub" in cfg:
            metrics = {name: mod.main(argv)
                       for name, argv in zip(cfg["sub_names"], cfg["sub"])}
        else:
            metrics = mod.main(cfg["argv"])
        status = "ok"
    except SystemExit as e:  # missing fixture/dataset -> recorded, not fatal
        metrics, status = {"error": str(e)}, "failed"
    except Exception as e:  # noqa: BLE001 — any per-config failure is
        # recorded so the remaining configs still run and the report is
        # still written
        metrics = {"error": f"{type(e).__name__}: {e}"}
        status = "failed"
    while mesh.finalize_count() < expect:
        try:
            mesh.finalize_run()
        except Exception:  # barrier timeout: peers died; keep reporting
            break
    return {
        "id": cfg["id"],
        "name": cfg["name"],
        "status": status,
        "wall_s": round(time.time() - t0, 3),
        "metrics": metrics,
    }


def run(args) -> dict:
    import os
    import sys

    # the trainer CLIs live at the repo root next to this package
    root = os.path.dirname(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))
    pkg_root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    for p in (root, os.path.dirname(pkg_root)):
        if p not in sys.path:
            sys.path.insert(0, p)

    report = {
        "harness": "ccvpe_tpu.eval",
        "baseline": "BASELINE.json configs 1-5",
        "results": [run_config(c) for c in build_configs(args)],
    }
    report["n_ok"] = sum(r["status"] == "ok" for r in report["results"])
    report["n_failed"] = sum(r["status"] == "failed"
                             for r in report["results"])
    if args.out:
        with open(args.out, "w") as f:
            json.dump(report, f, indent=2, default=str)
        print(f"wrote {args.out}")
    return report
