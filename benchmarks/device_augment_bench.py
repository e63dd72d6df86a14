#!/usr/bin/env python
"""--device_augment evidence: KITTI aerial warps on the chip vs host PIL.

README advertises ``--device_augment`` as a throughput lever; this bench
puts a number behind it (VERDICT r4 next-step #6).  Three measurements:

  host-warp   per-sample cost of the PIL alignment chain (rotate ->
              affine -> affine -> rotate -> crop) inside the REAL
              ``KittiSampler`` — measured as (full host sample) minus
              (device_augment=True host sample, which decodes but skips
              the warps), so decode cost cancels
  device-warp per-batch cost of ``ops.geometry.kitti_alignment_chain_batched``
              on the accelerator, steady-state
  verdict     host cores needed to keep the chip fed at the measured train
              step time vs the chip-time the device chain steals from it

Writes benchmarks/DEVICE_AUGMENT_BENCH.json.  Runs anywhere; numbers in
ARCHITECTURE.md come from the TPU v5e host.
"""

import json
import os
import sys
import tempfile
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from PIL import Image


def build_root(root: str, n: int = 8, sat_native: int = 512):
    """Synthetic KITTI-CVL layout at RELEASE sizes (satmap 512x512,
    grd 375x1242-ish decoded then resized by the sampler)."""
    drive = "2011_09_26/2011_09_26_drive_0001_sync/"

    def wimg(path, hw, seed):
        os.makedirs(os.path.dirname(path), exist_ok=True)
        Image.fromarray(np.random.default_rng(seed).integers(
            0, 255, (*hw, 3), dtype=np.uint8)).save(path)

    names = []
    for i in range(n):
        name = drive + f"{i:010d}.png"
        names.append(name)
        wimg(os.path.join(root, "satmap", name), (sat_native, sat_native), i)
        wimg(os.path.join(root, "raw_data", drive, "image_02/data",
                          f"{i:010d}.png"), (375, 1242), 50 + i)
        oxts = os.path.join(root, "raw_data", drive, "oxts/data",
                            f"{i:010d}.txt")
        os.makedirs(os.path.dirname(oxts), exist_ok=True)
        with open(oxts, "w") as f:
            f.write(f"49.01 8.43 112.9 0.0 0.0 {0.1 * i} "
                    + "0.0 " * 24 + "\n")
    with open(os.path.join(root, "train_files.txt"), "w") as f:
        f.write("\n".join(names) + "\n")


def time_host(sampler, n_iters: int = 24) -> float:
    """Mean ms per sample through the real sampler."""
    n = len(sampler.index)
    sampler(0)  # warm PIL/file cache
    t0 = time.perf_counter()
    for i in range(n_iters):
        sampler(i % n)
    return (time.perf_counter() - t0) / n_iters * 1e3


def main():
    out_path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                            "DEVICE_AUGMENT_BENCH.json")
    from ccvpe_tpu.utils.platform import apply_env_platform
    apply_env_platform()  # CCVPE_PLATFORM=cpu -> host-backend smoke

    import jax
    import jax.numpy as jnp

    from ccvpe_tpu.data import kitti
    from ccvpe_tpu.ops.geometry import kitti_alignment_chain_batched
    from ccvpe_tpu.utils import compilation_cache

    compilation_cache.enable()
    with tempfile.TemporaryDirectory() as root:
        build_root(root)
        index = kitti.KittiIndex.load(
            root, os.path.join(root, "train_files.txt"), test=False)
        host = kitti.KittiSampler(index)
        raw = kitti.KittiSampler(index, device_augment=True)
        ms_full = time_host(host)
        ms_raw = time_host(raw)

    mpp = kitti.meter_per_pixel()
    dev = jax.devices()[0]
    rng = np.random.default_rng(0)
    results = {"device": dev.device_kind, "platform": dev.platform,
               "host_ms_per_sample_full_chain": round(ms_full, 2),
               "host_ms_per_sample_decode_only": round(ms_raw, 2),
               "host_warp_ms_per_sample": round(ms_full - ms_raw, 2),
               "batches": []}

    @jax.jit
    def chain(sat, heading, sx, sy, ro):
        return kitti_alignment_chain_batched(
            sat, heading, mpp, kitti.CAMERA_GPS_SHIFT_LEFT, sx, sy, ro,
            side=kitti.SAT_HW[0])

    for b in (8, 128):
        sat = jnp.asarray(rng.integers(0, 255, (b, 512, 512, 3), np.uint8))
        heading = jnp.asarray(rng.uniform(0, 2 * np.pi, b), jnp.float32)
        sx = jnp.asarray(rng.uniform(-100, 100, b), jnp.float32)
        sy = jnp.asarray(rng.uniform(-100, 100, b), jnp.float32)
        ro = jnp.asarray(rng.uniform(-10, 10, b), jnp.float32)
        np.asarray(chain(sat, heading, sx, sy, ro))  # compile + warmup
        iters = 20
        t0 = time.perf_counter()
        r = None
        for _ in range(iters):
            r = chain(sat, heading, sx, sy, ro)
        np.asarray(r)  # force completion through the tunnel
        dt = (time.perf_counter() - t0) / iters
        results["batches"].append({
            "batch": b,
            "device_warp_ms_per_batch": round(dt * 1e3, 2),
            "device_warp_ms_per_sample": round(dt * 1e3 / b, 3)})
        print(results["batches"][-1], flush=True)

    print(json.dumps(results), flush=True)
    with open(out_path, "w") as f:
        json.dump(results, f, indent=1)
    print(f"wrote {out_path}", flush=True)


if __name__ == "__main__":
    main()
