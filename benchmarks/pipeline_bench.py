#!/usr/bin/env python
"""Fed-chip pipeline throughput: disk -> Loader -> device_batch -> jitted step.

``bench.py`` measures the device-only rate (resident batch, scan loop) and
``loader_bench.py`` the host decode rate in isolation; this closes the loop:
a synthetic on-disk VIGOR shard is streamed through the production
``pipeline.Loader`` (all host variants), assembled by ``vigor.device_batch``
(normalize/roll/GT synthesis on device), and fed to the jitted eval-readout
or train step — the sustained pairs/s is what a user's training/eval run
actually sees (the reference's 14 FPS ceiling was host-bound,
``/root/reference/README.md:21``).

Variants:
  python       per-sample PIL thread pool
  native       batched C++ decode (one call per batch per image size)
  native-fast  + DCT-scaled JPEG decode (training feeds)
  cache        decode-free ArrayCache (pre-resized uint8 memmap)

Prints one JSON line per variant plus a summary line with the device-only
rate and the host/device utilization split.

Usage: python benchmarks/pipeline_bench.py [--n 256] [--batch 32]
         [--workers 8] [--mode eval|train] [--preset VIGOR]
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

from loader_bench import build_shard  # noqa: E402  (sibling module)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=256)
    ap.add_argument("--batch", type=int, default=32)
    ap.add_argument("--workers", type=int, default=8)
    ap.add_argument("--mode", choices=("eval", "train"), default="eval")
    ap.add_argument("--preset", type=str, default="VIGOR")
    ap.add_argument("--dtype", choices=("bfloat16", "float32"),
                    default="bfloat16")
    ap.add_argument("--out", type=str, default="",
                    help="also append the JSON records to this file")
    ap.add_argument("--modes", type=str, default="",
                    help="comma-separated subset of variants to run "
                         "(python,native,native-fast,cache,ram)")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from ccvpe_tpu.utils import compilation_cache
    compilation_cache.enable()

    from ccvpe_tpu.data import native_loader, pipeline, vigor
    from ccvpe_tpu.data.cache import ArrayCache
    from ccvpe_tpu.models import cvm
    from ccvpe_tpu.train import loop as train_loop

    cfg = cvm.PRESETS[args.preset]
    dtype = jnp.bfloat16 if args.dtype == "bfloat16" else jnp.float32
    records = []

    root = tempfile.mkdtemp(prefix="ccvpe_pipe_bench_")
    cache_dir = tempfile.mkdtemp(prefix="ccvpe_pipe_cache_")
    try:
        print(f"building {args.n}-pair synthetic shard under {root} ...",
              flush=True)
        build_shard(root, args.n)
        index = vigor.VigorIndex.load(root, "samearea", train=True)
        frozen = np.zeros(len(index))

        caches = {}
        for name, paths, hw in (("grd", index.grd_paths, cfg.grd_hw),
                                ("sat", index.sat_paths, cfg.sat_hw)):
            caches[f"{name}_cache"] = ArrayCache.build(
                paths, hw, os.path.join(cache_dir, name))

        def make_loader(native: bool, fast: bool, cached: bool):
            sampler = vigor.VigorSampler(
                index, random_orientation=frozen, grd_hw=cfg.grd_hw,
                sat_hw=cfg.sat_hw, **(caches if cached else {}))
            return pipeline.Loader(sampler, np.arange(len(index)),
                                   batch_size=args.batch,
                                   num_workers=args.workers,
                                   native_batch=native, fast_decode=fast)

        # -- jitted step -------------------------------------------------
        if args.mode == "eval":
            from ccvpe_tpu.ops.readout import pose_readout_from_outputs

            def step_fn(params, bn, batch):
                out, _ = cvm.forward(cfg, params, bn,
                                     batch["grd"].astype(dtype),
                                     batch["sat"].astype(dtype), train=False)
                return pose_readout_from_outputs(
                    out, batch["gt"], batch["orientation"])

            params, bn = cvm.init(jax.random.PRNGKey(0), cfg)
            step = jax.jit(step_fn)
            run_step = lambda batch: step(params, bn, batch)
            sync = lambda r: jax.device_get(r)
        else:
            opt = train_loop.make_optimizer()
            state = train_loop.create_train_state(cfg, jax.random.PRNGKey(0),
                                                  opt)
            tstep = jax.jit(train_loop.make_train_step(
                cfg, opt, remat=True, compute_dtype=dtype),
                donate_argnums=(0,))
            rngs = {"k": jax.random.PRNGKey(1)}

            def run_step(batch):
                nonlocal state
                rngs["k"], sk = jax.random.split(rngs["k"])
                state, parts = tstep(state, batch, sk)
                return parts["loss"]

            sync = lambda r: jax.device_get(r)

        dev_batch = lambda raw: vigor.device_batch(
            raw, train=args.mode == "train", sat_hw=cfg.sat_hw, bins=cfg.bins)

        # -- device-only rate on a resident batch ------------------------
        warm = None
        for raw in make_loader(False, False, True):
            warm = dev_batch(raw)
            break
        sync(run_step(warm))  # compile
        t0 = time.perf_counter()
        iters = 10
        rs = [run_step(warm) for _ in range(iters)]
        sync(rs)
        device_only = args.batch * iters / (time.perf_counter() - t0)
        print(f"device-only: {device_only:8.1f} pairs/s", flush=True)

        # -- fed-chip variants -------------------------------------------
        def timed(batches) -> tuple[float, int]:
            t0 = time.perf_counter()
            pending, n_pairs = [], 0
            for batch in batches:
                pending.append(run_step(batch))
                n_pairs += int(batch["gt"].shape[0])
                if len(pending) > 2:  # keep the dispatch queue bounded
                    sync(pending.pop(0))
            sync(pending)
            return time.perf_counter() - t0, n_pairs

        modes = [("python", False, False, False),
                 ("native", True, False, False),
                 ("native-fast", True, True, False),
                 ("cache", False, False, True),
                 ("ram", False, False, True)]
        if args.modes:
            want = set(args.modes.split(","))
            modes = [m for m in modes if m[0] in want]

        # -- decode-free feed: pre-decoded raw batches resident in host RAM.
        # Models a host with enough decode cores to keep up (the regime
        # device_prefetch targets): the timed loop is only device-batch
        # assembly + H2D + the step, so the +prefetch delta isolates how much
        # of that serial host/transfer work hides behind device compute.
        # Built lazily: decoding the whole shard costs time/RAM and would
        # pre-warm the page cache for the other timed variants.
        ram_batches = ([raw for raw in make_loader(False, False, True)]
                       if any(m[0] == "ram" for m in modes) else None)
        for name, native, fast, cached in modes:
            if native and not native_loader.available():
                print("native loader unavailable:",
                      native_loader.build_error(), flush=True)
                continue
            mk = ((lambda: iter(ram_batches)) if name == "ram"
                  else (lambda: make_loader(native, fast, cached)))
            # plain: device-batch assembly inline in the consumer loop, and
            # +prefetch: the production path since r4 — assembly + H2D run
            # one batch ahead in a producer thread (harness.train_epoch /
            # evaluate use the same pipeline.device_prefetch helper)
            for tag, batches in (
                    ("", map(dev_batch, mk())),
                    ("+prefetch", pipeline.device_prefetch(mk(),
                                                           dev_batch))):
                dt, n_pairs = timed(batches)
                fed = n_pairs / dt
                rec = {
                    "metric": f"fed-chip {args.mode} throughput ({name}"
                              f"{tag} loader, batch {args.batch}, "
                              f"{args.workers} workers)",
                    "value": round(fed, 1),
                    "unit": "pairs/sec/chip",
                    "device_only_pairs_per_sec": round(device_only, 1),
                    "chip_utilization_pct": round(100 * fed / device_only, 1),
                    "host_cores": os.cpu_count(),
                }
                records.append(rec)
                print(json.dumps(rec), flush=True)
    finally:
        shutil.rmtree(root, ignore_errors=True)
        shutil.rmtree(cache_dir, ignore_errors=True)

    if args.out and records:
        with open(args.out, "a") as f:
            for rec in records:
                f.write(json.dumps(rec) + "\n")


if __name__ == "__main__":
    main()
