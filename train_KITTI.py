#!/usr/bin/env python
"""KITTI train/eval entry point — mirrors the reference CLI
(``/root/reference/train_KITTI.py:24-32``): ``--training -l -b --weight_ori
--weight_infoNCE --shift_range_lat --shift_range_lon --rotation_range``, with
dataset paths lifted to flags.  Training runs 6 epochs with per-epoch eval on
both test splits; ``--training False`` additionally reports the
lateral/longitudinal decomposition and <1/3/5 m·deg recalls
(``train_KITTI.py:355-360``)."""

import argparse
import os

import numpy as np


def parse_args(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--training", choices=("True", "False"), default="True")
    p.add_argument("-l", "--learning_rate", type=float, default=1e-4)
    p.add_argument("-b", "--batch_size", type=int, default=8)
    p.add_argument("--weight_ori", type=float, default=1e1)
    p.add_argument("--weight_infoNCE", type=float, default=1e4)
    p.add_argument("--shift_range_lat", type=float, default=20)
    p.add_argument("--shift_range_lon", type=float, default=20)
    p.add_argument("--rotation_range", type=float, default=180)
    # framework flags
    p.add_argument("--dataset_root", type=str,
                   default=os.environ.get("KITTI_ROOT", "datasets/KITTI"))
    p.add_argument("--train_file", type=str, default="")
    p.add_argument("--test1_file", type=str, default="")
    p.add_argument("--test2_file", type=str, default="")
    p.add_argument("--epochs", type=int, default=6)
    p.add_argument("--steps_per_epoch", type=int, default=0)
    p.add_argument("--checkpoint_dir", type=str, default="")
    p.add_argument("--results_dir", type=str, default="results")
    p.add_argument("--profile_dir", type=str, default="",
                   help="capture a jax.profiler trace of train steps 10-13 "
                        "(or the first steps of short epochs) to this directory")
    p.add_argument("--num_workers", type=int, default=8)
    p.add_argument("--native_loader", action="store_true",
                   help="decode whole batches in the C++ thread pool "
                        "(also enabled by CCVPE_NATIVE_LOADER=1)")
    p.add_argument("--fast_decode", action="store_true",
                   help="DCT-scaled JPEG decode for the training feed "
                        "(native loader only; not bit-identical to PIL, "
                        "never used for eval; also CCVPE_FAST_DECODE=1)")
    p.add_argument("--resume", action="store_true")
    p.add_argument("--init_model_path", type=str, default="",
                   help="warm-start training from a reference-format .pt "
                        "checkpoint (fine-tuning); unlike --resume, optimizer "
                        "state starts fresh")
    p.add_argument("--test_model_path", type=str,
                   default="models/KITTI/no_orientation_prior/model.pt")
    p.add_argument("--device_augment", action="store_true",
                   help="run the aerial alignment chain batched on device "
                        "for training (host only decodes); eval keeps the "
                        "bit-faithful host path")
    p.add_argument("--grad_accum", type=int, default=1,
                   help="accumulate gradients over N microbatches inside "
                        "the step (activation peak = one microbatch; "
                        "effective batches beyond the single-chip HBM wall)")
    p.add_argument("--zero1", action="store_true",
                   help="ZeRO-1: shard optimizer state (Adam moments, f32 "
                        "master) over the data axis")
    p.add_argument("--n_model", type=int, default=1,
                   help="devices reserved for the model (tensor-parallel) "
                        "mesh axis; the rest form the data axis")
    p.add_argument("--keep_checkpoints", type=int, default=3,
                   help="retained checkpoints (0 = keep every step, the "
                        "reference's keep-all-epochs behavior)")
    p.add_argument("--checkpoint_every_steps", type=int, default=0,
                   help="also checkpoint mid-epoch every N steps "
                        "(preemption recovery; 0 = per-epoch only)")
    p.add_argument("--pretrained_b0", type=str, default="",
                   help="EfficientNet-B0 torch state_dict: a local path, or "
                        "'auto' to download+cache the release file; "
                        "both encoders start from it (the reference's "
                        "from_pretrained init)")
    p.add_argument("--bf16_params", action="store_true",
                   help="store resident weights in bfloat16 (f32 master in "
                        "the optimizer state)")
    p.add_argument("--bf16", action="store_true",
                   help="bfloat16 forward/backward (f32 master weights)")
    p.add_argument("--remat", nargs="?", const="all", default="",
                   choices=("all", "encoder", "decoder"),
                   help="rematerialize the forward in the backward pass; "
                        "bare --remat checkpoints every block+stage, "
                        "--remat encoder/decoder restricts the scope")
    p.add_argument("--cache_dir", type=str, default="",
                   help="build/use preprocessed uint8 array caches (ground "
                        "at model size, satmaps raw) for decode-free input "
                        "streaming")
    p.add_argument("--matching_impl", default="einsum",
                   choices=("einsum", "pallas", "reference"),
                   help="orientation-matching kernel (einsum is the "
                        "measured-best default; see ARCHITECTURE.md)")
    p.add_argument("--model_preset", type=str, default="KITTI")
    return p.parse_args(argv)


def main(argv=None):
    ret = _main(argv)
    # explicit end-of-run barrier for pod launches (see train_VIGOR.py and
    # parallel/mesh.py::finalize_run)
    from ccvpe_tpu.parallel import mesh as mesh_lib
    mesh_lib.finalize_run()
    return ret


def _main(argv=None):
    args = parse_args(argv)
    training = args.training == "True"
    label = f"KITTI_rotation_range{args.rotation_range}"

    from ccvpe_tpu.data import kitti, pipeline
    from ccvpe_tpu.models import cvm
    from ccvpe_tpu.parallel import mesh as mesh_lib
    from ccvpe_tpu.train.harness import Trainer

    from ccvpe_tpu.utils.platform import apply_env_platform
    apply_env_platform()  # CCVPE_PLATFORM pins the backend in-process
    # distributed init MUST precede any backend-initializing JAX call
    mesh_lib.maybe_init_distributed()
    from ccvpe_tpu.utils import compilation_cache
    compilation_cache.enable()
    if args.model_preset not in cvm.PRESETS:
        raise SystemExit(f"unknown --model_preset {args.model_preset!r}; "
                         f"choose from {sorted(cvm.PRESETS)}")
    cfg = cvm.PRESETS[args.model_preset]
    trainer = Trainer(
        cfg, learning_rate=args.learning_rate,
        weight_info_nce=args.weight_infoNCE, weight_ori=args.weight_ori,
        checkpoint_dir=args.checkpoint_dir or f"models/KITTI/{label}",
        results_dir=args.results_dir, label=label,
        batch_size=args.batch_size,
        compute_dtype="bfloat16" if args.bf16 else "float32",
        param_dtype="bfloat16" if args.bf16_params else "float32",
        remat=args.remat or False,
        checkpoint_every_steps=args.checkpoint_every_steps,
        keep_checkpoints=args.keep_checkpoints,
        profile_dir=args.profile_dir or None,
        zero1=args.zero1,
        grad_accum=args.grad_accum,
        n_model=args.n_model,
        matching_impl=args.matching_impl)

    root = args.dataset_root
    train_file = args.train_file or os.path.join(root, "train_files.txt")
    test_files = [args.test1_file or os.path.join(root, "test1_files.txt"),
                  args.test2_file or os.path.join(root, "test2_files.txt")]

    mpp = kitti.meter_per_pixel()
    kw = dict(shift_range_lat=args.shift_range_lat,
              shift_range_lon=args.shift_range_lon,
              rotation_range=args.rotation_range,
              grd_hw=cfg.grd_hw, sat_hw=cfg.sat_hw)
    if args.device_augment:
        dev_train = lambda raw: kitti.device_batch_device_aug(
            raw, train=True, mpp=mpp, sat_hw=cfg.sat_hw, bins=cfg.bins)
    else:
        dev_train = lambda raw: kitti.device_batch(
            raw, train=True, sat_hw=cfg.sat_hw, bins=cfg.bins)
    dev_eval = lambda raw: kitti.device_batch(
        raw, train=False, sat_hw=cfg.sat_hw, bins=cfg.bins)

    def limit(idx):
        if args.steps_per_epoch:
            return idx[:args.steps_per_epoch * args.batch_size]
        return idx

    def build_caches(sampler_like, tag):
        """Ground frames cached at model size; satmaps cached RAW (the
        alignment chain needs full resolution; sizes are uniform across the
        KITTI-CVL release)."""
        if not args.cache_dir:
            return {}
        from PIL import Image
        from ccvpe_tpu.data.cache import build_or_open

        n = len(sampler_like.index)
        grd_paths = [sampler_like.grd_path(i) for i in range(n)]
        sat_paths = [sampler_like.sat_path(i) for i in range(n)]
        with Image.open(sat_paths[0]) as im:
            sat_raw_hw = (im.size[1], im.size[0])
        caches = {}
        for name, paths, hw in (("grd", grd_paths, cfg.grd_hw),
                                ("sat", sat_paths, sat_raw_hw)):
            prefix = os.path.join(args.cache_dir, f"KITTI_{tag}_{name}")
            caches[f"{name}_cache"] = build_or_open(paths, hw, prefix,
                                                    progress=True)
        return caches

    test_samplers = []
    for tf in test_files:
        if os.path.exists(tf):
            tindex = kitti.KittiIndex.load(root, tf, test=True)
            tsampler = kitti.KittiSampler(tindex, **kw)
            if args.cache_dir:
                for k, v in build_caches(tsampler,
                                         os.path.basename(tf)).items():
                    setattr(tsampler, k, v)
            test_samplers.append(tsampler)
        else:
            test_samplers.append(None)

    def eval_split(i, with_heading=False):
        sampler = test_samplers[i]
        if sampler is None:
            return None
        loader = pipeline.Loader(sampler,
                                 limit(np.arange(len(sampler.index))),
                                 args.batch_size, args.num_workers,
                                 multihost=True)
        return trainer.evaluate(loader, dev_eval, meter_per_pixel=mpp,
                                with_heading=with_heading)

    if training:
        index = kitti.KittiIndex.load(root, train_file, test=False)
        sampler = kitti.KittiSampler(index, device_augment=args.device_augment,
                                     **kw)
        if args.cache_dir:
            for k, v in build_caches(sampler, "train").items():
                setattr(sampler, k, v)
        if not (args.resume and trainer.resume()):
            if args.init_model_path:
                # warm-start fine-tuning from a reference-format checkpoint
                # (fresh optimizer moments, step 0; first save is orbax)
                trainer.load_torch_checkpoint(args.init_model_path)
            else:
                trainer.init_state(pretrained_b0=args.pretrained_b0 or None)
        rng = np.random.default_rng(0)
        if trainer.start_epoch:
            # resume position from the checkpoint's sidecar meta; burn the
            # completed epochs' shuffle draws so epoch k's order matches an
            # uninterrupted run (Generator.shuffle advances by length only)
            print(f"resuming at epoch {trainer.start_epoch}")
            for _ in range(trainer.start_epoch):
                rng.shuffle(limit(np.arange(len(index))))
        for epoch in range(trainer.start_epoch, args.epochs):
            sampler.set_epoch(epoch)  # fresh per-epoch augmentation draws
            order = limit(np.arange(len(index)))
            rng.shuffle(order)
            loader = pipeline.Loader(sampler, order, args.batch_size,
                                     args.num_workers, multihost=True,
                                     native_batch=args.native_loader or None,
                                     fast_decode=args.fast_decode or None)
            pps = trainer.train_epoch(loader, dev_train, epoch)
            print(f"epoch {epoch}: {pps:.1f} train pairs/s")
            for i in range(2):
                summary = eval_split(i)
                if summary:
                    print(f"epoch {epoch} test{i + 1}: {summary}")
                    trainer.write_epoch_results(epoch, summary,
                                                prefix=f"test{i + 1}_")
        print("Finished Training")
    else:
        if args.test_model_path.endswith(".pt"):
            trainer.load_torch_checkpoint(args.test_model_path)
        else:
            trainer.init_state()
            trainer.resume()
        results = {}
        for i in range(2):
            summary = eval_split(i, with_heading=True)
            if not summary:
                continue
            results[f"test{i + 1}"] = summary
            print("---------------------------------------")
            print(f"Test {i + 1} set")
            print("mean localization error (m): ", summary["mean_distance_m"])
            print("median localization error (m): ",
                  summary["median_distance_m"])
            print("mean orientation error (degrees): ",
                  summary.get("mean_orientation_deg"))
            print("median orientation error (degrees): ",
                  summary.get("median_orientation_deg"))
            for axis in ("lateral", "longitudinal"):
                print(f"{axis} recall <1/3/5 m: ",
                      [summary.get(f"{axis}_recall@{t}m") for t in (1, 3, 5)])
            print("orientation recall <1/3/5 deg: ",
                  [summary.get(f"orientation_recall@{t}deg")
                   for t in (1, 3, 5)])
        return results


if __name__ == "__main__":
    main()
