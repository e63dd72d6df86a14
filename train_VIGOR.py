#!/usr/bin/env python
"""VIGOR train/eval entry point — public surface mirrors the reference CLI
(``/root/reference/train_VIGOR.py:25-34``): ``--area --training --pos_only
-l -b --weight_ori --weight_infoNCE -f/--FoV --ori_noise``, plus framework
flags (dataset root lifted from the reference's hard-coded path, checkpoint
dir, workers, resume).

Training: 15 epochs Adam(1e-4), 80/20 split with the reference's seed,
per-epoch checkpoint + validation metrics.  Eval (``--training False``):
orientation-prior model (restricted matching bins), frozen test orientations
for unknown-orientation eval, limited-FoV panorama cropping.
"""

import argparse
import dataclasses
import os

import numpy as np


def parse_args(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--area", type=str, default="samearea",
                   help="samearea or crossarea")
    p.add_argument("--training", choices=("True", "False"), default="True")
    p.add_argument("--pos_only", choices=("True", "False"), default="True")
    p.add_argument("-l", "--learning_rate", type=float, default=1e-4)
    p.add_argument("-b", "--batch_size", type=int, default=8)
    p.add_argument("--weight_ori", type=float, default=1e1)
    p.add_argument("--weight_infoNCE", type=float, default=1e4)
    p.add_argument("-f", "--FoV", type=int, default=360)
    p.add_argument("--ori_noise", type=float, default=180.0,
                   help="orientation prior noise; 180 = unknown orientation")
    # framework flags
    p.add_argument("--dataset_root", type=str,
                   default=os.environ.get("VIGOR_ROOT", "datasets/VIGOR"))
    p.add_argument("--epochs", type=int, default=15)
    p.add_argument("--steps_per_epoch", type=int, default=0,
                   help="limit steps per epoch (0 = full epoch)")
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
                   default="models/VIGOR/samearea/model.pt",
                   help="torch or orbax checkpoint to evaluate")
    p.add_argument("--orientation_dir", type=str, default="",
                   help="directory holding *_orientation_test.npy fixtures "
                        "(default: the repo's fixtures/, which ships the "
                        "reference release files; falls back to cwd)")
    p.add_argument("--cache_dir", type=str, default="",
                   help="build/use preprocessed uint8 array caches "
                        "(decode-free input streaming)")
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
    p.add_argument("--bf16", action="store_true",
                   help="bfloat16 forward/backward (f32 master weights)")
    p.add_argument("--pretrained_b0", type=str, default="",
                   help="EfficientNet-B0 torch state_dict: a local path, or "
                        "'auto' to download+cache the release file; "
                        "both encoders start from it (the reference's "
                        "from_pretrained init)")
    p.add_argument("--bf16_params", action="store_true",
                   help="store resident weights in bfloat16 (f32 master in "
                        "the optimizer state; frees weight HBM)")
    p.add_argument("--remat", nargs="?", const="all", default="",
                   choices=("all", "encoder", "decoder"),
                   help="rematerialize the forward in the backward pass; "
                        "bare --remat checkpoints every block+stage, "
                        "--remat encoder/decoder restricts the scope")
    p.add_argument("--matching_impl", default="einsum",
                   choices=("einsum", "pallas", "reference"),
                   help="orientation-matching kernel (einsum is the "
                        "measured-best default; see ARCHITECTURE.md)")
    p.add_argument("--model_preset", type=str, default="VIGOR")
    return p.parse_args(argv)


def main(argv=None):
    ret = _main(argv)
    # explicit end-of-run barrier: on a pod every process leaves together
    # (after process 0's checkpoint finalize + results write) instead of
    # desyncing at JAX's implicit shutdown barrier — see
    # parallel/mesh.py::finalize_run and docs/SCALING.md
    from ccvpe_tpu.parallel import mesh as mesh_lib
    mesh_lib.finalize_run()
    return ret


def _main(argv=None):
    args = parse_args(argv)
    training = args.training == "True"
    pos_only = args.pos_only == "True"
    ori_noise = 18 * (args.ori_noise // 18)  # reference train_VIGOR.py:49
    label = f"{args.area}_HFoV{args.FoV}"
    circular = args.FoV == 360  # reference train_VIGOR.py:52-55

    from ccvpe_tpu.data import pipeline, vigor
    from ccvpe_tpu.models import cvm
    from ccvpe_tpu.parallel import mesh as mesh_lib
    from ccvpe_tpu.train.harness import Trainer
    from ccvpe_tpu.train.metrics import VIGOR_METER_PER_PIXEL

    from ccvpe_tpu.utils.platform import apply_env_platform
    apply_env_platform()  # CCVPE_PLATFORM pins the backend in-process
    # distributed init MUST precede any backend-initializing JAX call
    mesh_lib.maybe_init_distributed()
    from ccvpe_tpu.utils import compilation_cache
    compilation_cache.enable()
    if args.model_preset not in cvm.PRESETS:
        raise SystemExit(f"unknown --model_preset {args.model_preset!r}; "
                         f"choose from {sorted(cvm.PRESETS)}")
    cfg = dataclasses.replace(cvm.PRESETS[args.model_preset],
                              circular=circular)
    trainer = Trainer(
        cfg, learning_rate=args.learning_rate,
        weight_info_nce=args.weight_infoNCE, weight_ori=args.weight_ori,
        checkpoint_dir=args.checkpoint_dir or f"models/VIGOR/{label}",
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

    grd_hw, sat_hw = cfg.grd_hw, cfg.sat_hw

    def build_caches(index, tag):
        if not args.cache_dir:
            return {}
        from ccvpe_tpu.data.cache import build_or_open

        caches = {}
        for name, paths, hw in (("grd", index.grd_paths, grd_hw),
                                ("sat", index.sat_paths, sat_hw)):
            prefix = os.path.join(args.cache_dir, f"{args.area}_{tag}_{name}")
            caches[f"{name}_cache"] = build_or_open(paths, hw, prefix,
                                                    progress=True)
        return caches

    def crop_fov(batch):
        if args.FoV < 360:
            w = int(batch["grd"].shape[2] * args.FoV / 360)
            batch = dict(batch, grd=batch["grd"][:, :, :w])
        return batch

    if training:
        index = vigor.VigorIndex.load(args.dataset_root, args.area, True)
        sampler = vigor.VigorSampler(index, pos_only=pos_only,
                                     ori_noise=ori_noise, grd_hw=grd_hw,
                                     sat_hw=sat_hw,
                                     **build_caches(index, "train"))
        train_idx, val_idx = pipeline.train_val_split(len(index))
        if args.steps_per_epoch:
            train_idx = train_idx[:args.steps_per_epoch * args.batch_size]
            val_idx = val_idx[:args.steps_per_epoch * args.batch_size]

        if not (args.resume and trainer.resume()):
            if args.init_model_path:
                # warm-start fine-tuning from a reference-format checkpoint
                # (fresh optimizer moments, step 0; first save is orbax)
                trainer.load_torch_checkpoint(args.init_model_path)
            else:
                trainer.init_state(pretrained_b0=args.pretrained_b0 or None)
        rng = np.random.default_rng(0)

        dev_train = lambda raw: crop_fov(vigor.device_batch(
            raw, train=True, sat_hw=sat_hw, bins=cfg.bins))
        dev_eval = lambda raw: crop_fov(vigor.device_batch(
            raw, train=False, sat_hw=sat_hw, bins=cfg.bins))

        if trainer.start_epoch:
            # resume position from the checkpoint's sidecar meta; burn the
            # completed epochs' shuffle draws so epoch k's order matches an
            # uninterrupted run (Generator.shuffle advances by length only)
            print(f"resuming at epoch {trainer.start_epoch}")
            for _ in range(trainer.start_epoch):
                rng.shuffle(train_idx.copy())
        for epoch in range(trainer.start_epoch, args.epochs):
            sampler.set_epoch(epoch)  # fresh per-epoch augmentation draws
            order = train_idx.copy()
            rng.shuffle(order)
            loader = pipeline.Loader(sampler, order, args.batch_size,
                                     args.num_workers, multihost=True,
                                     native_batch=args.native_loader or None,
                                     fast_decode=args.fast_decode or None)
            pps = trainer.train_epoch(loader, dev_train, epoch)
            print(f"epoch {epoch}: {pps:.1f} train pairs/s")
            val_loader = pipeline.Loader(sampler, val_idx, args.batch_size,
                                         args.num_workers, multihost=True)
            summary = trainer.evaluate(val_loader, dev_eval,
                                       meter_per_pixel=None,
                                       cities_to_mpp=VIGOR_METER_PER_PIXEL)
            print(f"epoch {epoch} validation: {summary}")
            trainer.write_epoch_results(epoch, summary)
        print("Finished Training")
    else:
        random_orientation = None
        if ori_noise == 180:  # reference train_VIGOR.py:73-79
            base = f"{args.area}_orientation_test.npy"
            # the exact release fixtures ship in fixtures/ (SURVEY.md §2 T8)
            shipped = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                   "fixtures", base)
            candidates = ([os.path.join(args.orientation_dir, base)]
                          if args.orientation_dir else [shipped, base])
            fname = next((c for c in candidates if os.path.exists(c)), None)
            if fname is None:
                raise SystemExit(
                    f"frozen orientation fixture {base} not found in "
                    f"{candidates}; pass --orientation_dir (or --ori_noise "
                    "< 180 for a known-orientation prior)")
            random_orientation = np.load(fname)
        index = vigor.VigorIndex.load(args.dataset_root, args.area, False)
        sampler = vigor.VigorSampler(index, pos_only=pos_only,
                                     ori_noise=ori_noise,
                                     random_orientation=random_orientation,
                                     grd_hw=grd_hw, sat_hw=sat_hw,
                                     **build_caches(index, "test"))
        if args.test_model_path.endswith(".pt"):
            trainer.load_torch_checkpoint(args.test_model_path)
        else:
            trainer.init_state()
            trainer.resume()

        n = int(ori_noise / 18)
        loc_offsets = tuple(range(-n, n + 1))  # reference models.py:489
        indices = np.arange(len(index))
        if args.steps_per_epoch:
            indices = indices[:args.steps_per_epoch * args.batch_size]
        loader = pipeline.Loader(sampler, indices, args.batch_size,
                                 args.num_workers, multihost=True)
        dev_eval = lambda raw: crop_fov(vigor.device_batch(
            raw, train=False, sat_hw=sat_hw, bins=cfg.bins))
        summary = trainer.evaluate(loader, dev_eval, meter_per_pixel=None,
                                   cities_to_mpp=VIGOR_METER_PER_PIXEL,
                                   loc_offsets=loc_offsets)
        print("mean localization error (m): ", summary["mean_distance_m"])
        print("median localization error (m): ", summary["median_distance_m"])
        print("---------------------------------------")
        print("mean orientation error (degrees): ",
              summary.get("mean_orientation_deg"))
        print("median orientation error (degrees): ",
              summary.get("median_orientation_deg"))
        print("---------------------------------------")
        print("mean probability at gt", summary.get("mean_probability_at_gt"))
        print("median probability at gt",
              summary.get("median_probability_at_gt"))
        return summary


if __name__ == "__main__":
    main()
