#!/usr/bin/env python
"""Oxford RobotCar train/eval entry point — mirrors the reference CLI
(``/root/reference/train_OxfordRobotCar.py:26-31``): ``--training -l -b
--weight_ori --weight_infoNCE``.  Training runs 50 epochs with per-epoch
validation; ``--training False`` evaluates the three test traversals
separately (streaming per-frame pose, reference ``:74-83, 209-397``)."""

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
    # framework flags
    p.add_argument("--grd_image_root", type=str,
                   default=os.environ.get("OXFORD_ROOT",
                                          "datasets/Oxford_5m_sampling/"))
    p.add_argument("--sat_path", type=str, default="")
    p.add_argument("--epochs", type=int, default=50)
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
                   default="models/OxfordRobotCar/model.pt")
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
                   help="build/use a preprocessed uint8 cache of the ground "
                        "frames (the aerial side is already one in-memory "
                        "map)")
    p.add_argument("--matching_impl", default="einsum",
                   choices=("einsum", "pallas", "reference"),
                   help="orientation-matching kernel (einsum is the "
                        "measured-best default; see ARCHITECTURE.md)")
    p.add_argument("--model_preset", type=str, default="OxfordRobotCar")
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
    label = "OxfordRobotCar"
    sat_path = args.sat_path or os.path.join(args.grd_image_root,
                                             "satellite_map_new.png")

    from ccvpe_tpu.data import oxford, pipeline
    from ccvpe_tpu.models import cvm
    from ccvpe_tpu.parallel import mesh as mesh_lib
    from ccvpe_tpu.train.harness import Trainer
    from ccvpe_tpu.train.metrics import OXFORD_METER_PER_PIXEL

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
        checkpoint_dir=args.checkpoint_dir or f"models/OxfordRobotCar/{label}",
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

    dev_train = lambda raw: oxford.device_batch(
        raw, train=True, sat_hw=cfg.sat_hw, bins=cfg.bins)
    dev_eval = lambda raw: oxford.device_batch(
        raw, train=False, sat_hw=cfg.sat_hw, bins=cfg.bins)

    def limit(idx):
        if args.steps_per_epoch:
            return idx[:args.steps_per_epoch * args.batch_size]
        return idx

    def grd_cache_for(sampler, tag):
        if not args.cache_dir:
            return None
        from ccvpe_tpu.data.cache import build_or_open

        paths = [sampler.grd_path(i) for i in range(len(sampler.index))]
        prefix = os.path.join(args.cache_dir, f"Oxford_{tag}_grd")
        return build_or_open(paths, cfg.grd_hw, prefix, progress=True)

    if training:
        train_index = oxford.OxfordIndex.load(args.grd_image_root, sat_path,
                                              "train")
        val_index = oxford.OxfordIndex.load(args.grd_image_root, sat_path,
                                            "val")
        train_sampler = oxford.OxfordSampler(train_index, grd_hw=cfg.grd_hw,
                                             sat_hw=cfg.sat_hw)
        train_sampler.grd_cache = grd_cache_for(train_sampler, "train")
        val_sampler = oxford.OxfordSampler(val_index, grd_hw=cfg.grd_hw,
                                           sat_hw=cfg.sat_hw)
        val_sampler.grd_cache = grd_cache_for(val_sampler, "val")
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
                rng.shuffle(limit(np.arange(len(train_index))))
        for epoch in range(trainer.start_epoch, args.epochs):
            train_sampler.set_epoch(epoch)  # fresh per-epoch augmentation draws
            order = limit(np.arange(len(train_index)))
            rng.shuffle(order)
            loader = pipeline.Loader(train_sampler, order, args.batch_size,
                                     args.num_workers, multihost=True,
                                     native_batch=args.native_loader or None,
                                     fast_decode=args.fast_decode or None)
            pps = trainer.train_epoch(loader, dev_train, epoch)
            print(f"epoch {epoch}: {pps:.1f} train pairs/s")
            val_loader = pipeline.Loader(val_sampler,
                                         limit(np.arange(len(val_index))),
                                         args.batch_size, args.num_workers,
                                         multihost=True)
            summary = trainer.evaluate(val_loader, dev_eval,
                                       meter_per_pixel=OXFORD_METER_PER_PIXEL)
            print(f"epoch {epoch} validation: {summary}")
            trainer.write_epoch_results(epoch, summary)
        print("Finished Training")
    else:
        index = oxford.OxfordIndex.load(args.grd_image_root, sat_path, "test")
        sampler = oxford.OxfordSampler(index, grd_hw=cfg.grd_hw,
                                       sat_hw=cfg.sat_hw)
        sampler.grd_cache = grd_cache_for(sampler, "test")
        if args.test_model_path.endswith(".pt"):
            trainer.load_torch_checkpoint(args.test_model_path)
        else:
            trainer.init_state()
            trainer.resume()
        results = {}
        start = 0
        for t, length in enumerate(index.traversal_lengths, 1):
            idx = limit(np.arange(start, start + length))
            start += length
            loader = pipeline.Loader(sampler, idx, args.batch_size,
                                     args.num_workers, multihost=True)
            summary = trainer.evaluate(loader, dev_eval,
                                       meter_per_pixel=OXFORD_METER_PER_PIXEL,
                                       with_heading=True)
            results[f"test{t}"] = summary
            # the reference's full per-traversal metric contract
            # (``/root/reference/train_OxfordRobotCar.py:250-266``): mean/
            # median localization, per-axis mean/median + <1/3/5 m recalls,
            # orientation mean/median + <1/3/5 deg recalls
            print("---------------------------------------")
            print(f"Test traversal {t}")
            print("mean error (m): ", summary["mean_distance_m"])
            print("median error (m): ", summary["median_distance_m"])
            print("mean longitudinal error (m): ",
                  summary.get("mean_longitudinal_m"))
            print("median longitudinal error (m): ",
                  summary.get("median_longitudinal_m"))
            print("mean lateral error (m): ", summary.get("mean_lateral_m"))
            print("median lateral error (m): ", summary.get("median_lateral_m"))
            print("mean orientation error (deg): ",
                  summary.get("mean_orientation_deg"))
            print("median orientation error (deg): ",
                  summary.get("median_orientation_deg"))
            print("percentage of samples with longitudinal localization "
                  "error under 1m, 3m, and 5m: ",
                  summary.get("longitudinal_recall@1m"),
                  summary.get("longitudinal_recall@3m"),
                  summary.get("longitudinal_recall@5m"))
            print("percentage of samples with lateral localization error "
                  "under 1m, 3m, and 5m: ",
                  summary.get("lateral_recall@1m"),
                  summary.get("lateral_recall@3m"),
                  summary.get("lateral_recall@5m"))
            print("percentage of samples with orientation error under "
                  "1 degree, 3 degrees, and 5 degrees: ",
                  summary.get("orientation_recall@1deg"),
                  summary.get("orientation_recall@3deg"),
                  summary.get("orientation_recall@5deg"))
            print("throughput (pairs/s): ", summary["pairs_per_sec"])
        return results


if __name__ == "__main__":
    main()
