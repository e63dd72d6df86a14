#!/usr/bin/env python
"""Qualitative visualization for one VIGOR test sample — heatmap overlay
(log-scaled), GT/predicted markers, and the dense orientation field as a
quiver plot, mirroring the reference visualizer
(``/root/reference/visualize_qualitative_results_VIGOR.py:22-26,120-153``)."""

import argparse
import os

import numpy as np


def parse_args(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--area", type=str, default="samearea")
    p.add_argument("--pos_only", choices=("True", "False"), default="True")
    p.add_argument("--ori_noise", type=float, default=180.0)
    p.add_argument("--idx", type=int, default=0)
    p.add_argument("--dataset_root", type=str,
                   default=os.environ.get("VIGOR_ROOT", "datasets/VIGOR"))
    p.add_argument("--test_model_path", type=str,
                   default="models/VIGOR/samearea/model.pt")
    p.add_argument("--orientation_dir", type=str, default=".")
    p.add_argument("--out", type=str, default="qualitative_result.png")
    p.add_argument("--model_preset", type=str, default="VIGOR")
    return p.parse_args(argv)


def main(argv=None):
    args = parse_args(argv)
    from ccvpe_tpu.utils.platform import apply_env_platform
    apply_env_platform()  # CCVPE_PLATFORM pins the backend in-process
    import jax

    from ccvpe_tpu.data import vigor
    from ccvpe_tpu.models import cvm
    from ccvpe_tpu.train import loop as train_loop

    ori_noise = 18 * (args.ori_noise // 18)
    random_orientation = None
    if ori_noise == 180:
        fname = os.path.join(args.orientation_dir,
                             f"{args.area}_orientation_test.npy")
        if os.path.exists(fname):
            random_orientation = np.load(fname)

    cfg = cvm.PRESETS[args.model_preset]
    index = vigor.VigorIndex.load(args.dataset_root, args.area, False)
    sampler = vigor.VigorSampler(index, pos_only=args.pos_only == "True",
                                 ori_noise=ori_noise,
                                 random_orientation=random_orientation,
                                 grd_hw=cfg.grd_hw, sat_hw=cfg.sat_hw)
    sample = sampler(args.idx)
    from ccvpe_tpu.data.pipeline import collate
    raw = collate([sample])
    batch = vigor.device_batch(raw, train=False, sat_hw=cfg.sat_hw,
                               bins=cfg.bins)

    if args.test_model_path and os.path.exists(args.test_model_path):
        from ccvpe_tpu.io.torch_import import import_cvm, load_state_dict
        params, bn_state = import_cvm(load_state_dict(args.test_model_path))
    else:
        print(f"checkpoint {args.test_model_path!r} not found; "
              "using random weights")
        params, bn_state = cvm.init(jax.random.PRNGKey(0), cfg)
    n = int(ori_noise / 18)
    eval_step = jax.jit(train_loop.make_eval_step(
        cfg, loc_offsets=tuple(range(-n, n + 1))))
    out = eval_step(params, bn_state, batch["grd"], batch["sat"])

    from ccvpe_tpu.visualize import render

    heatmap = np.asarray(out.heatmap)[0, :, :, 0]
    ori = np.asarray(out.ori)[0]
    gt = np.asarray(batch["gt"])[0]
    loc_pred, loc_gt = render(raw["sat"][0], heatmap, ori, gt, args.out)
    print(f"saved {args.out}; pred={loc_pred} gt={loc_gt}")


if __name__ == "__main__":
    main()
