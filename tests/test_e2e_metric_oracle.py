"""End-to-end metric-level oracle: the reference's *actual eval loop*
(torch model + reference Dataset + verbatim metric math) vs this framework's
CLI eval (`train_*.main(--training False)`) on a shared synthetic root with
shared imported weights.

Per-layer parity (model forward/backward, dataset samples, loss values,
metric formulas) is proven elsewhere; this composes them: the full
`index parse -> loader -> device batch -> jitted eval -> metric summary`
pipeline must reproduce the reference's metric dict, which is the strongest
released-checkpoint stand-in available offline (VERDICT r2 item 1).

Reference loops mirrored verbatim:
  VIGOR:  /root/reference/train_VIGOR.py:265-338
  KITTI:  /root/reference/train_KITTI.py:296-360
  Oxford: /root/reference/train_OxfordRobotCar.py:209-266 (x3 traversals)
"""

import math
import os

import numpy as np
import pytest
from PIL import Image

# e2e oracles drive full CLI eval loops (slow tier; run with --runslow)
pytestmark = pytest.mark.slow

_MEAN = np.array([0.485, 0.456, 0.406], np.float32)
_STD = np.array([0.229, 0.224, 0.225], np.float32)


def _write_img(path, hw, seed):
    os.makedirs(os.path.dirname(path), exist_ok=True)
    Image.fromarray(np.random.default_rng(seed).integers(
        0, 255, (*hw, 3), dtype=np.uint8)).save(path)


def _torch_transform(torch, hw):
    """transforms.Compose([Resize(hw), ToTensor(), Normalize(imagenet)])
    without a torchvision dependency (reference ``train_VIGOR.py:57-70``,
    ``train_KITTI.py:62-73``); images are stored at the target size so the
    resize is the identity on both sides."""

    def t(img):
        if img.size != (hw[1], hw[0]):
            img = img.resize((hw[1], hw[0]), Image.BILINEAR)
        x = np.asarray(img, np.float32) / 255.0
        x = (x - _MEAN) / _STD
        return torch.from_numpy(np.ascontiguousarray(x.transpose(2, 0, 1)))

    return t


def _recover_angle(cos_v, sin_v):
    """acos + sin-sign disambiguation (reference ``train_VIGOR.py:311-326``)."""
    a = math.acos(cos_v)
    return math.degrees(-a) % 360 if sin_v < 0 else math.degrees(a)


@pytest.fixture(scope="module")
def ref_env(torch_oracle):
    """Reference models importable offline (from_pretrained -> from_name)."""
    torch = torch_oracle
    import sys
    from unittest.mock import MagicMock

    sys.modules.setdefault("torchvision.transforms.functional", MagicMock())
    import efficientnet_pytorch.model as enm

    orig = enm.EfficientNet.from_pretrained

    def _from_name(cls, model_name, circular, **kw):
        return cls.from_name(model_name, circular)

    enm.EfficientNet.from_pretrained = classmethod(_from_name)
    import datasets as ref_datasets
    import models as reference_models

    yield torch, reference_models, ref_datasets
    enm.EfficientNet.from_pretrained = orig


# ---------------------------------------------------------------------------
# VIGOR
# ---------------------------------------------------------------------------


@pytest.fixture(scope="module")
def vigor_fullsize_root(tmp_path_factory):
    """Synthetic VIGOR root with images at the reference's processed sizes
    (panorama 320x640, satellite 512x512) so both pipelines see identical
    pixels."""
    root = str(tmp_path_factory.mktemp("vigor_e2e"))
    rng = np.random.default_rng(7)
    # str hash() is salted per process (PYTHONHASHSEED) — seed images by a
    # deterministic counter so the parity inputs reproduce across runs
    for ci, city in enumerate(["NewYork", "Seattle", "SanFrancisco",
                               "Chicago"]):
        sats = [f"s{i}.png" for i in range(3)]
        os.makedirs(os.path.join(root, "splits_new", city), exist_ok=True)
        with open(os.path.join(root, "splits_new", city,
                               "satellite_list.txt"), "w") as f:
            f.write("\n".join(sats) + "\n")
        for si, s in enumerate(sats):
            _write_img(os.path.join(root, city, "satellite", s), (512, 512),
                       1000 + 10 * ci + si)
        lines = []
        for j in range(2):
            pano = f"p{j}.png"
            _write_img(os.path.join(root, city, "panorama", pano), (320, 640),
                       2000 + 10 * ci + j)
            fields = [pano]
            for k in range(4):
                fields += [sats[(j + k) % 3],
                           str(rng.uniform(-200, 200)),
                           str(rng.uniform(-200, 200))]
            lines.append(" ".join(fields))
        with open(os.path.join(root, "splits_new", city,
                               "same_area_balanced_test.txt"), "w") as f:
            f.write("\n".join(lines) + "\n")
    return root


def test_vigor_e2e_metric_oracle(ref_env, vigor_fullsize_root, tmp_path):
    torch, rm, ref_datasets = ref_env
    from torch.utils.data import DataLoader

    root = vigor_fullsize_root
    n = 8
    frozen = np.concatenate([[5.0, 350.0, 123.4, 342.1],
                             np.linspace(30, 300, n - 4)])
    odir = tmp_path / "orient"
    odir.mkdir()
    np.save(odir / "samearea_orientation_test.npy", frozen)

    # -- reference side: model + dataset + the verbatim eval loop ----------
    torch.manual_seed(17)
    model = rm.CVM_VIGOR_ori_prior("cpu", 180, circular_padding=True)
    model.eval()
    pt_path = str(tmp_path / "model.pt")
    torch.save(model.state_dict(), pt_path)

    ds = ref_datasets.VIGORDataset(
        root=root, split="samearea", train=False, pos_only=True,
        transform=(_torch_transform(torch, (320, 640)),
                   _torch_transform(torch, (512, 512))),
        ori_noise=180, random_orientation=frozen)
    assert len(ds) == n
    loader = DataLoader(ds, batch_size=4, shuffle=False)

    distance_in_meters, orientation_error, probability_at_gt = [], [], []
    mpp = {"NewYork": 0.113248, "Seattle": 0.100817,
           "SanFrancisco": 0.118141, "Chicago": 0.111262}
    with torch.no_grad():
        for data in loader:  # train_VIGOR.py:265-338
            grd, sat, gt, gt_with_ori, gt_orientation, city, _angle = data
            heatmap_t, ori_t = model(grd, sat)[1:3]
            gt_np = gt.numpy()
            gt_ori_np = gt_orientation.numpy()
            heatmap = heatmap_t.numpy()
            ori = ori_t.numpy()
            for b in range(gt_np.shape[0]):
                cur_gt = gt_np[b]
                loc_gt = np.unravel_index(cur_gt.argmax(), cur_gt.shape)
                cur_pred = heatmap[b]
                loc_pred = np.unravel_index(cur_pred.argmax(), cur_pred.shape)
                pix = np.sqrt((loc_gt[1] - loc_pred[1]) ** 2
                              + (loc_gt[2] - loc_pred[2]) ** 2)
                distance_in_meters.append(pix * mpp[city[b]] / 512 * 640)
                cos_p, sin_p = ori[b, :, loc_pred[1], loc_pred[2]]
                if abs(cos_p) <= 1 and abs(sin_p) <= 1:
                    ang_p = _recover_angle(cos_p, sin_p)
                    cos_g, sin_g = gt_ori_np[b, :, loc_gt[1], loc_gt[2]]
                    ang_g = _recover_angle(cos_g, sin_g)
                    d = abs(ang_g - ang_p)
                    orientation_error.append(min(d, 360 - d))
                probability_at_gt.append(heatmap[b, 0, loc_gt[1], loc_gt[2]])

    want = {
        "mean_distance_m": np.mean(distance_in_meters),
        "median_distance_m": np.median(distance_in_meters),
        "mean_orientation_deg": np.mean(orientation_error),
        "median_orientation_deg": np.median(orientation_error),
        "mean_probability_at_gt": np.mean(probability_at_gt),
        "median_probability_at_gt": np.median(probability_at_gt),
    }

    # -- framework side: the real CLI eval, same weights, same root --------
    import train_VIGOR

    got = train_VIGOR.main([
        "--dataset_root", root,
        "--training", "False",
        "--ori_noise", "180",
        "-b", "4",
        "--test_model_path", pt_path,
        "--orientation_dir", str(odir),
        "--results_dir", str(tmp_path / "res"),
        "--checkpoint_dir", str(tmp_path / "ck"),
        "--num_workers", "2",
    ])

    assert len(orientation_error) == n  # the guard excluded nothing
    for key, val in want.items():
        np.testing.assert_allclose(
            got[key], val, rtol=2e-3, atol=2e-3,
            err_msg=f"metric {key}: reference {val} vs framework {got[key]}")


def test_vigor_fov180_e2e_metric_oracle(ref_env, vigor_fullsize_root,
                                        tmp_path):
    """Limited-FoV eval (BASELINE 'unknown orientation, HFoV 180'): the
    reference crops the panorama width to FoV/360 and disables circular
    padding (``train_VIGOR.py:52-55,272-273``); the CLI's --FoV path must
    reproduce the same metric dict."""
    torch, rm, ref_datasets = ref_env
    from torch.utils.data import DataLoader

    root = vigor_fullsize_root
    n = 8
    frozen = np.linspace(10, 340, n)
    odir = tmp_path / "orient"
    odir.mkdir()
    np.save(odir / "samearea_orientation_test.npy", frozen)

    torch.manual_seed(23)
    model = rm.CVM_VIGOR_ori_prior("cpu", 180, circular_padding=False)
    model.eval()
    pt_path = str(tmp_path / "model_fov.pt")
    torch.save(model.state_dict(), pt_path)

    ds = ref_datasets.VIGORDataset(
        root=root, split="samearea", train=False, pos_only=True,
        transform=(_torch_transform(torch, (320, 640)),
                   _torch_transform(torch, (512, 512))),
        ori_noise=180, random_orientation=frozen)
    loader = DataLoader(ds, batch_size=4, shuffle=False)

    distance_in_meters, probability_at_gt = [], []
    mpp = {"NewYork": 0.113248, "Seattle": 0.100817,
           "SanFrancisco": 0.118141, "Chicago": 0.111262}
    with torch.no_grad():
        for data in loader:
            grd, sat, gt, _gwo, _gto, city, _angle = data
            grd_width = int(grd.size()[3] * 180 / 360)  # :272-273
            heatmap = model(grd[:, :, :, :grd_width], sat)[1].numpy()
            gt_np = gt.numpy()
            for b in range(gt_np.shape[0]):
                cur_gt = gt_np[b]
                loc_gt = np.unravel_index(cur_gt.argmax(), cur_gt.shape)
                cur_pred = heatmap[b]
                loc_pred = np.unravel_index(cur_pred.argmax(), cur_pred.shape)
                pix = np.sqrt((loc_gt[1] - loc_pred[1]) ** 2
                              + (loc_gt[2] - loc_pred[2]) ** 2)
                distance_in_meters.append(pix * mpp[city[b]] / 512 * 640)
                probability_at_gt.append(heatmap[b, 0, loc_gt[1], loc_gt[2]])

    import train_VIGOR

    got = train_VIGOR.main([
        "--dataset_root", root,
        "--training", "False",
        "--ori_noise", "180",
        "--FoV", "180",
        "-b", "4",
        "--test_model_path", pt_path,
        "--orientation_dir", str(odir),
        "--results_dir", str(tmp_path / "res"),
        "--checkpoint_dir", str(tmp_path / "ck"),
        "--num_workers", "2",
    ])
    np.testing.assert_allclose(got["mean_distance_m"],
                               np.mean(distance_in_meters),
                               rtol=2e-3, atol=2e-3)
    np.testing.assert_allclose(got["median_distance_m"],
                               np.median(distance_in_meters),
                               rtol=2e-3, atol=2e-3)
    np.testing.assert_allclose(got["mean_probability_at_gt"],
                               np.mean(probability_at_gt),
                               rtol=2e-3, atol=1e-6)


# ---------------------------------------------------------------------------
# KITTI
# ---------------------------------------------------------------------------


@pytest.fixture(scope="module")
def kitti_fullsize_root(tmp_path_factory):
    """Synthetic KITTI root: 4 deterministic test frames (shift/rotation read
    from the file columns, reference ``datasets.py:540-638``)."""
    root = str(tmp_path_factory.mktemp("kitti_e2e"))
    drive = "2011_09_26/2011_09_26_drive_0001_sync/"
    rng = np.random.default_rng(3)
    lines = []
    for i in range(4):
        name = f"{drive}{i:010d}.png"
        _write_img(os.path.join(root, "satmap", name), (512, 512), 100 + i)
        _write_img(os.path.join(root, "raw_data", drive, "image_02/data",
                                f"{i:010d}.png"), (375, 1242), 200 + i)
        oxts = os.path.join(root, "raw_data", drive, "oxts/data",
                            f"{i:010d}.txt")
        os.makedirs(os.path.dirname(oxts), exist_ok=True)
        with open(oxts, "w") as f:
            f.write(f"49.0{i} 8.4{i} 112.99 0.01 0.01 "
                    f"{0.1 * (i + 1):.2f} " + "0.0 " * 24 + "\n")
        lines.append(f"{name} {rng.uniform(-1, 1):.3f} "
                     f"{rng.uniform(-1, 1):.3f} {rng.uniform(-1, 1):.3f}")
    for fname in ("test1_files.txt", "test2_files.txt"):
        with open(os.path.join(root, fname), "w") as f:
            f.write("\n".join(lines) + "\n")
    return root


def test_kitti_e2e_metric_oracle(ref_env, kitti_fullsize_root, tmp_path):
    torch, rm, ref_datasets = ref_env
    import importlib
    import sys
    from unittest.mock import MagicMock

    from torch.utils.data import DataLoader

    # datasets.TF.center_crop must be real for the KITTI affine chain
    tvf = MagicMock()

    def _center_crop(img, size):
        w, h = img.size
        left = int(round((w - size) / 2.0))
        top = int(round((h - size) / 2.0))
        return img.crop((left, top, left + size, top + size))

    tvf.center_crop = _center_crop
    sys.modules["torchvision.transforms.functional"] = tvf
    sys.modules["torchvision"].transforms.functional = tvf
    importlib.reload(ref_datasets)

    root = kitti_fullsize_root
    rotation_range = 10.0

    torch.manual_seed(17)
    model = rm.CVM_KITTI("cpu")
    model.eval()
    pt_path = str(tmp_path / "model_kitti.pt")
    torch.save(model.state_dict(), pt_path)

    test_set = ref_datasets.SatGrdDatasetTest(
        root=root, file=os.path.join(root, "test1_files.txt"),
        transform=(_torch_transform(torch, (512, 512)),
                   _torch_transform(torch, (256, 1024))),
        shift_range_lat=20, shift_range_lon=20,
        rotation_range=rotation_range)
    loader = DataLoader(test_set, batch_size=2, shuffle=False)

    distance_in_meters, orientation_error = [], []
    lateral_m, longitudinal_m = [], []
    with torch.no_grad():
        for data in loader:  # train_KITTI.py:296-346
            sat, grd, gt, gt_with_ori, gt_orientation, orientation_angle = \
                data
            heatmap_t, ori_t = model(grd, sat)[1:3]
            gt_np = gt.numpy()
            ang_np = orientation_angle.numpy()
            gt_ori_np = gt_orientation.numpy()
            heatmap = heatmap_t.numpy()
            ori = ori_t.numpy()
            for b in range(gt_np.shape[0]):
                from_north = ang_np[b]
                cur_gt = gt_np[b]
                loc_gt = np.unravel_index(cur_gt.argmax(), cur_gt.shape)
                cur_pred = heatmap[b]
                loc_pred = np.unravel_index(cur_pred.argmax(), cur_pred.shape)
                pix = np.sqrt((loc_gt[1] - loc_pred[1]) ** 2
                              + (loc_gt[2] - loc_pred[2]) ** 2)
                distance_in_meters.append(pix * test_set.meter_per_pixel)
                gt2pred = np.arctan2(abs(loc_gt[2] - loc_pred[2]),
                                     abs(loc_gt[1] - loc_pred[1])) \
                    * 180 / math.pi
                angle_diff = np.abs(from_north - gt2pred)
                longitudinal_m.append(
                    abs(np.cos(angle_diff * np.pi / 180) * pix)
                    * test_set.meter_per_pixel)
                lateral_m.append(
                    abs(np.sin(angle_diff * np.pi / 180) * pix)
                    * test_set.meter_per_pixel)
                cos_p, sin_p = ori[b, :, loc_pred[1], loc_pred[2]]
                if abs(cos_p) <= 1 and abs(sin_p) <= 1:
                    ang_p = _recover_angle(cos_p, sin_p)
                    cos_g, sin_g = gt_ori_np[b, :, loc_gt[1], loc_gt[2]]
                    ang_g = _recover_angle(cos_g, sin_g)
                    d = abs(ang_g - ang_p)
                    orientation_error.append(min(d, 360 - d))

    lateral_m = np.asarray(lateral_m)
    longitudinal_m = np.asarray(longitudinal_m)
    ori_err = np.asarray(orientation_error)
    want = {
        "mean_distance_m": np.mean(distance_in_meters),
        "median_distance_m": np.median(distance_in_meters),
        "mean_orientation_deg": np.mean(ori_err),
        "median_orientation_deg": np.median(ori_err),
    }
    for t in (1, 3, 5):
        want[f"lateral_recall@{t}m"] = np.sum(lateral_m < t) / len(lateral_m)
        want[f"longitudinal_recall@{t}m"] = (np.sum(longitudinal_m < t)
                                             / len(longitudinal_m))
        want[f"orientation_recall@{t}deg"] = np.sum(ori_err < t) / len(ori_err)

    import train_KITTI

    results = train_KITTI.main([
        "--dataset_root", root,
        "--training", "False",
        "-b", "2",
        "--rotation_range", "10",
        "--test_model_path", pt_path,
        "--results_dir", str(tmp_path / "res"),
        "--checkpoint_dir", str(tmp_path / "ck"),
        "--num_workers", "2",
    ])
    got = results["test1"]

    assert len(orientation_error) == 4
    for key, val in want.items():
        np.testing.assert_allclose(
            got[key], val, rtol=2e-3, atol=2e-3,
            err_msg=f"metric {key}: reference {val} vs framework {got[key]}")
    # test2 is the same file list -> identical summary
    np.testing.assert_allclose(results["test2"]["mean_distance_m"],
                               got["mean_distance_m"], rtol=1e-6)


# ---------------------------------------------------------------------------
# Oxford RobotCar
# ---------------------------------------------------------------------------


@pytest.fixture(scope="module")
def oxford_root(tmp_path_factory):
    """Synthetic Oxford root: one stitched map + 6 test frames split over
    the 3 traversal files (reference ``datasets.py:217-244``)."""
    root = str(tmp_path_factory.mktemp("oxford_e2e")) + "/"
    _write_img(root + "satellite_map_new.png", (2400, 2400), 9)
    n = 6
    lines = [f"g{i}.png 0 {619400 + 30 * i}.0 {5735300 + 20 * i}.0"
             for i in range(n)]
    for i, t in enumerate(("test1_j.txt", "test2_j.txt", "test3_j.txt")):
        with open(root + t, "w") as f:
            f.write("\n".join(lines[2 * i:2 * i + 2]) + "\n")
    np.save(root + "test_yaw.npy", np.linspace(0.2, 5, n))
    for i in range(n):
        _write_img(root + f"g{i}.png", (77, 115), 20 + i)
    return root


def test_oxford_e2e_metric_oracle(ref_env, oxford_root, tmp_path):
    torch, rm, ref_datasets = ref_env
    from torch.utils.data import DataLoader, Subset

    root = oxford_root
    torch.manual_seed(17)
    model = rm.CVM_OxfordRobotCar("cpu")
    model.eval()
    pt_path = str(tmp_path / "model_oxford.pt")
    torch.save(model.state_dict(), pt_path)

    ds = ref_datasets.OxfordRobotCarDataset(
        root, root + "satellite_map_new.png", split="test",
        transform=(_torch_transform(torch, (154, 231)),
                   _torch_transform(torch, (512, 512))))
    assert ds.grdNum == 6
    bounds = [0, ds.test1_len, ds.test1_len + ds.test2_len, ds.grdNum]
    mpp = 0.09240351462361521  # train_OxfordRobotCar.py:204

    def ref_traversal_metrics(lo, hi):
        loader = DataLoader(Subset(ds, np.arange(lo, hi)), batch_size=2,
                            shuffle=False)
        dist_px, lon_px, lat_px, ori_err = [], [], [], []
        with torch.no_grad():
            for data in loader:  # train_OxfordRobotCar.py:209-246
                grd, sat, gt, gt_with_ori, gt_orientation, angle = data
                heatmap_t, ori_t = model(grd, sat)[1:3]
                gt_np = gt.numpy()
                ang_np = angle.numpy()
                gt_ori_np = gt_orientation.numpy()
                heatmap = heatmap_t.numpy()
                ori = ori_t.numpy()
                for b in range(gt_np.shape[0]):
                    cur_gt = gt_np[b]
                    loc_gt = np.unravel_index(cur_gt.argmax(), cur_gt.shape)
                    cur_pred = heatmap[b]
                    loc_pred = np.unravel_index(cur_pred.argmax(),
                                                cur_pred.shape)
                    pix = np.sqrt((loc_gt[1] - loc_pred[1]) ** 2
                                  + (loc_gt[2] - loc_pred[2]) ** 2)
                    dist_px.append(pix)
                    gt2pred = np.arctan2(abs(loc_gt[2] - loc_pred[2]),
                                         abs(loc_gt[1] - loc_pred[1])) \
                        * 180 / math.pi
                    angle_diff = np.abs(ang_np[b] - gt2pred)
                    lon_px.append(abs(np.cos(angle_diff * np.pi / 180) * pix))
                    lat_px.append(abs(np.sin(angle_diff * np.pi / 180) * pix))
                    cos_p, sin_p = ori[b, :, loc_pred[1], loc_pred[2]]
                    if abs(cos_p) <= 1 and abs(sin_p) <= 1:
                        ang_p = _recover_angle(cos_p, sin_p)
                        cos_g, sin_g = gt_ori_np[b, :, loc_gt[1], loc_gt[2]]
                        ang_g = _recover_angle(cos_g, sin_g)
                        d = abs(ang_g - ang_p)
                        ori_err.append(min(d, 360 - d))
        scale = mpp / 512 * 800
        lon_m, lat_m = np.asarray(lon_px) * scale, np.asarray(lat_px) * scale
        ori_err = np.asarray(ori_err)
        out = {
            "mean_distance_m": np.mean(dist_px) * scale,
            "median_distance_m": np.median(dist_px) * scale,
            "mean_longitudinal_m": np.mean(lon_m),
            "median_longitudinal_m": np.median(lon_m),
            "mean_lateral_m": np.mean(lat_m),
            "median_lateral_m": np.median(lat_m),
            "mean_orientation_deg": np.mean(ori_err),
            "median_orientation_deg": np.median(ori_err),
        }
        for t in (1, 3, 5):
            out[f"longitudinal_recall@{t}m"] = np.sum(lon_m < t) / len(lon_m)
            out[f"lateral_recall@{t}m"] = np.sum(lat_m < t) / len(lat_m)
            out[f"orientation_recall@{t}deg"] = (np.sum(ori_err < t)
                                                 / len(ori_err))
        return out

    want = {f"test{t + 1}": ref_traversal_metrics(bounds[t], bounds[t + 1])
            for t in range(3)}

    import train_OxfordRobotCar

    results = train_OxfordRobotCar.main([
        "--grd_image_root", root,
        "--training", "False",
        "-b", "2",
        "--test_model_path", pt_path,
        "--results_dir", str(tmp_path / "res"),
        "--checkpoint_dir", str(tmp_path / "ck"),
        "--num_workers", "2",
    ])
    for trav, wanted in want.items():
        got = results[trav]
        for key, val in wanted.items():
            np.testing.assert_allclose(
                got[key], val, rtol=2e-3, atol=2e-3,
                err_msg=f"{trav} metric {key}: reference {val} vs "
                        f"framework {got[key]}")


def test_vigor_known_orientation_e2e_metric_oracle(ref_env,
                                                   vigor_fullsize_root,
                                                   tmp_path):
    """BASELINE config 1: known orientation (``--ori_noise 0``).  The prior
    restricts matching to the single center bin (``loc_offsets=(0,)``,
    reference ``models.py:489``) and the dataset applies no rotation noise
    (``datasets.py:131-140`` with ori_noise 0); the whole CLI stack must
    reproduce the reference eval loop's metric dict (VERDICT r3 #4)."""
    torch, rm, ref_datasets = ref_env
    from torch.utils.data import DataLoader

    root = vigor_fullsize_root
    n = 8

    torch.manual_seed(29)
    model = rm.CVM_VIGOR_ori_prior("cpu", 0, circular_padding=True)
    model.eval()
    pt_path = str(tmp_path / "model_ori0.pt")
    torch.save(model.state_dict(), pt_path)

    ds = ref_datasets.VIGORDataset(
        root=root, split="samearea", train=False, pos_only=True,
        transform=(_torch_transform(torch, (320, 640)),
                   _torch_transform(torch, (512, 512))),
        ori_noise=0)
    assert len(ds) == n
    loader = DataLoader(ds, batch_size=4, shuffle=False)

    distance_in_meters, orientation_error, probability_at_gt = [], [], []
    mpp = {"NewYork": 0.113248, "Seattle": 0.100817,
           "SanFrancisco": 0.118141, "Chicago": 0.111262}
    with torch.no_grad():
        for data in loader:  # train_VIGOR.py:265-338
            grd, sat, gt, gt_with_ori, gt_orientation, city, _angle = data
            heatmap_t, ori_t = model(grd, sat)[1:3]
            gt_np = gt.numpy()
            gt_ori_np = gt_orientation.numpy()
            heatmap = heatmap_t.numpy()
            ori = ori_t.numpy()
            for b in range(gt_np.shape[0]):
                cur_gt = gt_np[b]
                loc_gt = np.unravel_index(cur_gt.argmax(), cur_gt.shape)
                cur_pred = heatmap[b]
                loc_pred = np.unravel_index(cur_pred.argmax(), cur_pred.shape)
                pix = np.sqrt((loc_gt[1] - loc_pred[1]) ** 2
                              + (loc_gt[2] - loc_pred[2]) ** 2)
                distance_in_meters.append(pix * mpp[city[b]] / 512 * 640)
                cos_p, sin_p = ori[b, :, loc_pred[1], loc_pred[2]]
                if abs(cos_p) <= 1 and abs(sin_p) <= 1:
                    ang_p = _recover_angle(cos_p, sin_p)
                    cos_g, sin_g = gt_ori_np[b, :, loc_gt[1], loc_gt[2]]
                    ang_g = _recover_angle(cos_g, sin_g)
                    d = abs(ang_g - ang_p)
                    orientation_error.append(min(d, 360 - d))
                probability_at_gt.append(heatmap[b, 0, loc_gt[1], loc_gt[2]])

    want = {
        "mean_distance_m": np.mean(distance_in_meters),
        "median_distance_m": np.median(distance_in_meters),
        "mean_orientation_deg": np.mean(orientation_error),
        "median_orientation_deg": np.median(orientation_error),
        "mean_probability_at_gt": np.mean(probability_at_gt),
        "median_probability_at_gt": np.median(probability_at_gt),
    }

    import train_VIGOR

    got = train_VIGOR.main([
        "--dataset_root", root,
        "--training", "False",
        "--ori_noise", "0",
        "-b", "4",
        "--test_model_path", pt_path,
        "--results_dir", str(tmp_path / "res"),
        "--checkpoint_dir", str(tmp_path / "ck"),
        "--num_workers", "2",
    ])
    for key, val in want.items():
        np.testing.assert_allclose(
            got[key], val, rtol=2e-3, atol=2e-3,
            err_msg=f"metric {key}: reference {val} vs framework {got[key]}")


def test_vigor_crossarea_fov108_e2e_metric_oracle(ref_env,
                                                  vigor_fullsize_root,
                                                  tmp_path):
    """BASELINE config 3: crossarea split + limited HFoV 108.  The crossarea
    test cities (SanFrancisco+Chicago) read ``pano_label_balanced.txt``
    (reference ``datasets.py:35-38,70-71``); the panorama is cropped to
    108/360 of its width and circular padding is off.  Composes the
    crossarea index parse through the whole CLI eval (VERDICT r3 #4)."""
    torch, rm, ref_datasets = ref_env
    from torch.utils.data import DataLoader

    root = vigor_fullsize_root
    # crossarea label files for the two test cities (the samearea fixtures
    # never read these): reuse each city's test lines
    for city in ("SanFrancisco", "Chicago"):
        src = os.path.join(root, "splits_new", city,
                           "same_area_balanced_test.txt")
        dst = os.path.join(root, "splits_new", city,
                           "pano_label_balanced.txt")
        if not os.path.exists(dst):
            with open(src) as f, open(dst, "w") as g:
                g.write(f.read())
    n = 4
    frozen = np.array([15.0, 280.0, 99.5, 201.0])
    odir = tmp_path / "orient"
    odir.mkdir()
    np.save(odir / "crossarea_orientation_test.npy", frozen)

    torch.manual_seed(31)
    model = rm.CVM_VIGOR_ori_prior("cpu", 180, circular_padding=False)
    model.eval()
    pt_path = str(tmp_path / "model_cross.pt")
    torch.save(model.state_dict(), pt_path)

    ds = ref_datasets.VIGORDataset(
        root=root, split="crossarea", train=False, pos_only=True,
        transform=(_torch_transform(torch, (320, 640)),
                   _torch_transform(torch, (512, 512))),
        ori_noise=180, random_orientation=frozen)
    assert len(ds) == n
    loader = DataLoader(ds, batch_size=2, shuffle=False)

    distance_in_meters, probability_at_gt = [], []
    mpp = {"NewYork": 0.113248, "Seattle": 0.100817,
           "SanFrancisco": 0.118141, "Chicago": 0.111262}
    with torch.no_grad():
        for data in loader:  # train_VIGOR.py:265-338 with the :272-273 crop
            grd, sat, gt, _gwo, _gto, city, _angle = data
            grd_width = int(grd.size()[3] * 108 / 360)
            heatmap = model(grd[:, :, :, :grd_width], sat)[1].numpy()
            gt_np = gt.numpy()
            for b in range(gt_np.shape[0]):
                cur_gt = gt_np[b]
                loc_gt = np.unravel_index(cur_gt.argmax(), cur_gt.shape)
                cur_pred = heatmap[b]
                loc_pred = np.unravel_index(cur_pred.argmax(), cur_pred.shape)
                pix = np.sqrt((loc_gt[1] - loc_pred[1]) ** 2
                              + (loc_gt[2] - loc_pred[2]) ** 2)
                distance_in_meters.append(pix * mpp[city[b]] / 512 * 640)
                probability_at_gt.append(heatmap[b, 0, loc_gt[1], loc_gt[2]])

    import train_VIGOR

    got = train_VIGOR.main([
        "--dataset_root", root,
        "--area", "crossarea",
        "--training", "False",
        "--ori_noise", "180",
        "--FoV", "108",
        "-b", "2",
        "--test_model_path", pt_path,
        "--orientation_dir", str(odir),
        "--results_dir", str(tmp_path / "res"),
        "--checkpoint_dir", str(tmp_path / "ck"),
        "--num_workers", "2",
    ])
    np.testing.assert_allclose(got["mean_distance_m"],
                               np.mean(distance_in_meters),
                               rtol=2e-3, atol=2e-3)
    np.testing.assert_allclose(got["median_distance_m"],
                               np.median(distance_in_meters),
                               rtol=2e-3, atol=2e-3)
    np.testing.assert_allclose(got["mean_probability_at_gt"],
                               np.mean(probability_at_gt),
                               rtol=2e-3, atol=1e-6)
