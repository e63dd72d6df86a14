"""Data-layer tests on synthetic fixtures: VIGOR index parsing + sampling,
the prefetching loader, Oxford UTM fit + crops, and KITTI's aerial alignment
chain verified against the reference dataset class as an oracle."""

import os

import numpy as np
import pytest
from PIL import Image

from ccvpe_tpu.data import kitti, oxford, pipeline, vigor


def _write_img(path, hw, seed):
    os.makedirs(os.path.dirname(path), exist_ok=True)
    rng = np.random.default_rng(seed)
    Image.fromarray(rng.integers(0, 255, (*hw, 3), dtype=np.uint8)).save(path)


@pytest.fixture(scope="module")
def vigor_root(tmp_path_factory):
    root = str(tmp_path_factory.mktemp("vigor"))
    rng = np.random.default_rng(0)
    for city in ["NewYork", "Seattle", "SanFrancisco", "Chicago"]:
        sats = [f"sat_{city}_{i}.png" for i in range(3)]
        os.makedirs(os.path.join(root, "splits_new", city), exist_ok=True)
        with open(os.path.join(root, "splits_new", city,
                               "satellite_list.txt"), "w") as f:
            f.write("\n".join(sats) + "\n")
        for s in sats:
            _write_img(os.path.join(root, city, "satellite", s), (64, 64),
                       hash(s) % 100)
        lines = []
        for j in range(4):
            pano = f"pano_{city}_{j}.png"
            _write_img(os.path.join(root, city, "panorama", pano), (32, 64),
                       j)
            fields = [pano]
            for k in range(4):
                fields += [sats[(j + k) % 3],
                           str(rng.uniform(-20, 20)), str(rng.uniform(-20, 20))]
            lines.append(" ".join(fields))
        for base in ["same_area_balanced_train.txt",
                     "same_area_balanced_test.txt", "pano_label_balanced.txt"]:
            with open(os.path.join(root, "splits_new", city, base), "w") as f:
                f.write("\n".join(lines) + "\n")
    return root


class TestVigor:
    def test_index_parsing(self, vigor_root):
        idx = vigor.VigorIndex.load(vigor_root, "samearea", train=True)
        assert len(idx) == 16
        assert idx.labels.shape == (16, 4)
        assert idx.deltas.shape == (16, 4, 2)
        assert len(idx.sat_paths) == 12
        cross = vigor.VigorIndex.load(vigor_root, "crossarea", train=False)
        assert set(cross.cities) == {"SanFrancisco", "Chicago"}

    def test_sampler_and_device_batch(self, vigor_root):
        idx = vigor.VigorIndex.load(vigor_root, "samearea", train=True)
        sampler = vigor.VigorSampler(idx, grd_hw=(32, 64), sat_hw=(64, 64))
        loader = pipeline.Loader(sampler, np.arange(8), batch_size=4,
                                 num_workers=2)
        batches = list(loader)
        assert len(batches) == 2
        raw = batches[0]
        assert raw["grd"].shape == (4, 32, 64, 3)
        assert raw["sat"].shape == (4, 64, 64, 3)
        batch = vigor.device_batch(raw, train=True, sat_hw=(64, 64), bins=20)
        assert batch["gt"].shape == (4, 64, 64)
        assert batch["bin_weights"].shape == (4, 20)
        assert batch["orientation"].shape == (4, 64, 64, 2)
        # normalized images should have roughly zero-ish mean after ImageNet
        # normalization of uniform noise
        assert abs(float(batch["grd"].mean())) < 2.0

    def test_frozen_orientation(self, vigor_root):
        idx = vigor.VigorIndex.load(vigor_root, "samearea", train=False)
        frozen = np.linspace(0, 359, len(idx))
        sampler = vigor.VigorSampler(idx, random_orientation=frozen,
                                     grd_hw=(32, 64), sat_hw=(64, 64))
        s3 = sampler(3)
        assert abs(float(s3["angle"]) - frozen[3]) < 1e-5

    def test_semi_positive_constraint(self, vigor_root):
        idx = vigor.VigorIndex.load(vigor_root, "samearea", train=True)
        idx.deltas[:, 1:] = 400.0  # only pos 0 satisfies |delta| < 320
        sampler = vigor.VigorSampler(idx, pos_only=False,
                                     grd_hw=(32, 64), sat_hw=(64, 64))
        for i in range(4):
            s = sampler(i)
            want_r = np.round(idx.deltas[i, 0, 0] / 64 * 64)
            assert float(s["row_offset"]) == want_r


class TestVigorOracle:
    def test_sampler_against_reference_dataset(self, torch_oracle,
                                               vigor_root):
        """Drive the reference VIGORDataset on the same synthetic root and
        require identical rolled-panorama pixels (roll direction,
        ``datasets.py:108-118``), GT placement, CCW ``gt_with_ori[20-index]``
        bin indexing (``datasets.py:153-163``), and city tags."""
        torch = torch_oracle
        import sys
        from unittest.mock import MagicMock

        # datasets.py imports torchvision TF at module scope; VIGOR never
        # calls it, so a stub suffices (the KITTI oracle installs a real shim)
        sys.modules.setdefault("torchvision.transforms.functional",
                               MagicMock())
        import datasets as ref_datasets

        import jax.numpy as jnp
        from ccvpe_tpu.data import transforms
        from ccvpe_tpu.ops.gt import gaussian_heatmap, gt_with_orientation

        to_chw = lambda img: torch.from_numpy(
            np.array(img, np.uint8)).permute(2, 0, 1)
        n = 16
        # cover both gt_with_ori branches: index==0 (angle<18), the generic
        # 20-index case, and the near-wrap (>342 deg)
        frozen = np.concatenate([[5.0, 350.0, 17.9, 342.1],
                                 np.linspace(20, 330, n - 4)])
        ref = ref_datasets.VIGORDataset(
            root=vigor_root, split="samearea", train=True,
            transform=(to_chw, to_chw), pos_only=True,
            random_orientation=frozen)
        assert len(ref) == n

        index = vigor.VigorIndex.load(vigor_root, "samearea", train=True)
        sampler = vigor.VigorSampler(index, pos_only=True,
                                     random_orientation=frozen,
                                     grd_hw=(32, 64), sat_hw=(64, 64))
        for i in range(n):
            grd_ref, sat_ref, gt_ref, gwo_ref, omap_ref, city_ref, ang_ref = \
                ref[i]
            s = sampler(i)
            assert s["city"] == city_ref
            assert abs(float(s["angle"]) - float(ang_ref)) < 1e-4  # f32 angle

            # panorama roll through the production device function
            rolled = np.asarray(transforms.roll_panorama(
                jnp.asarray(s["grd"][None], jnp.float32),
                jnp.asarray([s["rotation"]])))[0]
            np.testing.assert_array_equal(
                rolled.astype(np.uint8),
                grd_ref.numpy().transpose(1, 2, 0))
            np.testing.assert_array_equal(s["sat"],
                                          sat_ref.numpy().transpose(1, 2, 0))

            mine_gt = np.asarray(gaussian_heatmap(
                64, 64, float(s["row_offset"]), float(s["col_offset"])))
            np.testing.assert_allclose(mine_gt, gt_ref.numpy()[0], atol=1e-6)
            mine_gwo = np.asarray(gt_with_orientation(
                64, 64, float(s["row_offset"]), float(s["col_offset"]),
                float(s["angle"]), 20, clockwise=False))
            np.testing.assert_allclose(mine_gwo.transpose(2, 0, 1),
                                       gwo_ref.numpy(), atol=1e-6)
            # dense (cos, sin) field constants
            np.testing.assert_allclose(
                [float(omap_ref[0, 0, 0]), float(omap_ref[1, 0, 0])],
                [np.cos(np.radians(float(s["angle"]))),
                 np.sin(np.radians(float(s["angle"])))], atol=1e-6)


class TestOxfordOracle:
    def test_sampler_against_reference_dataset(self, torch_oracle, tmp_path):
        """Drive the reference OxfordRobotCarDataset (eval split) on a
        synthetic stitched map: identical crop pixels, GT placement
        (row/col signs, ``datasets.py:326-331``), CW ``gt_with_ori[index]``
        bin indexing (``datasets.py:339-348``), and yaw conversion
        (``datasets.py:334-337``)."""
        torch = torch_oracle
        import sys
        from unittest.mock import MagicMock

        sys.modules.setdefault("torchvision.transforms.functional",
                               MagicMock())
        import datasets as ref_datasets

        from ccvpe_tpu.ops.gt import gaussian_heatmap, gt_with_orientation

        root = str(tmp_path) + "/"
        _write_img(root + "map.png", (2048, 2048), 5)
        # UTM chosen to land well inside the 2048px synthetic map
        # (control point (619400, 5736195) -> pixel (900, 900))
        coords = [(619420.0, 5736160.0), (619435.0, 5736185.0),
                  (619410.0, 5736150.0)]
        for t, (e, nn) in enumerate(coords, 1):
            with open(root + f"test{t}_j.txt", "w") as f:
                f.write(f"f{t}.png 0 {e} {nn}\n")
        # yaws covering CW bin branches incl. index==19 wrap
        np.save(root + "test_yaw.npy", np.asarray([0.3, 1.6 + np.pi, 6.2]))
        for t in range(1, 4):
            _write_img(root + f"f{t}.png", (160, 240), t)

        to_chw = lambda img: torch.from_numpy(np.array(
            img.resize((512, 512), Image.BILINEAR)
            if img.size != (512, 512) else np.array(img),
            np.uint8)).permute(2, 0, 1)
        grd_tf = lambda img: torch.from_numpy(np.array(
            img.resize((231, 154), Image.BILINEAR), np.uint8)).permute(
                2, 0, 1)
        ref = ref_datasets.OxfordRobotCarDataset(
            grd_image_root=root, sat_path=root + "map.png", split="test",
            transform=(grd_tf, to_chw))

        idx = oxford.OxfordIndex.load(root, root + "map.png", "test")
        sampler = oxford.OxfordSampler(idx)
        for i in range(3):
            grd_ref, sat_ref, gt_ref, gwo_ref, omap_ref, ang_ref = ref[i]
            s = sampler(i)
            assert abs(float(s["orientation_from_north"])
                       - float(ang_ref)) < 1e-4
            np.testing.assert_array_equal(s["grd"],
                                          grd_ref.numpy().transpose(1, 2, 0))
            np.testing.assert_array_equal(s["sat"],
                                          sat_ref.numpy().transpose(1, 2, 0))
            mine_gt = np.asarray(gaussian_heatmap(
                512, 512, float(s["row_offset"]), float(s["col_offset"])))
            np.testing.assert_allclose(mine_gt, gt_ref.numpy()[0], atol=5e-6)
            mine_gwo = np.asarray(gt_with_orientation(
                512, 512, float(s["row_offset"]), float(s["col_offset"]),
                float(s["angle"]), 20, clockwise=True))
            np.testing.assert_allclose(mine_gwo.transpose(2, 0, 1),
                                       gwo_ref.numpy(), atol=1e-5)


def test_shipped_orientation_fixtures():
    """SURVEY.md §2 T8: the exact release fixtures ship in fixtures/."""
    base = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "fixtures")
    same = np.load(os.path.join(base, "samearea_orientation_test.npy"))
    cross = np.load(os.path.join(base, "crossarea_orientation_test.npy"))
    assert same.shape == (52605,) and cross.shape == (53694,)
    for arr in (same, cross):
        assert arr.min() >= 0.0 and arr.max() < 360.0


class TestPipeline:
    def test_loader_preserves_order_and_errors(self):
        def sample(i):
            if i == 99:
                raise ValueError("boom")
            return {"x": np.full((2,), i, np.int32)}

        loader = pipeline.Loader(sample, np.arange(10), batch_size=4,
                                 num_workers=3, drop_last=True)
        batches = list(loader)
        assert len(batches) == 2
        np.testing.assert_array_equal(batches[0]["x"][:, 0], [0, 1, 2, 3])

        bad = pipeline.Loader(sample, np.asarray([1, 99]), batch_size=2)
        with pytest.raises(ValueError):
            list(bad)

    def test_loader_abandoned_iteration_releases_producer(self):
        """Breaking out mid-epoch must unblock and retire the producer
        thread (bounded-queue put with a consumer-gone signal) instead of
        pinning `prefetch` batches until process exit."""
        import threading
        import time

        def sample(i):
            return {"x": np.full((4,), i, np.int32)}

        before = {t.ident for t in threading.enumerate()}
        loader = pipeline.Loader(sample, np.arange(64), batch_size=2,
                                 num_workers=2, prefetch=2)
        it = iter(loader)
        next(it)  # producer is now running and blocking on a full queue
        it.close()  # abandon mid-epoch (same path as `break` + GC)
        deadline = time.time() + 10
        while time.time() < deadline:
            extra = [t for t in threading.enumerate()
                     if t.ident not in before and t.is_alive()]
            if not extra:
                break
            time.sleep(0.05)
        assert not extra, f"producer thread leaked: {extra}"

    def test_device_prefetch_order_errors_abandonment(self):
        """device_prefetch (the train/eval one-batch lookahead) preserves
        order, propagates fn errors, and retires its producer when the
        consumer abandons iteration."""
        import threading
        import time

        got = list(pipeline.device_prefetch(range(8), lambda i: i * 2))
        assert got == [0, 2, 4, 6, 8, 10, 12, 14]

        def boom(i):
            if i == 3:
                raise RuntimeError("assembly failed")
            return i

        it = pipeline.device_prefetch(range(8), boom)
        with pytest.raises(RuntimeError, match="assembly failed"):
            list(it)

        before = {t.ident for t in threading.enumerate()}
        slow = pipeline.device_prefetch(range(64), lambda i: i, depth=1)
        assert next(slow) == 0
        slow.close()  # abandon mid-iteration
        deadline = time.time() + 10
        while time.time() < deadline:
            extra = [t for t in threading.enumerate()
                     if t.ident not in before and t.is_alive()]
            if not extra:
                break
            time.sleep(0.05)
        assert not extra, f"prefetch producer leaked: {extra}"

    def test_train_val_split_matches_reference_seed(self):
        """Reference: np.random.seed(0); shuffle; 80/20
        (``train_VIGOR.py:82-91``)."""
        np.random.seed(0)
        idx = np.arange(100)
        np.random.shuffle(idx)
        want_train, want_val = idx[:80], idx[80:]
        got_train, got_val = pipeline.train_val_split(100, 0.2, seed=0)
        np.testing.assert_array_equal(got_train, want_train)
        np.testing.assert_array_equal(got_val, want_val)


@pytest.fixture(scope="module")
def kitti_root(tmp_path_factory):
    root = str(tmp_path_factory.mktemp("kitti"))
    drive = "2011_09_26/2011_09_26_drive_0001_sync/"
    name = drive + "0000000000.png"
    _write_img(os.path.join(root, "satmap", name), (512, 512), 1)
    _write_img(os.path.join(root, "raw_data", drive, "image_02/data",
                            "0000000000.png"), (375, 1242), 2)
    oxts = os.path.join(root, "raw_data", drive, "oxts/data",
                        "0000000000.txt")
    os.makedirs(os.path.dirname(oxts), exist_ok=True)
    with open(oxts, "w") as f:
        f.write("49.01 8.43 112.99 0.01 0.01 0.3 " + "0.0 " * 24 + "\n")
    train_list = os.path.join(root, "train_files.txt")
    with open(train_list, "w") as f:
        f.write(name + "\n")
    test_list = os.path.join(root, "test_files.txt")
    with open(test_list, "w") as f:
        f.write(f"{name} 0.31 -0.62 0.47\n")
    return root


class TestKitti:
    def test_sampler_against_reference_dataset(self, torch_oracle,
                                               kitti_root):
        """Drive the reference SatGrdDatasetTest on the same synthetic root
        and require identical aerial pixels and GT placement."""
        torch = torch_oracle
        import sys
        from unittest.mock import MagicMock

        tvf = MagicMock()

        def _center_crop(img, size):
            w, h = img.size
            left = int(round((w - size) / 2.0))
            top = int(round((h - size) / 2.0))
            return img.crop((left, top, left + size, top + size))

        tvf.center_crop = _center_crop
        # `import a.b.c as TF` binds via getattr chains from the root module
        # mock, so install the shim along that chain
        sys.modules["torchvision.transforms.functional"] = tvf
        sys.modules["torchvision"].transforms.functional = tvf
        import importlib
        import datasets as ref_datasets
        importlib.reload(ref_datasets)
        assert ref_datasets.TF.center_crop is _center_crop

        to_array = lambda img: torch.from_numpy(
            np.array(img.resize((1024, 256), Image.BILINEAR)
                     if img.size != (512, 512) else img))
        ref = ref_datasets.SatGrdDatasetTest(
            root=kitti_root, file=os.path.join(kitti_root, "test_files.txt"),
            transform=(to_array, to_array), rotation_range=10)
        sat_ref, grd_ref, gt_ref, gwo_ref, omap_ref, angle_ref = ref[0]

        index = kitti.KittiIndex.load(
            kitti_root, os.path.join(kitti_root, "test_files.txt"), test=True)
        sampler = kitti.KittiSampler(index, rotation_range=10)
        s = sampler(0)

        np.testing.assert_array_equal(s["sat"], sat_ref.numpy())
        assert abs(float(s["angle"]) - float(angle_ref)) < 1e-5
        # GT argmax must land on the same pixel
        import jax.numpy as jnp
        from ccvpe_tpu.ops.gt import gaussian_heatmap
        mine = np.asarray(gaussian_heatmap(512, 512, float(s["row_offset"]),
                                           float(s["col_offset"])))
        np.testing.assert_allclose(mine, gt_ref.numpy()[0], atol=1e-5)
        gwo = np.asarray(
            __import__("ccvpe_tpu.ops.gt", fromlist=["gt_with_orientation"])
            .gt_with_orientation(512, 512, float(s["row_offset"]),
                                 float(s["col_offset"]), float(s["angle"]),
                                 16, clockwise=False))
        np.testing.assert_allclose(gwo.transpose(2, 0, 1), gwo_ref.numpy(),
                                   atol=1e-5)

    def test_meter_per_pixel(self):
        # reference formula restated (datasets.py:368-372)
        want = 156543.03392 * np.cos(49.015 * np.pi / 180.0) / 2 ** 18 / 2
        assert abs(kitti.meter_per_pixel() - want) < 1e-12


class TestOxford:
    def test_utm_transform_fits_control_points(self):
        t = oxford.utm_to_pixel_transform()
        got = t(oxford._PRIMARY)
        np.testing.assert_allclose(got, oxford._SECONDARY, atol=60)

    def test_eval_crop_deterministic(self, tmp_path):
        root = str(tmp_path) + "/"
        _write_img(os.path.join(root, "map.png"), (2048, 2048), 5)
        files = [f"f{i}.png 0 619500.0 5735900.0" for i in range(3)]
        with open(root + "test1_j.txt", "w") as f:
            f.write("\n".join(files[:1]) + "\n")
        with open(root + "test2_j.txt", "w") as f:
            f.write("\n".join(files[1:2]) + "\n")
        with open(root + "test3_j.txt", "w") as f:
            f.write("\n".join(files[2:]) + "\n")
        np.save(root + "test_yaw.npy", np.asarray([0.3, 1.0, 4.0]))
        for i in range(3):
            _write_img(os.path.join(root, f"f{i}.png"), (160, 240), i)

        idx = oxford.OxfordIndex.load(root, root + "map.png", "test")
        assert idx.traversal_lengths == (1, 1, 1)
        sampler = oxford.OxfordSampler(idx)
        a = sampler(0)
        b = sampler(0)
        np.testing.assert_array_equal(a["sat"], b["sat"])
        assert a["grd"].shape == (154, 231, 3)
        assert a["sat"].shape == (512, 512, 3)
        # yaw 0.3 rad west-CW -> north-CW degrees
        want = 0.3 / np.pi * 180 - 90 + 360
        assert abs(float(a["angle"]) - want) < 1e-4


class TestArrayCache:
    def test_build_open_and_sampler_equivalence(self, vigor_root, tmp_path):
        from ccvpe_tpu.data.cache import ArrayCache

        idx = vigor.VigorIndex.load(vigor_root, "samearea", train=True)
        grd_c = ArrayCache.build(idx.grd_paths, (32, 64),
                                 str(tmp_path / "grd"))
        sat_c = ArrayCache.build(idx.sat_paths, (64, 64),
                                 str(tmp_path / "sat"))
        assert len(grd_c) == len(idx)
        # reopen from disk
        grd_c = ArrayCache.open(str(tmp_path / "grd"))
        assert ArrayCache.exists(str(tmp_path / "grd"))

        plain = vigor.VigorSampler(idx, grd_hw=(32, 64), sat_hw=(64, 64),
                                   ori_noise=0.0)
        cached = vigor.VigorSampler(idx, grd_hw=(32, 64), sat_hw=(64, 64),
                                    ori_noise=0.0, grd_cache=grd_c,
                                    sat_cache=sat_c)
        a, b = plain(3), cached(3)
        np.testing.assert_array_equal(a["grd"], b["grd"])
        np.testing.assert_array_equal(a["sat"], b["sat"])
        assert a["row_offset"] == b["row_offset"]
        assert a["col_offset"] == b["col_offset"]

    def test_unreadable_file_blank_fallback(self, tmp_path):
        from ccvpe_tpu.data.cache import ArrayCache

        c = ArrayCache.build(["/nonexistent/x.png"], (16, 16),
                             str(tmp_path / "bad"))
        # the failure must be RECORDED (samplers gate blank-vs-raise on
        # meta["failed"]) on both the native and the PIL build path
        assert c.meta["failed"] == ["/nonexistent/x.png"]
        np.testing.assert_array_equal(c[0], np.zeros((16, 16, 3), np.uint8))


class TestKittiDeviceAugment:
    def test_device_augment_matches_host_path(self, kitti_root):
        index = kitti.KittiIndex.load(
            kitti_root, os.path.join(kitti_root, "test_files.txt"), test=True)
        host = kitti.KittiSampler(index, rotation_range=10)
        dev = kitti.KittiSampler(index, rotation_range=10,
                                 device_augment=True)
        hs, ds = host(0), dev(0)
        # identical GT placement/orientation scalars
        assert hs["row_offset"] == ds["row_offset"]
        assert hs["col_offset"] == ds["col_offset"]
        assert hs["angle"] == ds["angle"]

        batch = kitti.device_batch_device_aug(
            pipeline.collate([ds]), train=True, mpp=dev.mpp)
        host_batch = kitti.device_batch(pipeline.collate([hs]), train=True)
        assert batch["sat"].shape == host_batch["sat"].shape
        assert batch["bin_weights"].shape == host_batch["bin_weights"].shape
        # warped aerial agrees with the PIL chain up to resampling ties
        a = np.asarray(batch["sat"][0])
        b = np.asarray(host_batch["sat"][0])
        close = np.mean(np.abs(a - b) < 0.05)  # normalized units
        assert close > 0.95, close
        np.testing.assert_allclose(np.asarray(batch["gt"]),
                                   np.asarray(host_batch["gt"]), atol=1e-6)


def test_shard_for_process():
    idx = np.arange(10)
    shards = [pipeline.shard_for_process(idx, i, 4) for i in range(4)]
    np.testing.assert_array_equal(np.sort(np.concatenate(shards)), idx)
    np.testing.assert_array_equal(shards[1], [1, 5, 9])
    np.testing.assert_array_equal(pipeline.shard_for_process(idx, 0, 1), idx)


def test_multihost_indices_equal_batch_counts():
    """Every process gets the same number of local batches even when the
    epoch length is not a multiple of the global batch (review finding:
    unequal counts desync the SPMD train loop)."""
    n, global_bs, pc = 15, 8, 2
    slices = [pipeline.multihost_indices(np.arange(n), global_bs,
                                         process_index=pi, process_count=pc)
              for pi in range(pc)]
    local_bs = global_bs // pc
    counts = [len(s) // local_bs for s in slices]
    assert counts[0] == counts[1] == 1
    # disjoint cover of the truncated prefix
    merged = sorted(np.concatenate(slices).tolist())
    assert merged == list(range(8))
    # indivisible global batch raises
    import pytest as _pytest
    with _pytest.raises(ValueError):
        pipeline.multihost_indices(np.arange(n), 9, process_index=0,
                                   process_count=2)


def test_kitti_oxford_cache_equivalence(kitti_root, tmp_path):
    """KITTI (grd at model size + RAW satmaps) and Oxford (grd) array caches
    reproduce the direct-decode samplers bit-for-bit."""
    from ccvpe_tpu.data.cache import ArrayCache

    # -- KITTI (test split, deterministic) --
    index = kitti.KittiIndex.load(
        kitti_root, os.path.join(kitti_root, "test_files.txt"), test=True)
    plain = kitti.KittiSampler(index, rotation_range=10)
    n = len(index)
    grd_c = ArrayCache.build([plain.grd_path(i) for i in range(n)],
                             kitti.GRD_HW, str(tmp_path / "kgrd"))
    sat_raw_hw = plain._sat_raw_hw(plain.sat_path(0))
    sat_c = ArrayCache.build([plain.sat_path(i) for i in range(n)],
                             sat_raw_hw, str(tmp_path / "ksat"))
    cached = kitti.KittiSampler(index, rotation_range=10,
                                grd_cache=grd_c, sat_cache=sat_c)
    a, b = plain(0), cached(0)
    for key in a:
        np.testing.assert_array_equal(a[key], b[key]), key

    # -- Oxford (eval split, deterministic) --
    root = str(tmp_path / "oxford") + "/"
    _write_img(os.path.join(root, "map.png"), (2048, 2048), 5)
    _write_img(os.path.join(root, "f0.png"), (160, 240), 0)
    for j in range(3):
        with open(root + f"test{j+1}_j.txt", "w") as f:
            f.write("f0.png 0 619500.0 5735900.0\n" if j == 0 else "")
    np.save(root + "test_yaw.npy", np.asarray([0.3]))
    oidx = oxford.OxfordIndex.load(root, root + "map.png", "test")
    oplain = oxford.OxfordSampler(oidx)
    ogrd_c = ArrayCache.build([oplain.grd_path(0)], oxford.GRD_HW,
                              str(tmp_path / "ogrd"))
    ocached = oxford.OxfordSampler(oidx, grd_cache=ogrd_c)
    a, b = oplain(0), ocached(0)
    for key in a:
        np.testing.assert_array_equal(a[key], b[key]), key


class TestCounterBasedSampleRNG:
    """Pin the multi-host augmentation-RNG contract: per-sample draws are a
    pure function of (seed, epoch, idx) — so they are identical no matter
    which process fetches a sample or in what order (multi-host training
    reproduces the single-process run), and ``set_epoch`` refreshes them.
    See ``vigor.VigorSampler._rng``."""

    @staticmethod
    def _draws(plan: dict) -> tuple:
        return tuple(v for k, v in sorted(plan.items())
                     if isinstance(v, (int, float)) and k != "idx")

    def test_vigor_order_and_process_independent(self, vigor_root):
        idx = vigor.VigorIndex.load(vigor_root, "samearea", train=True)
        mk = lambda: vigor.VigorSampler(idx, pos_only=False, ori_noise=180,
                                        grd_hw=(32, 64), sat_hw=(64, 64))
        n = len(idx)
        fwd = [self._draws(mk().plan(i)) for i in range(n)]
        one = mk()  # reversed fetch order on a single instance
        rev = [self._draws(one.plan(i)) for i in reversed(range(n))][::-1]
        assert fwd == rev
        # a "second host" fetching only its stride sees the same draws
        host1 = mk()
        assert [self._draws(host1.plan(i)) for i in range(1, n, 2)] \
            == fwd[1::2]

    def test_vigor_epoch_and_seed_refresh(self, vigor_root):
        idx = vigor.VigorIndex.load(vigor_root, "samearea", train=True)
        s = vigor.VigorSampler(idx, ori_noise=180,
                               grd_hw=(32, 64), sat_hw=(64, 64))
        e0 = [self._draws(s.plan(i)) for i in range(len(idx))]
        s.set_epoch(1)
        e1 = [self._draws(s.plan(i)) for i in range(len(idx))]
        assert e0 != e1          # fresh draws each epoch
        s.set_epoch(0)
        assert [self._draws(s.plan(i)) for i in range(len(idx))] == e0
        s2 = vigor.VigorSampler(idx, ori_noise=180, seed=7,
                                grd_hw=(32, 64), sat_hw=(64, 64))
        assert [self._draws(s2.plan(i)) for i in range(len(idx))] != e0

    def test_kitti_train_draw_contract(self, kitti_root):
        index = kitti.KittiIndex.load(
            kitti_root, os.path.join(kitti_root, "train_files.txt"),
            test=False)
        s = kitti.KittiSampler(index, rotation_range=10)
        p0 = s.plan(0)
        assert abs(p0["random_ori"]) <= 10.0
        assert self._draws(kitti.KittiSampler(
            index, rotation_range=10).plan(0)) == self._draws(p0)
        s.set_epoch(3)
        assert self._draws(s.plan(0)) != self._draws(p0)

    def test_oxford_train_offsets_contract(self):
        class S:  # _train_offsets reads only seed/epoch
            seed, epoch = 0, 0

        off = oxford.OxfordSampler._train_offsets(S, 5)
        assert oxford.OxfordSampler._train_offsets(S, 5) == off
        assert oxford.OxfordSampler._train_offsets(S, 6) != off
        S.epoch = 1
        assert oxford.OxfordSampler._train_offsets(S, 5) != off
        # magnitude bound from the reference: r <= 200*sqrt(2)
        assert np.hypot(*off) <= 200 * np.sqrt(2) + 1


def test_vigor_sampler_unreadable_satellite_blank_fallback(vigor_root):
    """The direct (non-native) sampler path must apply the reference's
    blank-image fallback (datasets.py:100-105) for an unreadable satellite
    instead of raising out of a loader worker thread and killing the epoch
    (the native two-phase path already did)."""
    idx = vigor.VigorIndex.load(vigor_root, "samearea", train=True)
    s = vigor.VigorSampler(idx, ori_noise=0.0)
    sat_idx = int(idx.labels[0, 0])
    idx.sat_paths[sat_idx] = "/nonexistent/satellite.png"
    sample = s(0)
    np.testing.assert_array_equal(
        sample["sat"], np.zeros((*s.sat_hw, 3), np.uint8))
    # offsets fall back to unscaled (raw size := model size), not NaN/crash
    assert np.isfinite(sample["row_offset"]) and \
        np.isfinite(sample["col_offset"])
