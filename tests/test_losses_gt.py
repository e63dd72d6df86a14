"""Loss-function parity vs the reference ``losses.py`` (torch oracle) and
ground-truth synthesis parity vs the reference's numpy formulas."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from ccvpe_tpu.ops import gt as gt_ops
from ccvpe_tpu.train import losses as L
from tests.conftest import assert_close


class TestLosses:
    def _ref_losses(self, torch):
        import importlib
        import losses as ref  # /root/reference/losses.py (torch-only oracle)
        return ref

    def test_info_nce_vs_reference(self, torch_oracle):
        torch = torch_oracle
        ref = self._ref_losses(torch)
        rng = np.random.default_rng(0)
        scores = rng.standard_normal((4, 320), dtype=np.float32)
        labels = np.maximum(
            rng.standard_normal((4, 320), dtype=np.float32), 0.0)
        labels[0, :5] = [0.5, 0.2, 0.009, 0.011, 0.0]  # threshold edges
        want = ref.infoNCELoss(torch.tensor(scores),
                               torch.tensor(labels)).item()
        got = float(L.info_nce_loss(jnp.asarray(scores), jnp.asarray(labels)))
        assert abs(want - got) < 1e-4 * max(1, abs(want))

    def test_cross_entropy_vs_reference(self, torch_oracle):
        torch = torch_oracle
        ref = self._ref_losses(torch)
        rng = np.random.default_rng(1)
        logits = rng.standard_normal((3, 100), dtype=np.float32)
        labels = rng.random((3, 100), dtype=np.float32)
        labels /= labels.sum(axis=1, keepdims=True)
        want = ref.cross_entropy_loss(torch.tensor(logits),
                                      torch.tensor(labels)).item()
        got = float(L.cross_entropy_loss(jnp.asarray(logits),
                                         jnp.asarray(labels)))
        assert abs(want - got) < 1e-5 * max(1, abs(want))

    def test_orientation_vs_reference(self, torch_oracle):
        torch = torch_oracle
        ref = self._ref_losses(torch)
        rng = np.random.default_rng(2)
        ori = rng.standard_normal((2, 2, 8, 9), dtype=np.float32)  # NCHW
        gto = rng.standard_normal((2, 2, 8, 9), dtype=np.float32)
        gt = rng.random((2, 1, 8, 9), dtype=np.float32)
        want = ref.orientation_loss(torch.tensor(ori), torch.tensor(gto),
                                    torch.tensor(gt)).item()
        got = float(L.orientation_loss(
            jnp.asarray(ori.transpose(0, 2, 3, 1)),
            jnp.asarray(gto.transpose(0, 2, 3, 1)),
            jnp.asarray(gt.transpose(0, 2, 3, 1))))
        assert abs(want - got) < 1e-4 * max(1, abs(want))

    def test_info_nce_large_scores_stable(self):
        """The weighted infoNCE with weight 1e4 sees scores/0.1 up to ~10;
        verify the logsumexp form stays finite where naive exp would not."""
        scores = jnp.full((1, 10), 900.0)
        labels = jnp.zeros((1, 10)).at[0, 0].set(1.0)
        val = L.info_nce_loss(scores, labels)
        assert np.isfinite(float(val))


class TestGroundTruth:
    def _ref_gaussian(self, h, w, row, col):
        # reference datasets.py:144-150
        x, y = np.meshgrid(np.linspace(-w / 2 + col, w / 2 + col, w),
                           np.linspace(-h / 2 - row, h / 2 - row, h))
        d = np.sqrt(x * x + y * y)
        return np.exp(-((d - 0.0) ** 2 / (2.0 * 4.0 ** 2)))

    def test_gaussian_heatmap(self):
        for (h, w, r, c) in [(512, 512, 0, 0), (512, 512, 17.0, -42.0),
                             (64, 64, -10.0, 3.0)]:
            want = self._ref_gaussian(h, w, r, c)
            got = gt_ops.gaussian_heatmap(h, w, r, c)
            assert_close(got, want, atol=1e-6)

    def _ref_vigor_bins(self, angle, g):
        # reference datasets.py:153-162 (counter-clockwise, 20 bins)
        out = np.zeros((20,) + g.shape, np.float32)
        index = int(angle // 18)
        ratio = (angle % 18) / 18
        if index == 0:
            out[0] = g * (1 - ratio)
            out[19] = g * ratio
        else:
            out[20 - index] = g * (1 - ratio)
            out[20 - index - 1] = g * ratio
        return out

    def _ref_oxford_bins(self, angle, g):
        # reference datasets.py:339-348 (clockwise, 20 bins)
        out = np.zeros((20,) + g.shape, np.float32)
        index = int(angle // 18)
        ratio = (angle % 18) / 18
        if index == 19:
            out[19] = g * (1 - ratio)
            out[0] = g * ratio
        else:
            out[index] = g * (1 - ratio)
            out[index + 1] = g * ratio
        return out

    @pytest.mark.parametrize("angle", [0.0, 5.0, 17.999, 18.0, 90.0, 181.5,
                                       351.0, 359.9])
    def test_vigor_ccw_bins(self, angle):
        g = np.asarray(self._ref_gaussian(32, 32, 2.0, -3.0), np.float32)
        want = self._ref_vigor_bins(angle, g)
        got = gt_ops.gt_with_orientation(32, 32, 2.0, -3.0, angle, 20,
                                         clockwise=False)
        assert_close(np.asarray(got).transpose(2, 0, 1), want, atol=1e-5)

    @pytest.mark.parametrize("angle", [0.0, 45.0, 341.9, 342.0, 359.5])
    def test_oxford_cw_bins(self, angle):
        g = np.asarray(self._ref_gaussian(32, 32, 0.0, 0.0), np.float32)
        want = self._ref_oxford_bins(angle, g)
        got = gt_ops.gt_with_orientation(32, 32, 0.0, 0.0, angle, 20,
                                         clockwise=True)
        assert_close(np.asarray(got).transpose(2, 0, 1), want, atol=1e-5)

    def test_kitti_16_bins(self):
        # reference datasets.py:489-497: 16 bins of 22.5°, CCW indexing
        angle = 100.0
        g = np.asarray(self._ref_gaussian(16, 16, 0.0, 0.0), np.float32)
        out = np.zeros((16,) + g.shape, np.float32)
        index = int(angle // 22.5)
        ratio = (angle % 22.5) / 22.5
        out[16 - index] = g * (1 - ratio)
        out[16 - index - 1] = g * ratio
        got = gt_ops.gt_with_orientation(16, 16, 0.0, 0.0, angle, 16,
                                         clockwise=False)
        assert_close(np.asarray(got).transpose(2, 0, 1), out, atol=1e-5)

    def test_orientation_map(self):
        got = gt_ops.orientation_map(4, 6, 30.0)
        assert got.shape == (4, 6, 2)
        assert_close(got[..., 0], np.full((4, 6), np.cos(np.radians(30))),
                     atol=1e-6)
        assert_close(got[..., 1], np.full((4, 6), np.sin(np.radians(30))),
                     atol=1e-6)

    def test_synthesize_batch(self):
        gt, gwo, omap = gt_ops.synthesize_batch(
            jnp.asarray([0.0, 5.0]), jnp.asarray([0.0, -2.0]),
            jnp.asarray([10.0, 200.0]), height=64, width=64, bins=20)
        assert gt.shape == (2, 64, 64, 1)
        assert gwo.shape == (2, 64, 64, 20)
        assert omap.shape == (2, 64, 64, 2)
        # binned volume sums to the plain gaussian
        assert_close(gwo.sum(-1), gt[..., 0], atol=1e-5)


class TestMetrics:
    def test_angle_recovery_roundtrip(self):
        from ccvpe_tpu.train.metrics import angle_from_cos_sin
        angles = np.asarray([0.0, 10.0, 90.0, 179.0, 180.0, 271.0, 359.0])
        rad = np.radians(angles)
        got, valid = angle_from_cos_sin(np.cos(rad), np.sin(rad))
        assert valid.all()
        np.testing.assert_allclose(got, angles % 360, atol=1e-5)

    def test_accumulator_basic(self):
        from ccvpe_tpu.train.metrics import PoseErrorAccumulator
        acc = PoseErrorAccumulator()
        hm = np.zeros((1, 8, 8, 1), np.float32)
        hm[0, 2, 3, 0] = 1.0
        gt = np.zeros((1, 8, 8, 1), np.float32)
        gt[0, 5, 7, 0] = 1.0
        ori = np.zeros((1, 8, 8, 2), np.float32)
        ori[..., 0] = 1.0  # predicted 0 deg everywhere
        gto = np.zeros((1, 8, 8, 2), np.float32)
        gto[..., 1] = 1.0  # gt 90 deg
        acc.update(hm, gt, ori, gto, meter_per_pixel=2.0,
                   orientation_from_north=np.asarray([0.0]))
        s = acc.summary()
        want_px = np.hypot(3, 4)
        assert abs(s["mean_distance_m"] - want_px * 2.0) < 1e-6
        assert abs(s["mean_orientation_deg"] - 90.0) < 1e-6
        assert "lateral_recall@5m" in s

    def test_lateral_longitudinal_decomposition_hand_case(self):
        """Pins the reference decomposition math
        (``train_OxfordRobotCar.py:228-244``): gt at (5,7), pred at (2,3)
        is a 3-4-5 triangle; with heading 0 from north, gt2pred =
        atan2(4,3) = 53.13 deg, so longitudinal = |cos|*5px = 3px and
        lateral = |sin|*5px = 4px, times 2 m/px."""
        from ccvpe_tpu.train.metrics import PoseErrorAccumulator
        acc = PoseErrorAccumulator()
        hm = np.zeros((1, 8, 8, 1), np.float32)
        hm[0, 2, 3, 0] = 1.0
        gt = np.zeros((1, 8, 8, 1), np.float32)
        gt[0, 5, 7, 0] = 1.0
        ori = np.zeros((1, 8, 8, 2), np.float32)
        ori[..., 0] = 1.0
        acc.update(hm, gt, ori, ori, meter_per_pixel=2.0,
                   orientation_from_north=np.asarray([0.0]))
        s = acc.summary()
        assert abs(s["mean_longitudinal_m"] - 6.0) < 1e-6
        assert abs(s["median_longitudinal_m"] - 6.0) < 1e-6
        assert abs(s["mean_lateral_m"] - 8.0) < 1e-6
        assert abs(s["median_lateral_m"] - 8.0) < 1e-6
        # a second sample, heading 53.13 deg (aligned with gt->pred):
        # purely longitudinal
        acc2 = PoseErrorAccumulator()
        heading = np.degrees(np.arctan2(4, 3))
        acc2.update(hm, gt, ori, ori, meter_per_pixel=2.0,
                    orientation_from_north=np.asarray([heading]))
        s2 = acc2.summary()
        assert abs(s2["mean_longitudinal_m"] - 10.0) < 1e-5
        assert abs(s2["mean_lateral_m"] - 0.0) < 1e-5


class TestDeviceReadout:
    def test_readout_matches_host_accumulator(self):
        import jax.numpy as jnp
        from ccvpe_tpu.ops.readout import pose_readout
        from ccvpe_tpu.train.metrics import PoseErrorAccumulator

        rng = np.random.default_rng(11)
        b, h, w = 5, 24, 24
        hm = rng.random((b, h, w, 1)).astype(np.float32)
        gt = rng.random((b, h, w, 1)).astype(np.float32)
        ang = rng.uniform(0, 360, (b, h, w))
        ori = np.stack([np.cos(np.radians(ang)), np.sin(np.radians(ang))],
                       -1).astype(np.float32)
        ang2 = rng.uniform(0, 360, (b, h, w))
        gto = np.stack([np.cos(np.radians(ang2)), np.sin(np.radians(ang2))],
                       -1).astype(np.float32)
        heading = rng.uniform(0, 360, b)

        host = PoseErrorAccumulator()
        host.update(hm, gt, ori, gto, 2.0, orientation_from_north=heading)
        dev = PoseErrorAccumulator()
        r = pose_readout(jnp.asarray(hm), jnp.asarray(ori), jnp.asarray(gt),
                         jnp.asarray(gto))
        dev.update_from_readout({k: np.asarray(v) for k, v in r.items()},
                                2.0, orientation_from_north=heading)
        hs, ds = host.summary(), dev.summary()
        assert hs.keys() == ds.keys()
        for k in hs:
            assert abs(hs[k] - ds[k]) < 1e-5, (k, hs[k], ds[k])


class TestFactoredGT:
    def test_factored_equals_binned_total_loss(self):
        """The factored (pooled-gaussian x weights) objective must equal the
        dense binned-volume objective bit-for-bit (maxpool commutes with the
        non-negative per-sample bin weights)."""
        from ccvpe_tpu.models.cvm import CVMOutputs

        rng = np.random.default_rng(13)
        b, hw, bins = 3, 128, 20
        row = jnp.asarray(rng.uniform(-20, 20, b), jnp.float32)
        col = jnp.asarray(rng.uniform(-20, 20, b), jnp.float32)
        ang = jnp.asarray(rng.uniform(0, 360, b), jnp.float32)

        gt4, gwo, omap = gt_ops.synthesize_batch(
            row, col, ang, height=hw, width=hw, bins=bins)
        gt3, weights, omap2 = gt_ops.synthesize_batch_factored(
            row, col, ang, height=hw, width=hw, bins=bins)
        np.testing.assert_array_equal(np.asarray(gt4[..., 0]),
                                      np.asarray(gt3))
        np.testing.assert_array_equal(np.asarray(omap), np.asarray(omap2))

        stacks = tuple(
            jnp.asarray(rng.standard_normal((b, hw >> k, hw >> k, bins)),
                        jnp.float32) for k in (6, 5, 4, 3, 2, 1))
        logits = jnp.asarray(rng.standard_normal((b, hw * hw)), jnp.float32)
        ori = jnp.asarray(rng.standard_normal((b, hw, hw, 2)), jnp.float32)
        out = CVMOutputs(logits, None, ori, stacks)

        la, pa = L.total_loss(out, gt3, weights, omap)
        lb, pb = L.total_loss_binned(out, gt4, gwo, omap)
        for k in pa:
            assert abs(float(pa[k]) - float(pb[k])) < 1e-5 * max(
                1, abs(float(pb[k]))), (k, pa[k], pb[k])
