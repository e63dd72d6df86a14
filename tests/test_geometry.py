"""Device-side affine warps vs PIL (rotate nearest, translate bilinear, and
the composed KITTI alignment chain)."""

import numpy as np
import pytest
from PIL import Image

from ccvpe_tpu.ops import geometry


def _img(hw, seed=0):
    return np.random.default_rng(seed).integers(0, 255, (*hw, 3),
                                                dtype=np.uint8)


@pytest.mark.parametrize("angle", [0.0, -17.19, 33.3, 90.0, 181.7])
def test_rotate_nearest_matches_pil(angle):
    arr = _img((96, 128))
    want = np.asarray(Image.fromarray(arr).rotate(angle))
    got = np.asarray(geometry.warp_affine(
        arr, geometry.pil_rotate_matrix(angle, arr.shape[:2]),
        method="nearest"))
    # identical up to coordinate-rounding ties on pixel boundaries
    mismatch = np.mean(np.any(got != want, axis=-1))
    assert mismatch < 5e-3, f"{mismatch:.4f} of pixels differ"


@pytest.mark.parametrize("dx,dy", [(5.45, 1.31), (-12.7, 8.2), (0.0, 0.0)])
def test_translate_bilinear_matches_pil(dx, dy):
    arr = _img((64, 80), seed=1)
    want = np.asarray(Image.fromarray(arr).transform(
        (80, 64), Image.AFFINE, (1, 0, dx, 0, 1, dy),
        resample=Image.BILINEAR))
    got = np.asarray(geometry.warp_affine(
        arr, geometry.pil_translate_matrix(dx, dy), method="bilinear"))
    diff = np.abs(got.astype(int) - want.astype(int))
    assert np.mean(diff) < 0.2          # uint8 rounding
    assert np.mean(diff > 1) < 2e-2     # edges / fill boundary only


def test_kitti_chain_matches_host_pil_chain():
    """Composed device chain vs the exact host chain from data/kitti.py."""
    arr = _img((512, 512), seed=2)
    heading, mpp = 0.3, 0.1958
    cam = (1.08, 0.26)
    shift = (37.2, -21.5)
    ori = 7.3

    img = Image.fromarray(arr)
    r1 = img.rotate((-heading) / np.pi * 180)
    t1 = r1.transform(r1.size, Image.AFFINE,
                      (1, 0, cam[0] / mpp, 0, 1, cam[1] / mpp),
                      resample=Image.BILINEAR)
    t2 = t1.transform(t1.size, Image.AFFINE,
                      (1, 0, shift[0], 0, 1, -shift[1]),
                      resample=Image.BILINEAR)
    r2 = t2.rotate(ori)
    want = np.asarray(r2)  # 512 center crop of 512 input is identity

    got = np.asarray(geometry.kitti_alignment_chain(
        arr, heading, mpp, cam, shift, ori, side=512))
    diff = np.abs(got.astype(int) - want.astype(int))
    # nearest-rotation tie pixels + bilinear rounding; bulk must agree
    assert np.mean(diff <= 1) > 0.98
    assert np.median(diff) == 0


def test_batched_traced_chain_matches_per_sample():
    import jax
    import jax.numpy as jnp

    rng = np.random.default_rng(3)
    sat = rng.integers(0, 255, (2, 96, 96, 3), dtype=np.uint8)
    heading = np.asarray([0.3, -1.1], np.float32)
    sx = np.asarray([10.2, -3.3], np.float32)
    sy = np.asarray([-6.0, 4.5], np.float32)
    ori = np.asarray([7.3, -2.1], np.float32)

    batched = jax.jit(lambda s, h, x, y, o: geometry.kitti_alignment_chain_batched(
        s, h, 0.1958, (1.08, 0.26), x, y, o, side=64))(
            jnp.asarray(sat), jnp.asarray(heading), jnp.asarray(sx),
            jnp.asarray(sy), jnp.asarray(ori))
    for i in range(2):
        single = geometry.kitti_alignment_chain(
            sat[i], float(heading[i]), 0.1958, (1.08, 0.26),
            (float(sx[i]), float(sy[i])), float(ori[i]), side=64)
        diff = np.abs(np.asarray(batched[i]).astype(int)
                      - np.asarray(single).astype(int))
        # traced trig skips PIL's 15-decimal rounding: tiny tie differences
        assert np.mean(diff <= 1) > 0.99


def test_center_crop_torchvision_round_semantics():
    """center_crop stands in for torchvision TF.center_crop in the KITTI
    chain (reference datasets.py:464): the offset uses round (banker's),
    not floor — h=515, side=512 crops from row 2, not row 1."""
    import jax.numpy as jnp

    arr = np.arange(515 * 515 * 1, dtype=np.float32).reshape(515, 515, 1)
    got = np.asarray(geometry.center_crop(jnp.asarray(arr), 512))
    # torchvision: top = int(round((515 - 512) / 2.0)) == 2
    np.testing.assert_array_equal(got, arr[2:514, 2:514])


def test_center_crop_pads_when_larger_than_image():
    """side > image: zero-pad symmetrically (torchvision behavior), never
    slice from a negative start (which silently returns the wrong shape)."""
    import jax.numpy as jnp

    arr = np.ones((5, 8, 3), dtype=np.float32)
    got = np.asarray(geometry.center_crop(jnp.asarray(arr), 8))
    assert got.shape == (8, 8, 3)
    # 5 -> 8 pads (1, 2) rows (torchvision pads floor on the leading side)
    np.testing.assert_array_equal(got[1:6, :, :], arr)
    assert (got[0] == 0).all() and (got[6:] == 0).all()
