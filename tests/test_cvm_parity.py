"""Full-model forward parity: ccvpe_tpu CVM vs the reference torch models
(random weights, eval mode) across all four variants.

The reference models are built via ``from_name`` (no network) by patching the
pretrained-weight classmethod; weights then flow torch -> ``import_cvm`` ->
this framework, and outputs must agree.  This is the strongest available
stand-in for released-checkpoint parity in an offline environment: identical
weights, identical inputs, independently implemented graphs.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from ccvpe_tpu.io.torch_import import import_cvm
from ccvpe_tpu.models import cvm
from tests.conftest import assert_close


@pytest.fixture(scope="module")
def ref_models(torch_oracle):
    torch = torch_oracle
    import efficientnet_pytorch.model as enm

    # from_pretrained downloads weights; tests are offline -> build from_name
    orig = enm.EfficientNet.from_pretrained

    def _from_name(cls, model_name, circular, **kw):
        return cls.from_name(model_name, circular)

    enm.EfficientNet.from_pretrained = classmethod(_from_name)
    import models as reference_models  # /root/reference/models.py (oracle)

    yield torch, reference_models
    enm.EfficientNet.from_pretrained = orig


def _run_pair(torch, tmodel, cfg, grd_hw, sat_hw, loc_offsets=None, seed=0):
    tmodel.eval()
    sd = {k: v.detach().numpy() for k, v in tmodel.state_dict().items()}
    params, state = import_cvm(sd)

    rng = np.random.default_rng(seed)
    grd = rng.standard_normal((1, 3, *grd_hw), dtype=np.float32)
    sat = rng.standard_normal((1, 3, *sat_hw), dtype=np.float32)
    with torch.no_grad():
        ref = tmodel(torch.tensor(grd), torch.tensor(sat))

    fwd = jax.jit(lambda p, s, g, a: cvm.forward(
        cfg, p, s, g, a, train=False, loc_offsets=loc_offsets))
    out, _ = fwd(params, state, jnp.asarray(grd.transpose(0, 2, 3, 1)),
                 jnp.asarray(sat.transpose(0, 2, 3, 1)))
    return ref, out


def _check(ref, out, bins):
    (ref_logits, ref_heatmap, ref_ori, *ref_stacks) = ref
    assert_close(np.asarray(out.logits_flattened), ref_logits.numpy(),
                 atol=5e-3, rtol=1e-2, msg="logits")
    assert_close(np.asarray(out.heatmap).transpose(0, 3, 1, 2),
                 ref_heatmap.numpy(), atol=1e-6, rtol=1e-2, msg="heatmap")
    assert_close(np.asarray(out.ori).transpose(0, 3, 1, 2), ref_ori.numpy(),
                 atol=2e-3, rtol=1e-2, msg="ori")
    assert len(out.matching_scores) == 6
    for k, (mine, theirs) in enumerate(zip(out.matching_scores, ref_stacks)):
        assert_close(np.asarray(mine).transpose(0, 3, 1, 2), theirs.numpy(),
                     atol=2e-3, rtol=1e-2, msg=f"matching stack {k+1}")
    # pose readout must agree exactly
    pred_ref = np.unravel_index(np.argmax(ref_heatmap.numpy()[0, 0]),
                                ref_heatmap.shape[-2:])
    hm = np.asarray(out.heatmap)[0, :, :, 0]
    pred = np.unravel_index(np.argmax(hm), hm.shape)
    assert pred == pred_ref


def test_vigor_parity(ref_models):
    torch, rm = ref_models
    tmodel = rm.CVM_VIGOR("cpu", circular_padding=True)
    ref, out = _run_pair(torch, tmodel, cvm.VIGOR, (320, 640), (512, 512))
    _check(ref, out, 20)


def test_vigor_ori_prior_parity(ref_models):
    torch, rm = ref_models
    tmodel = rm.CVM_VIGOR_ori_prior("cpu", ori_noise=54.0,
                                    circular_padding=True)
    ref, out = _run_pair(torch, tmodel, cvm.VIGOR, (320, 640), (512, 512),
                         loc_offsets=tuple(range(-3, 4)))
    _check(ref, out, 20)


def test_kitti_parity(ref_models):
    torch, rm = ref_models
    tmodel = rm.CVM_KITTI("cpu")
    ref, out = _run_pair(torch, tmodel, cvm.KITTI, (256, 1024), (512, 512))
    _check(ref, out, 16)


def test_oxford_parity(ref_models):
    torch, rm = ref_models
    tmodel = rm.CVM_OxfordRobotCar("cpu")
    ref, out = _run_pair(torch, tmodel, cvm.OXFORD, (154, 231), (512, 512))
    _check(ref, out, 20)


def test_vigor_limited_fov_parity(ref_models):
    """Limited-HFoV eval (BASELINE config 3): panorama cropped to 180°,
    non-circular ground encoder, restricted orientation bins."""
    torch, rm = ref_models
    tmodel = rm.CVM_VIGOR_ori_prior("cpu", ori_noise=72.0,
                                    circular_padding=False)
    # 180° FoV -> half panorama width (reference train_VIGOR.py:272-273)
    import dataclasses
    cfg = dataclasses.replace(cvm.VIGOR, circular=False)
    ref, out = _run_pair(torch, tmodel, cfg, (320, 320), (512, 512),
                         loc_offsets=tuple(range(-4, 5)))
    _check(ref, out, 20)


def test_api_limited_fov_parity(ref_models, tmp_path):
    """BASELINE config 3 through the serving API (VERDICT item 10):
    api.load_model on a reference-format checkpoint + predict(fov=180,
    ori_noise=72) reproduces CVM_VIGOR_ori_prior(circular_padding=False) on
    the half-width panorama (mirrors test_vigor_limited_fov_parity)."""
    torch, rm = ref_models
    from ccvpe_tpu import api
    from ccvpe_tpu.data import transforms as T

    tmodel = rm.CVM_VIGOR_ori_prior("cpu", ori_noise=72.0,
                                    circular_padding=False)
    tmodel.eval()
    path = str(tmp_path / "ref.pt")
    torch.save(tmodel.state_dict(), path)
    model = api.load_model(path, preset="VIGOR")

    rng = np.random.default_rng(3)
    grd_u8 = rng.integers(0, 255, (320, 640, 3), dtype=np.uint8)
    sat_u8 = rng.integers(0, 255, (512, 512, 3), dtype=np.uint8)
    pose = model.predict(grd_u8, sat_u8, fov=180.0, ori_noise=72.0,
                         return_heatmap=True)

    mean = np.asarray(T.IMAGENET_MEAN, np.float32)
    std = np.asarray(T.IMAGENET_STD, np.float32)

    def norm(img):
        x = img.astype(np.float32) / 255.0
        return ((x - mean) / std).transpose(2, 0, 1)[None]

    with torch.no_grad():
        # reference eval crop: grd[..., :int(W*FoV/360)] (train_VIGOR.py:272)
        ref = tmodel(torch.tensor(norm(grd_u8)[:, :, :, :320]),
                     torch.tensor(norm(sat_u8)))
    ref_hm = ref[1].numpy()[0, 0]
    r, c = np.unravel_index(ref_hm.argmax(), ref_hm.shape)
    assert (pose.row, pose.col) == (r, c)
    np.testing.assert_allclose(pose.heatmap, ref_hm, atol=1e-6, rtol=1e-2)
