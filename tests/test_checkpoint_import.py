"""Torch checkpoint *file* round trip: reference model -> torch.save ->
CLI-style load (``load_state_dict`` + ``import_cvm``) -> identical params,
plus the visualizer entry point on synthetic data."""

import os
import sys

import numpy as np
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def test_torch_file_roundtrip(torch_oracle, tmp_path, monkeypatch):
    torch = torch_oracle
    import efficientnet_pytorch.model as enm

    monkeypatch.setattr(
        enm.EfficientNet, "from_pretrained",
        classmethod(lambda cls, name, circular, **kw: cls.from_name(
            name, circular)))
    import models as reference_models

    tmodel = reference_models.CVM_VIGOR("cpu", circular_padding=True)
    path = str(tmp_path / "model.pt")
    torch.save(tmodel.state_dict(), path)

    from ccvpe_tpu.io.torch_import import import_cvm, load_state_dict

    params, state = import_cvm(load_state_dict(path))
    # spot-check a few leaves against the live model
    w = tmodel.state_dict()["deconv6.weight"].numpy()
    np.testing.assert_array_equal(
        np.asarray(params["deconv6"]["w"]), w.transpose(0, 2, 3, 1))
    rm = tmodel.state_dict()["grd_efficientnet._bn0.running_mean"].numpy()
    np.testing.assert_array_equal(
        np.asarray(state["grd_efficientnet"]["bn0"]["mean"]), rm)


from tests.test_cli import synthetic_vigor  # noqa: F401  (fixture reuse)


def test_visualizer_smoke(synthetic_vigor, tmp_path):  # noqa: F811
    """Run the qualitative visualizer end to end (NANO preset, synthetic
    data, random weights) and check it renders an output image."""
    pytest.importorskip("matplotlib")
    # import by path: /root/reference on sys.path shadows the same-named file
    import importlib.util

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    spec = importlib.util.spec_from_file_location(
        "ccvpe_viz", os.path.join(repo,
                                  "visualize_qualitative_results_VIGOR.py"))
    viz = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(viz)

    out = str(tmp_path / "qual.png")
    viz.main(["--idx", "1", "--model_preset", "NANO", "--ori_noise", "0",
              "--dataset_root", synthetic_vigor, "--test_model_path", "",
              "--out", out])
    assert os.path.exists(out) and os.path.getsize(out) > 1000


@pytest.mark.slow
def test_pretrained_b0_init(torch_oracle, tmp_path):
    """--pretrained_b0: a raw EfficientNet-B0 state_dict file seeds both
    encoders of a fresh TrainState (reference ``from_pretrained`` init);
    non-encoder params stay at random init."""
    torch = torch_oracle
    import efficientnet_pytorch.model as enm
    import jax
    import numpy as np_

    b0 = enm.EfficientNet.from_name("efficientnet-b0", False)
    path = str(tmp_path / "b0.pth")
    torch.save(b0.state_dict(), path)

    from ccvpe_tpu.models import cvm
    from ccvpe_tpu.train import loop as train_loop

    opt = train_loop.make_optimizer()
    state = train_loop.create_train_state(
        cvm.TINY, jax.random.PRNGKey(0), opt, pretrained_b0=path)
    ref = train_loop.create_train_state(cvm.TINY, jax.random.PRNGKey(0), opt)

    stem = b0.state_dict()["_conv_stem.weight"].numpy().transpose(2, 3, 1, 0)
    for enc in ("grd_efficientnet", "sat_efficientnet"):
        np_.testing.assert_array_equal(
            np_.asarray(state.params[enc]["conv_stem"]["w"]), stem)
        np_.testing.assert_array_equal(
            np_.asarray(state.bn_state[enc]["bn1"]["mean"]),
            b0.state_dict()["_bn1.running_mean"].numpy())
    # non-encoder params untouched by the import
    np_.testing.assert_array_equal(
        np_.asarray(state.params["deconv6"]["w"]),
        np_.asarray(ref.params["deconv6"]["w"]))

    # a full-B0 file cannot seed the shrunken NANO backbone: fail fast with
    # a nameable shape mismatch, not an opaque conv error inside jit
    with pytest.raises(ValueError, match="do not match the configured"):
        train_loop.create_train_state(
            cvm.NANO, jax.random.PRNGKey(0), opt, pretrained_b0=path)


def test_torch_export_roundtrip(torch_oracle, monkeypatch):
    """export_cvm is the exact inverse of import_cvm: reference state_dict ->
    import -> export reproduces every tensor bit-for-bit (the unused _fc
    head is zero-filled), and the result strict-loads into the reference
    model."""
    torch = torch_oracle
    import efficientnet_pytorch.model as enm

    monkeypatch.setattr(
        enm.EfficientNet, "from_pretrained",
        classmethod(lambda cls, name, circular, **kw: cls.from_name(
            name, circular)))
    import models as reference_models

    from ccvpe_tpu.io.torch_import import export_cvm, import_cvm

    tmodel = reference_models.CVM_VIGOR("cpu", circular_padding=True)
    sd = {k: v.numpy() for k, v in tmodel.state_dict().items()}
    exported = export_cvm(*import_cvm(sd))

    assert set(exported) == set(sd)
    for k, v in sd.items():
        if "._fc." in k or k.startswith("_fc."):
            continue
        np.testing.assert_array_equal(exported[k], v, err_msg=k)

    tmodel.load_state_dict(
        {k: torch.from_numpy(np.ascontiguousarray(v))
         for k, v in exported.items()}, strict=True)
