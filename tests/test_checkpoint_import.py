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
