"""EfficientNet-B0 parity vs the reference implementation (used as a
numerical oracle with random weights — no network/pretrained files needed)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from ccvpe_tpu.nn import efficientnet as effnet
from ccvpe_tpu.io.torch_import import import_b0
from tests.conftest import assert_close


def _make_ref_model(torch, circular):
    from efficientnet_pytorch.model import EfficientNet

    model = EfficientNet.from_name("efficientnet-b0", circular)
    model.eval()
    return model


@pytest.mark.parametrize("circular", [False, True])
def test_b0_extract_features_parity(torch_oracle, circular):
    torch = torch_oracle
    model = _make_ref_model(torch, circular)
    sd = {k: v.detach().numpy() for k, v in model.state_dict().items()}

    cfg = effnet.b0_config(circular)
    params, state = import_b0(sd)

    x = np.random.default_rng(7).standard_normal((2, 3, 64, 128),
                                                 dtype=np.float32)
    with torch.no_grad():
        ref_feat, ref_ms = model.extract_features_multiscale(torch.tensor(x))

    feat, ms, _ = jax.jit(
        lambda p, s, v: effnet.b0_apply(cfg, p, s, v, train=False)
    )(params, state, jnp.asarray(x.transpose(0, 2, 3, 1)))

    assert feat.shape == (2, 2, 4, 1280)
    assert_close(np.asarray(feat).transpose(0, 3, 1, 2), ref_feat.numpy(),
                 atol=2e-4, rtol=1e-3)
    assert len(ms) == 16
    for i in (0, 2, 4, 10, 15):  # the skip connections CCVPE consumes
        assert_close(np.asarray(ms[i]).transpose(0, 3, 1, 2),
                     ref_ms[i].numpy(), atol=2e-4, rtol=1e-3,
                     msg=f"block {i}")


def test_b0_oxford_odd_input_shapes(torch_oracle):
    """The Oxford ground branch feeds 154x231 inputs through pads computed
    for the 224 trace (reference quirk, see SURVEY.md §7)."""
    torch = torch_oracle
    model = _make_ref_model(torch, circular=False)
    sd = {k: v.detach().numpy() for k, v in model.state_dict().items()}

    cfg = effnet.b0_config(False)
    params, state = import_b0(sd)

    x = np.random.default_rng(8).standard_normal((1, 3, 154, 231),
                                                 dtype=np.float32)
    with torch.no_grad():
        ref = model.extract_features(torch.tensor(x)).numpy()

    feat, _, _ = effnet.b0_apply(cfg, params, state,
                                 jnp.asarray(x.transpose(0, 2, 3, 1)),
                                 train=False)
    assert np.asarray(feat).transpose(0, 3, 1, 2).shape == ref.shape
    # reference descriptor heads assume a 4x7 grid (models.py:964,1053-1058)
    assert feat.shape[1:3] == (4, 7)
    assert_close(np.asarray(feat).transpose(0, 3, 1, 2), ref,
                 atol=2e-4, rtol=1e-3)


def test_b0_init_shapes_match_import():
    """Randomly-initialized param tree has identical treedef/shapes to an
    imported one (so checkpoints round-trip against fresh inits)."""
    import sys
    sys.path.insert(0, "/root/reference")
    torch = pytest.importorskip("torch")
    model = _make_ref_model(torch, False)
    sd = {k: v.detach().numpy() for k, v in model.state_dict().items()}
    cfg = effnet.b0_config(False)
    p_imp, s_imp = import_b0(sd)
    p_new, s_new = effnet.b0_init(jax.random.PRNGKey(0), cfg)

    flat_imp = jax.tree_util.tree_leaves_with_path(p_imp)
    flat_new = jax.tree_util.tree_leaves_with_path(p_new)
    assert len(flat_imp) == len(flat_new)
    for (ka, va), (kb, vb) in zip(flat_imp, flat_new):
        assert ka == kb
        assert va.shape == vb.shape, f"{ka}: {va.shape} vs {vb.shape}"
    assert jax.tree_util.tree_structure(s_imp) == jax.tree_util.tree_structure(s_new)


def test_b1_scaled_backbone_parity(torch_oracle):
    """round_filters/round_repeats + the per-model traced image size (240)
    must reproduce EfficientNet-B1 exactly."""
    torch = torch_oracle
    from efficientnet_pytorch.model import EfficientNet

    model = EfficientNet.from_name("efficientnet-b1", False)
    model.eval()
    sd = {k: v.detach().numpy() for k, v in model.state_dict().items()}

    cfg = effnet.backbone_config("b1")
    assert len(cfg.blocks) == 23
    params, state = import_b0(sd)

    x = np.random.default_rng(9).standard_normal((1, 3, 64, 96),
                                                 dtype=np.float32)
    with torch.no_grad():
        ref = model.extract_features(torch.tensor(x)).numpy()
    feat, _, _ = effnet.b0_apply(cfg, params, state,
                                 jnp.asarray(x.transpose(0, 2, 3, 1)),
                                 train=False)
    assert_close(np.asarray(feat).transpose(0, 3, 1, 2), ref, atol=2e-4,
                 rtol=1e-3)


def test_b0_train_mode_bn_parity(torch_oracle):
    """Training-mode forward (batch statistics + running-stat updates) vs
    torch, with stochastic depth disabled on both sides."""
    torch = torch_oracle
    import efficientnet_pytorch.model as enm

    model = _make_ref_model(torch, circular=False)
    # disable drop-connect for determinism (torch RNG != jax RNG)
    orig_dc = enm.drop_connect
    enm.drop_connect = lambda x, p, training: x
    try:
        model.train()
        sd = {k: v.detach().numpy().copy()
              for k, v in model.state_dict().items()}
        x = np.random.default_rng(10).standard_normal((4, 3, 64, 96),
                                                      dtype=np.float32)
        with torch.no_grad():
            ref = model.extract_features(torch.tensor(x)).numpy()
    finally:
        enm.drop_connect = orig_dc

    cfg = effnet.b0_config(False)
    params, state = import_b0(sd)
    feat, _, new_state = effnet.b0_apply(
        cfg, params, state, jnp.asarray(x.transpose(0, 2, 3, 1)),
        train=True, rng=None)  # rng=None disables drop-connect
    assert_close(np.asarray(feat).transpose(0, 3, 1, 2), ref, atol=5e-4,
                 rtol=1e-2)
    # running stats updated identically (torch mutated them in-place)
    for i in (0, 5, 15):
        want_mean = model.state_dict()[f"_blocks.{i}._bn1.running_mean"].numpy()
        got_mean = np.asarray(new_state["blocks"][i]["bn1"]["mean"])
        assert_close(got_mean, want_mean, atol=1e-4, rtol=1e-3,
                     msg=f"block {i} running mean")
        want_var = model.state_dict()[f"_blocks.{i}._bn1.running_var"].numpy()
        got_var = np.asarray(new_state["blocks"][i]["bn1"]["var"])
        assert_close(got_var, want_var, atol=1e-4, rtol=1e-3,
                     msg=f"block {i} running var")
