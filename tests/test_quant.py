"""Post-training int8 quantization (``nn/quant.py``).

The quantized path is a deployment capability with no reference
counterpart (the reference serves the f32 torch forward); these tests pin
its mechanics: exact int8 conv math, jitted calibration capture, tree
rewriting, closeness of the quantized forward to the float forward, and
that the lowered program really contains int8 convolutions.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ccvpe_tpu.models import cvm
from ccvpe_tpu.nn import quant
from ccvpe_tpu.nn.layers import ConvSpec, conv_apply, conv_init


def test_int8_conv_matches_manual():
    key = jax.random.PRNGKey(0)
    spec = ConvSpec(8, 16, 3, bias=True, pad=((1, 1), (1, 1)))
    params = conv_init(key, spec)
    params["b"] = jnp.linspace(-1, 1, 16, dtype=jnp.float32)
    x = jax.random.normal(jax.random.PRNGKey(1), (2, 6, 6, 8), jnp.float32)

    absmax = float(jnp.max(jnp.abs(x)))
    qnode = quant._quantize_conv(params, absmax)
    y = conv_apply(qnode, x, spec)

    # manual: quantize input with the same scale, integer conv, dequantize
    sx = absmax / 127.0
    xq = np.clip(np.round(np.asarray(x) / sx), -127, 127)
    wq = np.asarray(qnode["w"], np.float32)
    ref = jax.lax.conv_general_dilated(
        jnp.asarray(xq), jnp.asarray(wq), (1, 1), ((1, 1), (1, 1)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    ref = ref * sx * np.asarray(qnode["q_sw"]) + np.asarray(params["b"])
    np.testing.assert_allclose(np.asarray(y), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)


@pytest.fixture(scope="module")
def nano_setup():
    cfg = cvm.PRESETS["NANO"]
    params, state = cvm.init(jax.random.PRNGKey(0), cfg)
    grd = jax.random.normal(jax.random.PRNGKey(1), (2, *cfg.grd_hw, 3))
    sat = jax.random.normal(jax.random.PRNGKey(2), (2, *cfg.sat_hw, 3))

    def fwd(p, g, s):
        out, _ = cvm.forward(cfg, p, state, g, s, train=False)
        return out

    ranges = quant.calibrate(fwd, params, [(grd, sat)])
    return cfg, params, state, grd, sat, fwd, ranges


def test_calibration_captures_convs(nano_setup):
    _, params, _, _, _, _, ranges = nano_setup
    # stems, MBConv convs, descriptor 1x1s, decoder double-convs...
    assert "grd_efficientnet/conv_stem" in ranges
    assert "sat_efficientnet/conv_stem" in ranges
    assert any(k.startswith("conv6/") or k == "conv6" for k in ranges), ranges
    assert all(v > 0 for v in ranges.values())
    # deconvs and plain matmuls never execute as convs -> never captured
    assert not any("deconv" in k for k in ranges)
    assert "sat_feature_to_descriptors" not in ranges


def test_quantize_params_rewrites_tree(nano_setup):
    _, params, _, _, _, _, ranges = nano_setup
    qparams = quant.quantize_params(params, ranges)
    stem = qparams["grd_efficientnet"]["conv_stem"]
    assert stem["w"].dtype == jnp.int8
    assert stem["q_sw"].shape == (stem["w"].shape[-1],)
    assert stem["q_sx"].shape == ()
    # depthwise convs stay float (default_select: VPU-bound, int8 loses);
    # expand/project convs inside the same blocks go int8
    blocks = qparams["grd_efficientnet"]["blocks"]
    dw = [b["depthwise_conv"]["w"].dtype for b in blocks]
    assert dw and all(d != jnp.int8 for d in dw)
    assert any(b["project_conv"]["w"].dtype == jnp.int8 for b in blocks)
    assert quant.quantized_fraction(qparams) > 0.5


def test_quantized_forward_close_to_float(nano_setup):
    _, params, _, grd, sat, fwd, ranges = nano_setup
    qparams = quant.quantize_params(params, ranges)
    out_f = jax.jit(fwd)(params, grd, sat)
    out_q = jax.jit(fwd)(qparams, grd, sat)

    def cos(a, b):
        a = np.asarray(a, np.float64).ravel()
        b = np.asarray(b, np.float64).ravel()
        return float(a @ b / (np.linalg.norm(a) * np.linalg.norm(b) + 1e-12))

    assert cos(out_f.logits_flattened, out_q.logits_flattened) > 0.98
    assert cos(out_f.ori, out_q.ori) > 0.98
    # heatmap stays a distribution
    np.testing.assert_allclose(
        np.asarray(out_q.heatmap).reshape(2, -1).sum(-1), 1.0, rtol=1e-3)


def test_api_quantize_int8_serves_and_blocks_export(tmp_path):
    from ccvpe_tpu import api

    cfg = cvm.PRESETS["NANO"]
    params, state = cvm.init(jax.random.PRNGKey(0), cfg)
    model = api.CVMModel(cfg, params, state)
    rng = np.random.default_rng(0)
    grd = rng.integers(0, 256, (2, *cfg.grd_hw, 3), dtype=np.uint8)
    sat = rng.integers(0, 256, (2, *cfg.sat_hw, 3), dtype=np.uint8)
    before = model.predict_batch(grd, sat, ori_noise=0)

    model.quantize_int8(calib=[(grd, sat)])
    from ccvpe_tpu.nn.quant import quantized_fraction
    assert quantized_fraction(model.params) > 0.5
    after = model.predict_batch(grd, sat, ori_noise=0)
    assert len(after) == 2 and all(np.isfinite(p.probability) for p in after)
    # same argmax cell for most inputs is not guaranteed at random init;
    # the probability mass must stay sane
    assert all(0 <= p.probability <= 1 for p in after)
    del before
    with pytest.raises(ValueError, match="int8-quantized"):
        model.save_torch(str(tmp_path / "q.pt"))
    # double application is an error, not silent scale corruption
    with pytest.raises(ValueError, match="already int8-quantized"):
        model.quantize_int8(calib=[(grd, sat)])
    # export DOES work on the quantized model: the artifact carries the
    # int8 forward and reproduces the quantized in-process prediction
    api.export_model(model, str(tmp_path / "q_export"), batch=2,
                     ori_noise=0)
    exported = api.ExportedModel(str(tmp_path / "q_export"))
    re = exported.predict_batch(grd, sat)
    np.testing.assert_allclose(
        [p.probability for p in re], [p.probability for p in after],
        rtol=1e-4, atol=1e-5)
    np.testing.assert_array_equal([p.row for p in re],
                                  [p.row for p in after])


def test_quantize_params_skips_already_quantized(nano_setup):
    _, params, _, _, _, _, ranges = nano_setup
    q1 = quant.quantize_params(params, ranges)
    q2 = quant.quantize_params(q1, ranges)
    stem1 = q1["grd_efficientnet"]["conv_stem"]
    stem2 = q2["grd_efficientnet"]["conv_stem"]
    np.testing.assert_array_equal(np.asarray(stem1["w"]),
                                  np.asarray(stem2["w"]))
    np.testing.assert_array_equal(np.asarray(stem1["q_sw"]),
                                  np.asarray(stem2["q_sw"]))


def _fake_conv(kh, kw, cin_g, cout):
    return {"w": np.zeros((kh, kw, cin_g, cout), np.float32)}


def test_resolve_select_policies():
    assert quant.resolve_select("") is quant.default_select
    assert quant.resolve_select("all") is quant.default_select
    # mxu default threshold 240: per-output-pixel intensity
    # K^2*Cin*Cout/(Cin+Cout)
    sel = quant.resolve_select("mxu")
    # fat decoder 3x3: 9*128*128/256 = 576 -> kept
    assert sel("d", _fake_conv(3, 3, 128, 128))
    # narrow 1x1 expand: 1*16*96/112 ~= 13.7 -> dropped
    assert not sel("e", _fake_conv(1, 1, 16, 96))
    # wide 1x1: 1*320*1280/1600 = 256 -> kept at 240, dropped at mxu:300
    assert sel("w", _fake_conv(1, 1, 320, 1280))
    assert not quant.resolve_select("mxu:300")("w", _fake_conv(1, 1, 320,
                                                               1280))
    # depthwise (I==1 HWIO) always excluded, any policy
    dw = _fake_conv(3, 3, 1, 64)
    assert not sel("dw", dw) and not quant.default_select("dw", dw)
    with pytest.raises(ValueError, match="unknown quant selection"):
        quant.resolve_select("tpu")
    with pytest.raises(ValueError, match="bad mxu threshold"):
        quant.resolve_select("mxu:")
    with pytest.raises(ValueError, match="bad mxu threshold"):
        quant.resolve_select("mxu:fast")


def test_mxu_select_quantizes_subset(nano_setup):
    _, params, _, _, _, _, ranges = nano_setup
    q_all = quant.quantize_params(params, ranges)
    # NANO's convs are all narrow; a scaled-down threshold exercises the
    # same keep-the-fat-convs/drop-the-narrow-ones split the default 240
    # makes on the full-size model
    q_mxu = quant.quantize_params(params, ranges,
                                  select=quant.mxu_bound_select(10.0))
    f_all = quant.quantized_fraction(q_all)
    f_mxu = quant.quantized_fraction(q_mxu)
    assert 0 < f_mxu < f_all
    # at full-size intensity the tiny model quantizes nothing
    q_240 = quant.quantize_params(params, ranges,
                                  select=quant.mxu_bound_select())
    assert quant.quantized_fraction(q_240) == 0.0


def test_quantized_lowering_contains_int8_convs(nano_setup):
    _, params, _, grd, sat, fwd, ranges = nano_setup
    qparams = quant.quantize_params(params, ranges)
    text = jax.jit(fwd).lower(qparams, grd, sat).as_text()
    assert "stablehlo.convolution" in text
    assert "xi8>" in text  # int8 conv operands present in the program
