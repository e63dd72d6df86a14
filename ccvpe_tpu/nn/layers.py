"""Core NN ops for the TPU-native CCVPE rebuild.

Everything here is a pure function over explicit parameter pytrees, NHWC layout,
designed to trace cleanly under ``jax.jit`` with static shapes.

Semantics intentionally reproduced from the reference (cited for parity checks,
not translated):

* TensorFlow-style "SAME" padding whose pad amounts are computed from a
  *construction-time* traced image size, not the runtime input size
  (reference ``efficientnet_pytorch/utils.py:254-282``,
  ``Conv2dStaticSamePadding``).  This matters: the reference builds every
  backbone for image_size=224, then feeds e.g. 154x231 Oxford crops through
  it, so the pad amounts are the 224-trace ones.
* Horizontal circular ("wrap") padding + vertical zero padding for 360-degree
  panoramas (reference ``efficientnet_pytorch/utils.py:330-358``,
  ``Conv2dStaticCircularPadding``).
* BatchNorm with momentum 0.99 (TF convention) and eps 1e-3
  (reference ``efficientnet_pytorch/utils.py:658-671``), torch running-stat
  update rules (biased batch var for normalization, unbiased for the running
  estimate).
* ConvTranspose2d(kernel=2, stride=2) exactly as torch computes it
  (reference ``models.py:109-148``); with k==s there is no overlap, so it is
  a single matmul + pixel-shuffle, which is the MXU-native formulation.
"""

from __future__ import annotations

import math
from typing import NamedTuple

import jax
import jax.numpy as jnp
from jax import lax

Pad2d = tuple[tuple[int, int], tuple[int, int]]

NO_PAD: Pad2d = ((0, 0), (0, 0))


def silu(x):
    """Swish/SiLU (reference ``efficientnet_pytorch/utils.py:54-80``)."""
    return x * jax.nn.sigmoid(x)


def same_pad(traced_hw: tuple[int, int], kernel: int, stride: int,
             dilation: int = 1) -> Pad2d:
    """TF 'SAME' pad amounts for a traced (construction-time) image size.

    Mirrors ``Conv2dStaticSamePadding.__init__``
    (reference ``efficientnet_pytorch/utils.py:261-277``).
    """
    ih, iw = traced_hw
    oh, ow = math.ceil(ih / stride), math.ceil(iw / stride)
    pad_h = max((oh - 1) * stride + (kernel - 1) * dilation + 1 - ih, 0)
    pad_w = max((ow - 1) * stride + (kernel - 1) * dilation + 1 - iw, 0)
    return ((pad_h // 2, pad_h - pad_h // 2), (pad_w // 2, pad_w - pad_w // 2))


def traced_output_hw(traced_hw: tuple[int, int], stride: int) -> tuple[int, int]:
    """Construction-time image-size bookkeeping
    (reference ``efficientnet_pytorch/utils.py:174-191``)."""
    ih, iw = traced_hw
    return (math.ceil(ih / stride), math.ceil(iw / stride))


def pad2d(x, pad: Pad2d, circular: bool = False):
    """Pad an NHWC tensor; horizontal wrap + vertical zeros when ``circular``.

    Mirrors the padding order of the reference circular conv: horizontal
    circular first, then vertical zeros
    (``efficientnet_pytorch/utils.py:313-315``).
    """
    (pt, pb), (pl, pr) = pad
    if circular and (pl or pr):
        x = jnp.pad(x, ((0, 0), (0, 0), (pl, pr), (0, 0)), mode="wrap")
        pl = pr = 0
    if pt or pb or pl or pr:
        x = jnp.pad(x, ((0, 0), (pt, pb), (pl, pr), (0, 0)))
    return x


class ConvSpec(NamedTuple):
    """Static configuration of one conv layer (shapes + padding are build-time)."""

    cin: int
    cout: int
    kernel: int
    stride: int = 1
    groups: int = 1
    bias: bool = False
    pad: Pad2d = NO_PAD
    circular: bool = False


def conv_init(key, spec: ConvSpec, dtype=jnp.float32):
    """Kaiming-uniform init matching torch Conv2d defaults (fan_in, a=sqrt(5))."""
    k = spec.kernel
    fan_in = spec.cin // spec.groups * k * k
    bound = math.sqrt(1.0 / fan_in)
    wkey, bkey = jax.random.split(key)
    # torch kaiming_uniform_(a=sqrt(5)) => U(-sqrt(6/((1+5)fan_in)), ...) = U(-1/sqrt(fan_in), ...)
    w = jax.random.uniform(wkey, (k, k, spec.cin // spec.groups, spec.cout),
                           dtype, -bound, bound)
    params = {"w": w}
    if spec.bias:
        params["b"] = jax.random.uniform(bkey, (spec.cout,), dtype, -bound, bound)
    return params


# Trace-time hook used by ``nn.quant`` calibration: when set, called with
# (params, x) for every conv before it executes, inside the caller's trace.
_conv_observer = None


def conv_apply(params, x, spec: ConvSpec):
    """NHWC conv with build-time static padding (and optional circular wrap).

    If the params node carries PTQ fields (``q_sx``/``q_sw``, produced by
    ``nn.quant.quantize_params``) the conv runs on the MXU's 2x-rate int8
    path instead; the branch is on dict *structure*, so it is static under
    ``jit`` and needs no signature change at any call site.
    """
    if _conv_observer is not None:
        _conv_observer(params, x)
    if "q_sx" in params:
        return _conv_apply_int8(params, x, spec)
    x = pad2d(x, spec.pad, spec.circular)
    y = lax.conv_general_dilated(
        x, params["w"].astype(x.dtype),
        window_strides=(spec.stride, spec.stride),
        padding="VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        feature_group_count=spec.groups,
    )
    if "b" in params:
        y = y + params["b"].astype(y.dtype)
    return y


def _conv_apply_int8(params, x, spec: ConvSpec):
    """Post-training-quantized conv: int8 activations (calibrated static
    per-tensor scale ``q_sx``) x int8 weights (per-output-channel scales
    ``q_sw``), int32 accumulation, dequantized f32 epilogue.

    The activation quantize is elementwise with a *constant* scale, so XLA
    fuses it into the producer/consumer — no extra reduction pass (the
    reason calibrated static scales beat dynamic per-batch quantization,
    see ``benchmarks/quant_microbench.py``).  Padding happens on the int8
    tensor (zero pad and circular wrap are exact in the quantized domain).
    """
    out_dtype = x.dtype
    inv_sx = (1.0 / params["q_sx"]).astype(jnp.float32)
    xq = jnp.clip(jnp.round(x.astype(jnp.float32) * inv_sx),
                  -127.0, 127.0).astype(jnp.int8)
    xq = pad2d(xq, spec.pad, spec.circular)
    y = lax.conv_general_dilated(
        xq, params["w"],
        window_strides=(spec.stride, spec.stride),
        padding="VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        feature_group_count=spec.groups,
        preferred_element_type=jnp.int32,
    )
    scale = (params["q_sx"] * params["q_sw"]).astype(jnp.float32)
    y = (y.astype(jnp.float32) * scale).astype(out_dtype)
    if "b" in params:
        y = y + params["b"].astype(out_dtype)
    return y


# ---------------------------------------------------------------------------
# BatchNorm


def bn_init(c: int, dtype=jnp.float32):
    params = {"scale": jnp.ones((c,), dtype), "bias": jnp.zeros((c,), dtype)}
    state = {"mean": jnp.zeros((c,), dtype), "var": jnp.ones((c,), dtype)}
    return params, state


def bn_apply(params, state, x, *, train: bool, momentum: float = 0.01,
             eps: float = 1e-3):
    """BatchNorm over NHWC; returns (y, new_state).

    ``momentum`` follows the torch convention (contribution of the new batch),
    i.e. the reference's bn_mom = 1 - 0.99 = 0.01
    (``efficientnet_pytorch/model.py:52``).
    """
    scale = params["scale"]
    bias = params["bias"]
    if train:
        mean = jnp.mean(x, axis=(0, 1, 2))
        var = jnp.var(x, axis=(0, 1, 2))  # biased, used for normalization
        n = x.shape[0] * x.shape[1] * x.shape[2]
        unbiased = var * (n / max(n - 1, 1))
        new_state = {
            "mean": (1 - momentum) * state["mean"] + momentum * mean,
            "var": (1 - momentum) * state["var"] + momentum * unbiased,
        }
    else:
        mean, var = state["mean"], state["var"]
        new_state = state
    inv = scale * lax.rsqrt(var + eps)
    y = (x - mean.astype(x.dtype)) * inv.astype(x.dtype) + bias.astype(x.dtype)
    return y, new_state


# ---------------------------------------------------------------------------
# Transposed conv (kernel 2, stride 2) and pooling


def deconv2x2_init(key, cin: int, cout: int, dtype=jnp.float32):
    """torch ConvTranspose2d(cin, cout, 2, 2) init (fan_in = cin * k * k... torch
    uses weight shape [cin, cout, 2, 2] and init bound 1/sqrt(cout*2*2) for the
    transposed conv's fan_in).  Stored as [cin, 2, 2, cout]."""
    fan_in = cout * 2 * 2  # torch _ConvTransposeNd fan_in uses in_channels of
    # the *underlying* conv = weight.size(1)*k*k = cout*4
    bound = math.sqrt(1.0 / fan_in)
    wkey, bkey = jax.random.split(key)
    w = jax.random.uniform(wkey, (cin, 2, 2, cout), dtype, -bound, bound)
    b = jax.random.uniform(bkey, (cout,), dtype, -bound, bound)
    return {"w": w, "b": b}


def deconv2x2_apply(params, x):
    """Exact torch ConvTranspose2d(k=2, s=2):

    y[b, 2h+a, 2w+c, o] = sum_i x[b,h,w,i] * W[i,a,c,o] + bias[o]
    (no output overlap because kernel == stride).

    Lowered through ``lax.conv_transpose`` (spatially flipped kernel gives
    the bit-identical scatter): the TPU conv emitter writes the upsampled
    output directly, where the equivalent einsum + pixel-shuffle reshape
    materializes a full-size layout copy — measured 13.6 vs 36.2 ms on the
    [128,256,256,41]→512² stage, and the copies were ~8% of the whole
    forward.
    """
    w = params["w"].astype(x.dtype)          # [cin, 2, 2, cout]
    wt = w.transpose(1, 2, 0, 3)[::-1, ::-1]  # HWIO, spatially flipped
    y = lax.conv_transpose(x, wt, strides=(2, 2), padding="VALID",
                           dimension_numbers=("NHWC", "HWIO", "NHWC"))
    return y + params["b"].astype(x.dtype)


def max_pool(x, window: int, stride: int | None = None):
    """NHWC max pooling (used for GT heatmap downsampling,
    reference ``train_VIGOR.py:123-128``)."""
    stride = stride or window
    return lax.reduce_window(
        x, -jnp.inf, lax.max,
        (1, window, window, 1), (1, stride, stride, 1), "VALID")


def max_pool_same(x, kernel: int, stride: int, pad: Pad2d,
                  circular: bool = False):
    """TF-'SAME' max pooling with build-time pad amounts, optional horizontal
    wrap — the functional equivalent of the reference's four
    ``MaxPool2d*SamePadding`` classes (``efficientnet_pytorch/utils.py:
    384-492``; unused by EfficientNet itself, provided for parity).

    Matches torch semantics: zero padding then max (torch F.pad with zeros
    before max_pool2d), so negative activations at the border can be clipped
    to the pad value exactly as the reference does.
    """
    x = pad2d(x, pad, circular)  # zeros, like the reference's F.pad default
    return lax.reduce_window(
        x, -jnp.inf, lax.max,
        (1, kernel, kernel, 1), (1, stride, stride, 1), "VALID")


def adaptive_avg_pool_1x1(x):
    """Global average pool to 1x1 (squeeze-excite input,
    reference ``efficientnet_pytorch/model.py:114``)."""
    return jnp.mean(x, axis=(1, 2), keepdims=True)


def drop_connect(x, rate: float, rng):
    """Stochastic depth, matching the reference's per-sample Bernoulli
    formulation (``efficientnet_pytorch/utils.py:129-154``)."""
    keep = 1.0 - rate
    mask = keep + jax.random.uniform(rng, (x.shape[0], 1, 1, 1), x.dtype)
    mask = jnp.floor(mask)
    return x / keep * mask


def l2_normalize(x, axis: int, eps: float = 1e-12):
    """F.normalize(p=2) semantics: x / max(||x||, eps) (reference ``models.py:33-40``)."""
    norm = jnp.sqrt(jnp.sum(jnp.square(x), axis=axis, keepdims=True))
    return x / jnp.maximum(norm, eps)
