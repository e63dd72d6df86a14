"""TPU-native EfficientNet-B0 feature extractor.

Functional re-design of the backbone the reference vendors
(``efficientnet_pytorch/model.py``, ``efficientnet_pytorch/utils.py``):
NHWC layout, explicit param/state pytrees, static shapes, one traced graph.

Parity-relevant reference semantics reproduced (see docstrings below for the
exact citations):

* B0 block table ``r1_k3_s11_e1_i32_o16_se0.25`` ... (``utils.py:645-655``).
* SE reduce width uses the block's *declared* input_filters
  (``model.py:79``), which for repeated blocks is the previous block's
  output_filters.
* Static SAME padding computed from the construction-time 224 trace
  (``model.py:174-208`` with ``global_params.image_size == 224`` from
  ``utils.py:613``), NOT from the runtime input size.
* Circular (wrap) horizontal padding applies to every conv of the ground
  panorama encoder when enabled (``model.py:48-88``).
* Stochastic depth rate 0.2 scaled by block index
  (``model.py:262-264``).

Public surface:
    b0_config(circular)                  -> B0Config (static specs)
    b0_init(key, cfg)                    -> (params, state)
    b0_apply(cfg, params, state, x, ...) -> (head_features, multiscale, state)

``multiscale`` holds all 16 MBConv block outputs, mirroring
``extract_features_multiscale`` (``model.py:303-326``); ``head_features`` is
the 1280-channel output of the head conv, mirroring ``extract_features``
(``model.py:278-301``).
"""

from __future__ import annotations

import math
from typing import NamedTuple

import jax
import jax.numpy as jnp

from .layers import (
    ConvSpec,
    adaptive_avg_pool_1x1,
    bn_apply,
    bn_init,
    conv_apply,
    conv_init,
    drop_connect,
    same_pad,
    silu,
    traced_output_hw,
)


class BlockArgs(NamedTuple):
    num_repeat: int
    kernel: int
    stride: int
    expand: int
    cin: int
    cout: int
    se_ratio: float


# EfficientNet-B0 block table (reference ``efficientnet_pytorch/utils.py:647-655``).
B0_BLOCK_ARGS = (
    BlockArgs(1, 3, 1, 1, 32, 16, 0.25),
    BlockArgs(2, 3, 2, 6, 16, 24, 0.25),
    BlockArgs(2, 5, 2, 6, 24, 40, 0.25),
    BlockArgs(3, 3, 2, 6, 40, 80, 0.25),
    BlockArgs(3, 5, 1, 6, 80, 112, 0.25),
    BlockArgs(4, 5, 2, 6, 112, 192, 0.25),
    BlockArgs(1, 3, 1, 6, 192, 320, 0.25),
)

B0_IMAGE_SIZE = 224  # efficientnet_params table (``utils.py:613``)
B0_STEM_CH = 32
B0_HEAD_CH = 1280
DROP_CONNECT_RATE = 0.2  # ``utils.py:688`` / GlobalParams

# Reduced 5-block backbone with the same stride/skip structure as B0 — used
# by fast tests and multi-chip dry runs (not a reference architecture).
NANO_BLOCK_ARGS = (
    BlockArgs(1, 3, 1, 1, 8, 8, 0.25),
    BlockArgs(1, 3, 2, 2, 8, 12, 0.25),
    BlockArgs(1, 3, 2, 2, 12, 16, 0.25),
    BlockArgs(1, 3, 2, 2, 16, 24, 0.25),
    BlockArgs(1, 3, 2, 2, 24, 32, 0.25),
)

# (width_coefficient, depth_coefficient, resolution) per model
# (reference ``efficientnet_pytorch/utils.py:611-623``; dropout unused here)
EFFICIENTNET_PARAMS = {
    "efficientnet-b0": (1.0, 1.0, 224),
    "efficientnet-b1": (1.0, 1.1, 240),
    "efficientnet-b2": (1.1, 1.2, 260),
    "efficientnet-b3": (1.2, 1.4, 300),
    "efficientnet-b4": (1.4, 1.8, 380),
    "efficientnet-b5": (1.6, 2.2, 456),
    "efficientnet-b6": (1.8, 2.6, 528),
    "efficientnet-b7": (2.0, 3.1, 600),
}


def round_filters(filters: int, width: float, divisor: int = 8) -> int:
    """Width scaling (reference ``efficientnet_pytorch/utils.py:83-107``)."""
    if width == 1.0:
        return filters
    filters *= width
    new = max(divisor, int(filters + divisor / 2) // divisor * divisor)
    if new < 0.9 * filters:  # don't round down by more than 10%
        new += divisor
    return int(new)


def round_repeats(repeats: int, depth: float) -> int:
    """Depth scaling (reference ``efficientnet_pytorch/utils.py:110-126``)."""
    if depth == 1.0:
        return repeats
    return int(math.ceil(depth * repeats))


def scaled_block_args(width: float, depth: float):
    return tuple(
        a._replace(num_repeat=round_repeats(a.num_repeat, depth),
                   cin=round_filters(a.cin, width),
                   cout=round_filters(a.cout, width))
        for a in B0_BLOCK_ARGS)


def _efficientnet_backbone(name: str):
    width, depth, res = EFFICIENTNET_PARAMS[name]
    return (scaled_block_args(width, depth), round_filters(32, width),
            round_filters(1280, width), res)


BACKBONES = {
    "b0": (B0_BLOCK_ARGS, B0_STEM_CH, B0_HEAD_CH, B0_IMAGE_SIZE),
    "nano": (NANO_BLOCK_ARGS, 8, 256, B0_IMAGE_SIZE),
}
BACKBONES.update({name.split("-")[1]: _efficientnet_backbone(name)
                  for name in EFFICIENTNET_PARAMS})


class BlockSpec(NamedTuple):
    expand_conv: ConvSpec | None
    depthwise_conv: ConvSpec
    se_reduce: ConvSpec
    se_expand: ConvSpec
    project_conv: ConvSpec
    id_skip: bool


class B0Config(NamedTuple):
    circular: bool
    stem: ConvSpec
    blocks: tuple[BlockSpec, ...]
    head: ConvSpec


def _block_spec(args: BlockArgs, traced_hw, circular: bool):
    mid = args.cin * args.expand
    expand = None
    if args.expand != 1:
        expand = ConvSpec(args.cin, mid, 1, 1, circular=circular)
    depthwise = ConvSpec(
        mid, mid, args.kernel, args.stride, groups=mid,
        pad=same_pad(traced_hw, args.kernel, args.stride), circular=circular)
    se_ch = max(1, int(args.cin * args.se_ratio))
    se_reduce = ConvSpec(mid, se_ch, 1, bias=True)
    se_expand = ConvSpec(se_ch, mid, 1, bias=True)
    project = ConvSpec(mid, args.cout, 1, circular=circular)
    id_skip = args.stride == 1 and args.cin == args.cout
    return BlockSpec(expand, depthwise, se_reduce, se_expand, project, id_skip)


def backbone_config(name: str, circular: bool = False) -> B0Config:
    """Build a static backbone spec, tracking the construction-time image
    size the same way the reference constructor does (``model.py:174-208``)."""
    block_args, stem_ch, head_ch, image_size = BACKBONES[name]
    hw = (image_size, image_size)
    stem = ConvSpec(3, stem_ch, 3, 2, pad=same_pad(hw, 3, 2),
                    circular=circular)
    hw = traced_output_hw(hw, 2)
    blocks = []
    for args in block_args:
        blocks.append(_block_spec(args, hw, circular))
        hw = traced_output_hw(hw, args.stride)
        repeat_args = args._replace(cin=args.cout, stride=1)
        for _ in range(args.num_repeat - 1):
            blocks.append(_block_spec(repeat_args, hw, circular))
    head = ConvSpec(block_args[-1].cout, head_ch, 1, circular=circular)
    return B0Config(circular, stem, tuple(blocks), head)


def b0_config(circular: bool = False) -> B0Config:
    return backbone_config("b0", circular)


def _block_init(key, spec: BlockSpec, dtype):
    keys = jax.random.split(key, 5)
    params, state = {}, {}
    if spec.expand_conv is not None:
        params["expand_conv"] = conv_init(keys[0], spec.expand_conv, dtype)
        params["bn0"], state["bn0"] = bn_init(spec.expand_conv.cout, dtype)
    params["depthwise_conv"] = conv_init(keys[1], spec.depthwise_conv, dtype)
    params["bn1"], state["bn1"] = bn_init(spec.depthwise_conv.cout, dtype)
    params["se_reduce"] = conv_init(keys[2], spec.se_reduce, dtype)
    params["se_expand"] = conv_init(keys[3], spec.se_expand, dtype)
    params["project_conv"] = conv_init(keys[4], spec.project_conv, dtype)
    params["bn2"], state["bn2"] = bn_init(spec.project_conv.cout, dtype)
    return params, state


def b0_init(key, cfg: B0Config, dtype=jnp.float32):
    keys = jax.random.split(key, len(cfg.blocks) + 2)
    params = {"conv_stem": conv_init(keys[0], cfg.stem, dtype)}
    state = {}
    params["bn0"], state["bn0"] = bn_init(cfg.stem.cout, dtype)
    params["blocks"], state["blocks"] = [], []
    for i, spec in enumerate(cfg.blocks):
        p, s = _block_init(keys[1 + i], spec, dtype)
        params["blocks"].append(p)
        state["blocks"].append(s)
    params["conv_head"] = conv_init(keys[-1], cfg.head, dtype)
    params["bn1"], state["bn1"] = bn_init(cfg.head.cout, dtype)
    return params, state


def _block_apply(spec: BlockSpec, params, state, x, *, train, dc_rate, rng):
    """MBConv forward (reference ``efficientnet_pytorch/model.py:90-131``)."""
    new_state = dict(state)
    inputs = x
    if spec.expand_conv is not None:
        x = conv_apply(params["expand_conv"], x, spec.expand_conv)
        x, new_state["bn0"] = bn_apply(params["bn0"], state["bn0"], x, train=train)
        x = silu(x)
    x = conv_apply(params["depthwise_conv"], x, spec.depthwise_conv)
    x, new_state["bn1"] = bn_apply(params["bn1"], state["bn1"], x, train=train)
    x = silu(x)

    se = adaptive_avg_pool_1x1(x)
    se = conv_apply(params["se_reduce"], se, spec.se_reduce)
    se = silu(se)
    se = conv_apply(params["se_expand"], se, spec.se_expand)
    x = jax.nn.sigmoid(se) * x

    x = conv_apply(params["project_conv"], x, spec.project_conv)
    x, new_state["bn2"] = bn_apply(params["bn2"], state["bn2"], x, train=train)

    if spec.id_skip:
        if train and dc_rate and rng is not None:
            x = drop_connect(x, dc_rate, rng)
        x = x + inputs
    return x, new_state


def b0_apply(cfg: B0Config, params, state, x, *, train: bool = False,
             rng=None, remat: bool = False):
    """Run stem + 16 MBConv blocks + head.

    Returns ``(head_features, multiscale, new_state)`` where ``multiscale`` is
    the list of all block outputs (``extract_features_multiscale``,
    reference ``model.py:303-326``).

    ``remat=True`` checkpoints each MBConv block (block outputs are saved for
    the backward pass; block internals are recomputed) — the activation-
    memory lever for large train batches.
    """
    new_state = {}
    x = conv_apply(params["conv_stem"], x, cfg.stem)
    x, new_state["bn0"] = bn_apply(params["bn0"], state["bn0"], x, train=train)
    x = silu(x)

    n = len(cfg.blocks)
    rngs = jax.random.split(rng, n) if (train and rng is not None) else [None] * n
    multiscale = []
    new_state["blocks"] = []
    for i, spec in enumerate(cfg.blocks):
        dc_rate = DROP_CONNECT_RATE * i / n  # ``model.py:262-264``

        def block_fn(p, s, v, r, spec=spec, dc_rate=dc_rate):
            return _block_apply(spec, p, s, v, train=train, dc_rate=dc_rate,
                                rng=r)

        if remat:
            block_fn = jax.checkpoint(block_fn)
        x, bs = block_fn(params["blocks"][i], state["blocks"][i], x, rngs[i])
        new_state["blocks"].append(bs)
        multiscale.append(x)

    x = conv_apply(params["conv_head"], x, cfg.head)
    x, new_state["bn1"] = bn_apply(params["bn1"], state["bn1"], x, train=train)
    x = silu(x)
    return x, multiscale, new_state
