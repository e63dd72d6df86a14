"""The CVM model family — one config-driven, shape-polymorphic implementation
of the reference's four variants:

* ``CVM_VIGOR``               (reference ``models.py:49-343``)   -> VIGOR preset
* ``CVM_VIGOR_ori_prior``     (reference ``models.py:346-652``)  -> VIGOR preset
  + restricted ``loc_offsets`` at inference
* ``CVM_KITTI``               (reference ``models.py:655-950``)  -> KITTI preset
* ``CVM_OxfordRobotCar``      (reference ``models.py:954-1244``) -> OXFORD preset

Architecture (NHWC, functional, one jittable graph):
ground EfficientNet-B0 (optionally circular-padded) -> six multi-scale ground
descriptors -> satellite EfficientNet-B0 multiscale -> 2x2-chunk satellite
descriptor grid (one reshape + matmul, vs the reference's 64-iteration
chunk/cat loop, ``models.py:173-184``) -> six interleaved
matching + Localization-Matching-Upsampling decoder stages -> softmax heatmap,
plus a parallel orientation decoder emitting a dense (cos, sin) field.

All orientation-bin matching runs through ``ops.matching`` (two MXU matmuls
per scale instead of the reference's 20-roll loop).

Faithful quirks preserved (see SURVEY.md §7 "hard parts"):
* KITTI's 6th-scale roll shift is 8, not 2 (``models.py:910``).
* Oxford uses a centered channel window (``models.py:1094``).
* The ori-prior variant computes a restricted stack for localization but a
  full-bin stack at the bottleneck for the orientation decoder
  (``models.py:489-511``), and returns the full stack as output #4.
"""

from __future__ import annotations

import math
from dataclasses import dataclass
from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..nn import efficientnet as effnet
from ..nn.layers import (
    ConvSpec,
    conv_apply,
    conv_init,
    deconv2x2_apply,
    deconv2x2_init,
    l2_normalize,
)
from ..ops.matching import matching_scores, matching_scores_reference

N_SCALES = 6
B0_SKIP_BLOCKS = (15, 10, 4, 2, 0)  # reference ``models.py:167-171``
B0_SKIP_CH = (320, 112, 40, 24, 16)


@dataclass(frozen=True)
class CVMConfig:
    name: str
    bins: int
    circular: bool                   # ground-encoder horizontal wrap padding
    window: str                      # 'first' | 'center'
    sat_desc_dim: int                # 1280 (VIGOR/Oxford) | 2048 (KITTI)
    grd_desc_ch: tuple[int, ...]     # per-scale 1x1-conv channels
    grd_feat_hw: tuple[int, int]     # ground feature-volume H, W
    shifts: tuple[int, ...]          # per-scale channel roll shift
    loc_deconv_ch: tuple[int, ...]   # 6 deconv output widths (loc branch)
    loc_conv_ch: tuple[int, ...]     # 5 double_conv output widths (loc branch)
    ori_deconv_ch: tuple[int, ...]
    ori_conv_ch: tuple[int, ...]
    grd_hw: tuple[int, int]          # input image sizes (for presets/docs)
    sat_hw: tuple[int, int]
    backbone: str = "b0"
    feat_dim: int = 1280             # backbone head width
    skip_blocks: tuple[int, ...] = B0_SKIP_BLOCKS
    skip_ch: tuple[int, ...] = B0_SKIP_CH

    @property
    def grd_desc_len(self) -> tuple[int, ...]:
        w = self.grd_feat_hw[1]
        return tuple(c * w for c in self.grd_desc_ch)


VIGOR = CVMConfig(
    name="VIGOR", bins=20, circular=True, window="first", sat_desc_dim=1280,
    grd_desc_ch=(64, 32, 16, 8, 4, 2), grd_feat_hw=(10, 20),
    shifts=(64, 32, 16, 8, 4, 2),
    loc_deconv_ch=(1024, 320, 160, 80, 40, 16),
    loc_conv_ch=(640, 320, 160, 80, 40),
    ori_deconv_ch=(1024, 256, 128, 64, 32, 16),
    ori_conv_ch=(640, 256, 128, 64, 32),
    grd_hw=(320, 640), sat_hw=(512, 512))

KITTI = CVMConfig(
    name="KITTI", bins=16, circular=False, window="first", sat_desc_dim=2048,
    grd_desc_ch=(16, 8, 4, 2, 1, 1), grd_feat_hw=(8, 32),
    shifts=(128, 64, 32, 16, 8, 8),  # scale-6 shift 8 quirk (models.py:910)
    loc_deconv_ch=(1024, 256, 128, 64, 32, 16),
    loc_conv_ch=(512, 256, 128, 128, 32),  # conv3 widens to 128 (models.py:720)
    ori_deconv_ch=(1024, 256, 128, 64, 32, 16),
    ori_conv_ch=(512, 256, 128, 64, 32),
    grd_hw=(256, 1024), sat_hw=(512, 512))

OXFORD = CVMConfig(
    name="OxfordRobotCar", bins=20, circular=False, window="center",
    sat_desc_dim=1280,
    grd_desc_ch=(32, 16, 8, 4, 2, 1), grd_feat_hw=(4, 7),
    shifts=(64, 32, 16, 8, 4, 2),
    loc_deconv_ch=(1024, 320, 160, 80, 40, 16),
    loc_conv_ch=(640, 320, 160, 80, 40),
    ori_deconv_ch=(1024, 256, 128, 64, 32, 16),
    ori_conv_ch=(640, 256, 128, 64, 32),
    grd_hw=(154, 231), sat_hw=(512, 512))

# Small config for unit tests and multi-chip dry runs: VIGOR channel schedule,
# reduced spatial extent (sat 128 -> 2x2 descriptor grid -> 128 heatmap).
TINY = CVMConfig(
    name="TINY", bins=20, circular=True, window="first", sat_desc_dim=1280,
    grd_desc_ch=(64, 32, 16, 8, 4, 2), grd_feat_hw=(2, 4),
    shifts=(64, 32, 16, 8, 4, 2),
    loc_deconv_ch=(1024, 320, 160, 80, 40, 16),
    loc_conv_ch=(640, 320, 160, 80, 40),
    ori_deconv_ch=(1024, 256, 128, 64, 32, 16),
    ori_conv_ch=(640, 256, 128, 64, 32),
    grd_hw=(64, 128), sat_hw=(128, 128))

# Minimal config for train-mechanics tests and multi-chip dry runs: NANO
# backbone, 4 bins, same 6-stage decoder structure.
NANO = CVMConfig(
    name="NANO", bins=4, circular=True, window="first", sat_desc_dim=256,
    grd_desc_ch=(16, 8, 4, 2, 2, 1), grd_feat_hw=(2, 4),
    shifts=(64, 8, 4, 2, 2, 2),
    loc_deconv_ch=(64, 32, 16, 8, 8, 8),
    loc_conv_ch=(32, 16, 8, 8, 8),
    ori_deconv_ch=(64, 32, 16, 8, 8, 8),
    ori_conv_ch=(32, 16, 8, 8, 8),
    grd_hw=(64, 128), sat_hw=(128, 128),
    backbone="nano", feat_dim=256,
    skip_blocks=(4, 3, 2, 1, 0), skip_ch=(32, 24, 16, 12, 8))

PRESETS = {"VIGOR": VIGOR, "KITTI": KITTI, "OxfordRobotCar": OXFORD,
           "TINY": TINY, "NANO": NANO}


class CVMOutputs(NamedTuple):
    """Mirrors the reference forward's 9-tuple (``models.py:343``), NHWC."""

    logits_flattened: jax.Array          # [B, H*W]
    heatmap: jax.Array                   # [B, H, W, 1]
    ori: jax.Array                       # [B, H, W, 2] (cos, sin)
    matching_scores: tuple[jax.Array, ...]  # 6 x [B, h_k, w_k, bins_k]


def _linear_init(key, cin, cout, dtype):
    bound = math.sqrt(1.0 / cin)
    wk, bk = jax.random.split(key)
    return {"w": jax.random.uniform(wk, (cin, cout), dtype, -bound, bound),
            "b": jax.random.uniform(bk, (cout,), dtype, -bound, bound)}


def _double_conv_specs(cin, cout, final_out=None):
    a = ConvSpec(cin, cout, 3, bias=True, pad=((1, 1), (1, 1)))
    b = ConvSpec(cout, final_out or cout, 3, bias=True, pad=((1, 1), (1, 1)))
    return a, b


def _double_conv_init(key, cin, cout, dtype, final_out=None):
    a, b = _double_conv_specs(cin, cout, final_out)
    ka, kb = jax.random.split(key)
    return {"conv_a": conv_init(ka, a, dtype), "conv_b": conv_init(kb, b, dtype)}


def _double_conv_apply(params, x, cin, cout, final_out=None):
    a, b = _double_conv_specs(cin, cout, final_out)
    x = conv_apply(params["conv_a"], x, a)
    x = jax.nn.relu(x)
    return conv_apply(params["conv_b"], x, b)


def _decoder_widths(cfg: CVMConfig, branch: str):
    """(deconv_in, deconv_out, conv_in, conv_out) per stage, derived exactly
    as the reference layer table (``models.py:108-148``)."""
    if branch == "loc":
        dec_out, conv_out = cfg.loc_deconv_ch, cfg.loc_conv_ch
        first_in = cfg.sat_desc_dim + 1
        extra = 1  # max-score channel concatenated at every stage
        final = 1
    else:
        dec_out, conv_out = cfg.ori_deconv_ch, cfg.ori_conv_ch
        first_in = cfg.sat_desc_dim + cfg.bins
        extra = 0
        final = 2
    stages = []
    x_ch = first_in
    for s in range(N_SCALES):
        d_in = x_ch
        d_out = dec_out[s]
        if s < 5:
            c_in = d_out + cfg.skip_ch[s]
            c_out = conv_out[s]
            x_ch = c_out + extra
        else:
            c_in, c_out = d_out, (16, final)
        stages.append((d_in, d_out, c_in, c_out))
    return stages


def init(key, cfg: CVMConfig, dtype=jnp.float32):
    """Initialize (params, state) with torch-default distributions."""
    keys = iter(jax.random.split(key, 64))
    b0_grd = effnet.backbone_config(cfg.backbone, cfg.circular)
    b0_sat = effnet.backbone_config(cfg.backbone, False)
    params, state = {}, {}
    params["grd_efficientnet"], state["grd_efficientnet"] = effnet.b0_init(
        next(keys), b0_grd, dtype)
    params["sat_efficientnet"], state["sat_efficientnet"] = effnet.b0_init(
        next(keys), b0_sat, dtype)
    h = cfg.grd_feat_hw[0]
    for k in range(N_SCALES):
        params[f"grd_feature_to_descriptor{k+1}"] = {
            "conv_c": conv_init(
                next(keys),
                ConvSpec(cfg.feat_dim, cfg.grd_desc_ch[k], 1, bias=True),
                dtype),
            "conv_h": conv_init(next(keys), ConvSpec(h, 1, 1, bias=True), dtype),
        }
    params["sat_feature_to_descriptors"] = _linear_init(
        next(keys), cfg.feat_dim * 2 * 2, cfg.sat_desc_dim, dtype)
    for branch, suffix in (("loc", ""), ("ori", "_ori")):
        for s, (d_in, d_out, c_in, c_out) in enumerate(
                _decoder_widths(cfg, branch)):
            name = N_SCALES - s  # reference names run 6..1
            params[f"deconv{name}{suffix}"] = deconv2x2_init(
                next(keys), d_in, d_out, dtype)
            if s < 5:
                params[f"conv{name}{suffix}"] = _double_conv_init(
                    next(keys), c_in, c_out, dtype)
            else:
                params[f"conv{name}{suffix}"] = _double_conv_init(
                    next(keys), c_in, c_out[0], dtype, final_out=c_out[1])
    return params, state


def _grd_descriptor(params, feat):
    """Descriptor head: 1x1 conv to C_k channels, collapse height with a
    learned H-vector, flatten width-major (reference ``models.py:57-97``;
    torch flatten of [B,1,W,C] yields (w, c) ordering)."""
    y = conv_apply(params["conv_c"], feat,
                   ConvSpec(feat.shape[-1], params["conv_c"]["w"].shape[-1], 1,
                            bias=True))
    wh = params["conv_h"]["w"][0, 0, :, 0]
    bh = params["conv_h"]["b"][0]
    d = jnp.einsum("bhwc,h->bwc", y, wh.astype(y.dtype)) + bh.astype(y.dtype)
    return d.reshape(d.shape[0], -1)


def _sat_descriptor_grid(params, feat):
    """8x8 grid of 2x2-chunk descriptors as one reshape + matmul
    (replaces the reference's chunk/unbind/cat loops, ``models.py:173-184``)."""
    b, h, w, c = feat.shape
    gh, gw = h // 2, w // 2
    x = feat.reshape(b, gh, 2, gw, 2, c).transpose(0, 1, 3, 2, 4, 5)
    x = x.reshape(b, gh, gw, 2 * 2 * c)
    return jnp.einsum("bhwi,io->bhwo", x,
                      params["w"].astype(x.dtype)) + params["b"].astype(x.dtype)


def forward(cfg: CVMConfig, params, state, grd, sat, *,
            train: bool = False, rng=None, loc_offsets=None,
            use_reference_matching: bool = False,
            matching_impl: str = "einsum",
            remat: bool | str = False):
    """Full CVM forward.

    Args:
      grd: [B, Hg, Wg, 3] ground image (NHWC, ImageNet-normalized).
      sat: [B, Hs, Ws, 3] aerial image.
      loc_offsets: orientation-bin offsets used for the localization branch;
        ``None`` -> all bins (CVM_VIGOR semantics).  Pass
        ``range(-n, n+1)`` with ``n = ori_noise/18`` for the ori-prior
        variant (``models.py:489``).
      use_reference_matching: route matching through the naive roll
        formulation (numerics pinning / interpret mode).
      matching_impl: 'einsum' (default), 'pallas' (fused TPU kernel where the
        channel count makes it profitable, einsum elsewhere), or 'reference'.
      remat: rematerialization scope for the backward pass.  ``False`` saves
        every activation; ``True``/``"all"`` checkpoints each MBConv block
        and decoder stage; ``"encoder"`` checkpoints only the two backbone
        encoders (the deconv tail's large activations stay resident);
        ``"decoder"`` only the decoder stages.

    Returns: (CVMOutputs, new_state)
    """
    if remat not in (False, True, "all", "encoder", "decoder"):
        raise ValueError(
            f"remat must be False/True/'all'/'encoder'/'decoder', got "
            f"{remat!r}")  # a typo'd scope must not silently disable remat
    remat_enc = remat in (True, "all", "encoder")
    remat_dec = remat in (True, "all", "decoder")
    if use_reference_matching or matching_impl == "reference":
        match = matching_scores_reference
    elif matching_impl == "pallas":
        from ..ops.pallas_matching import matching_scores_pallas

        def match(x, g, shift, offsets, window):
            # lane-padding makes the fused kernel unprofitable below ~128
            # channels (see benchmarks); dispatch per scale
            if x.shape[-1] >= 128:
                return matching_scores_pallas(x, g, shift, tuple(offsets),
                                              window)
            return matching_scores(x, g, shift, offsets, window)
    else:
        match = matching_scores

    def match_epi(x, g, shift, offsets, window):
        """Matching + LMU epilogue.  Pallas v2 path: the kernel also emits
        max-over-bins and the l2-normalized features from the same VMEM
        tile; the einsum path fuses the same epilogue analytically (the
        matching denominator and ``l2_normalize`` share one sum-of-squares,
        ``ops.matching.matching_scores_with_norm``).  Only the reference
        roll formulation keeps the epilogue in the stage body."""
        if (matching_impl == "pallas" and x.shape[-1] >= 128
                and g.shape[-1] == x.shape[-1]):
            from ..ops.pallas_matching import matching_epilogue_pallas

            return matching_epilogue_pallas(x, g, shift, tuple(offsets),
                                            window)
        if match is matching_scores:
            from ..ops.matching import matching_scores_with_norm

            return matching_scores_with_norm(x, g, shift, tuple(offsets),
                                             window)
        return match(x, g, shift, offsets, window), None, None
    full_bins = tuple(range(cfg.bins))
    loc_bins = full_bins if loc_offsets is None else tuple(loc_offsets)

    new_state = {}
    rngs = jax.random.split(rng, 2) if rng is not None else (None, None)
    b0_grd = effnet.backbone_config(cfg.backbone, cfg.circular)
    b0_sat = effnet.backbone_config(cfg.backbone, False)

    grd_feat, _, new_state["grd_efficientnet"] = effnet.b0_apply(
        b0_grd, params["grd_efficientnet"], state["grd_efficientnet"], grd,
        train=train, rng=rngs[0], remat=remat_enc)
    descs = [
        _grd_descriptor(params[f"grd_feature_to_descriptor{k+1}"], grd_feat)
        for k in range(N_SCALES)]

    sat_feat, ms, new_state["sat_efficientnet"] = effnet.b0_apply(
        b0_sat, params["sat_efficientnet"], state["sat_efficientnet"], sat,
        train=train, rng=rngs[1], remat=remat_enc)
    skips = [ms[i] for i in cfg.skip_blocks]

    sat_desc = _sat_descriptor_grid(params["sat_feature_to_descriptors"],
                                    sat_feat)

    loc_widths = _decoder_widths(cfg, "loc")
    stacks = []
    sat_desc_norm = None
    x = sat_desc
    for s in range(N_SCALES):
        stack, smax, xnorm = match_epi(x, descs[s], cfg.shifts[s], loc_bins,
                                       cfg.window)
        if s == 0 and xnorm is not None:
            sat_desc_norm = xnorm  # bin-independent; reused by the ori branch
        if s == 0 and loc_bins != full_bins:
            # ori-prior: the orientation decoder (and returned stack) use the
            # full bin range at the bottleneck (``models.py:501-511``)
            full_stack = match(x, descs[s], cfg.shifts[s], full_bins,
                               cfg.window)
        elif s == 0:
            full_stack = stack
        stacks.append(full_stack if s == 0 else stack)
        d_in, d_out, c_in, c_out = loc_widths[s]
        name = N_SCALES - s

        def loc_stage(x, stack, dec_p, conv_p, skip, s=s, c_in=c_in,
                      c_out=c_out):
            score_max = jnp.max(stack, axis=-1, keepdims=True)
            x = jnp.concatenate([score_max, l2_normalize(x, axis=-1)],
                                axis=-1)
            x = deconv2x2_apply(dec_p, x)
            if s < 5:
                x = jnp.concatenate([x, skip], axis=-1)
                return _double_conv_apply(conv_p, x, c_in, c_out)
            return _double_conv_apply(conv_p, x, c_in, c_out[0],
                                      final_out=c_out[1])

        def loc_stage_fused(smax, xnorm, dec_p, conv_p, skip, s=s,
                            c_in=c_in, c_out=c_out):
            x = jnp.concatenate([smax, xnorm], axis=-1)
            x = deconv2x2_apply(dec_p, x)
            if s < 5:
                x = jnp.concatenate([x, skip], axis=-1)
                return _double_conv_apply(conv_p, x, c_in, c_out)
            return _double_conv_apply(conv_p, x, c_in, c_out[0],
                                      final_out=c_out[1])

        if remat_dec:
            loc_stage = jax.checkpoint(loc_stage)
            loc_stage_fused = jax.checkpoint(loc_stage_fused)
        skip = skips[s] if s < 5 else jnp.zeros((), x.dtype)
        if smax is not None:
            x = loc_stage_fused(smax, xnorm, params[f"deconv{name}"],
                                params[f"conv{name}"], skip)
        else:
            x = loc_stage(x, stack, params[f"deconv{name}"],
                          params[f"conv{name}"], skip)

    b = x.shape[0]
    logits = x.reshape(b, -1)
    heatmap = jax.nn.softmax(logits, axis=-1).reshape(x.shape)

    ori_widths = _decoder_widths(cfg, "ori")
    y = jnp.concatenate(
        [stacks[0],
         sat_desc_norm if sat_desc_norm is not None
         else l2_normalize(sat_desc, axis=-1)], axis=-1)
    for s in range(N_SCALES):
        d_in, d_out, c_in, c_out = ori_widths[s]
        name = N_SCALES - s

        def ori_stage(y, dec_p, conv_p, skip, s=s, c_in=c_in, c_out=c_out):
            y = deconv2x2_apply(dec_p, y)
            if s < 5:
                y = jnp.concatenate([y, skip], axis=-1)
                return _double_conv_apply(conv_p, y, c_in, c_out)
            return _double_conv_apply(conv_p, y, c_in, c_out[0],
                                      final_out=c_out[1])

        if remat_dec:
            ori_stage = jax.checkpoint(ori_stage)
        y = ori_stage(y, params[f"deconv{name}_ori"],
                      params[f"conv{name}_ori"],
                      skips[s] if s < 5 else jnp.zeros((), y.dtype))
    y = l2_normalize(y, axis=-1)

    return CVMOutputs(logits, heatmap, y, tuple(stacks)), new_state
