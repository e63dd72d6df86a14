"""Post-training int8 quantization (PTQ) for inference.

The VIGOR inference forward is HBM-bandwidth-bound at ~83% of the v5e's
819 GB/s with all MXU work in bf16 (ARCHITECTURE.md).  The TPU MXU runs
int8 at 2x the bf16 rate, and ``benchmarks/quant_microbench.py`` measured
the hot conv shapes at 1.1-1.38x with *pre-quantized* activations (static
scales) while *dynamic* per-batch quantization (a max-reduction inside the
step) is a wash.  Hence this module implements classic calibrated PTQ:

1. ``calibrate``: run a few batches through the unmodified forward with a
   trace-time observer on ``layers.conv_apply`` and record each conv's
   input absmax.  The capture itself is jitted — one compiled forward that
   also returns the per-conv maxima — so calibration runs at device speed.
2. ``quantize_params``: rewrite selected conv param nodes to
   ``{"w": int8 HWIO, "q_sw": [cout] f32, "q_sx": scalar f32, ("b": ...)}``.
   ``conv_apply`` dispatches on that structure (``layers.py``), so the
   model code — EfficientNet blocks, decoder double-convs, descriptor
   heads — is untouched and every call site gains the int8 path for free.

Weights are per-output-channel symmetric int8; activations per-tensor
symmetric with the calibrated scale, quantized elementwise by a constant
(fuses into the surrounding fusion; no reduction).  Depthwise convs are
excluded by default: they are VPU-bound, not MXU-bound, and measured
*slower* in int8 (microbench dw 3x3: 0.90x).  Deconvs, the height-collapse
einsum, the sat descriptor matmul and the matching einsums stay bf16.

Quantized trees are inference-only artifacts (no gradient path) — like any
deployment-quantized checkpoint, derive them from a trained f32/bf16 tree.

The reference framework has no quantized inference; this is a
serving-deployment capability of the TPU rebuild (reference inference runs
the f32 torch forward, ``/root/reference/train_VIGOR.py:244-338``).
"""

from __future__ import annotations

import contextlib
from typing import Callable

import jax
import jax.numpy as jnp
import numpy as np
from jax import tree_util

from . import layers


def _path_str(path) -> str:
    parts = []
    for p in path:
        if isinstance(p, tree_util.DictKey):
            parts.append(str(p.key))
        elif isinstance(p, tree_util.SequenceKey):
            parts.append(str(p.idx))
        else:  # GetAttrKey / FlattenedIndexKey
            parts.append(str(p))
    return "/".join(parts)


@contextlib.contextmanager
def _observing(observer):
    prev = layers._conv_observer
    layers._conv_observer = observer
    try:
        yield
    finally:
        layers._conv_observer = prev


def capture_conv_ranges(fn: Callable):
    """Wrap ``fn(params, *args, **kw)`` into ``(out, ranges)`` where
    ``ranges`` maps each executed conv's param-node path (e.g.
    ``"grd_efficientnet/conv_stem"``) to ``max|input|`` as a traced f32
    scalar.  Capture happens at trace time, so the wrapper is jittable;
    convs applied more than once contribute a running max.
    """

    def wrapped(params, *args, **kwargs):
        idmap = {}
        for path, leaf in tree_util.tree_flatten_with_path(params)[0]:
            # key conv nodes by the identity of their weight leaf; the
            # observer sees the same (traced) objects the tree holds
            idmap[id(leaf)] = _path_str(path[:-1])
        ranges: dict[str, jax.Array] = {}

        def obs(p, x):
            key = idmap.get(id(p.get("w"))) if isinstance(p, dict) else None
            if key is None:
                return
            m = jnp.max(jnp.abs(x.astype(jnp.float32)))
            ranges[key] = jnp.maximum(ranges[key], m) if key in ranges else m

        with _observing(obs):
            out = fn(params, *args, **kwargs)
        return out, ranges

    return wrapped


def calibrate(forward: Callable, params, batches, *, jit: bool = True
              ) -> dict[str, float]:
    """Run ``forward(params, *batch)`` over calibration ``batches`` and
    return ``{conv_path: input absmax}`` as host floats.

    ``forward`` is any function taking ``(params, *batch)`` — e.g. a
    closure over ``cvm.forward`` with the target config/state.  The
    instrumented forward is compiled once and reused across batches.
    """
    captured = capture_conv_ranges(lambda p, *b: forward(p, *b))

    def ranges_only(p, *b):
        return captured(p, *b)[1]

    fn = jax.jit(ranges_only) if jit else ranges_only
    acc: dict[str, float] = {}
    for batch in batches:
        r = jax.device_get(fn(params, *batch))
        for k, v in r.items():
            acc[k] = max(acc.get(k, 0.0), float(v))
    return acc


def default_select(path: str, node: dict) -> bool:
    """Quantize every observed conv except depthwise (HWIO with I == 1):
    depthwise is VPU-bound and measured slower in int8."""
    w = node["w"]
    return w.ndim == 4 and w.shape[2] > 1


def mxu_bound_select(threshold: float = 240.0) -> Callable[[str, dict], bool]:
    """Policy: quantize only convs that are MXU-(compute-)bound in bf16.

    Rationale at design time: the activation quantize is an extra HBM
    sweep over the conv's input (read bf16 + write int8 = 3 bytes/elem)
    that saves only 1 byte/elem on the conv's own input read — net
    +2 bytes/elem of traffic when the quantize does NOT fuse — so the
    2x-rate MXU should only pay where the conv's FLOP time exceeds its
    byte time.  (In practice XLA fuses most of the quantize sweeps into
    producer epilogues, which is why ``all`` measures fine end to end —
    see the measured-outcome note below; round 3's recorded all-conv loss
    was an uncommitted-params artifact, ARCHITECTURE.md "Lower
    precision".)  Shape-only proxy for that ratio (activation-traffic
    dominated;
    weights amortize over the batch): per-output-pixel
    ``FLOPs / bytes = K²·Cin·Cout / (Cin + Cout)``, compared against the
    v5e's bf16 compute:bandwidth ratio ~197 TFLOP/s : 819 GB/s ≈ 240
    FLOP/byte.  With the default threshold this keeps the fat decoder/head
    3x3 convs (intensity well above 240) plus the widest EfficientNet 1x1
    expand/project layers (those reach intensity ~240-340), and drops the
    narrower 1x1s (intensity ~100-230); raise the threshold past 340 to
    restrict selection to the 3x3 convs only.

    Measured outcome (benchmarks/QUANT_BENCH.json, v5e, B=128, tree
    committed to device): int8 wins under every policy — bf16 1242
    pairs/s, int8-all 1401 (+12.8%), mxu 1338, mxu:120 1348, mxu:400 1339
    in steady state; per dispatch the ordering flips slightly (mxu:120
    1048 > mxu 1028 > all 1008 > bf16 983).  Restricting selection trades
    the skipped convs' quantize sweeps for int8<->bf16 boundary regions,
    so on this model the policies bracket each other within a few %;
    ``all`` stays the default.  The knob matters more on parts with a
    higher int8:bf16 rate ratio (v6e doubles it).
    """

    def select(path: str, node: dict) -> bool:
        w = node["w"]
        if w.ndim != 4 or w.shape[2] == 1:
            return False
        kh, kw, cin_g, cout = w.shape
        intensity = kh * kw * cin_g * cout / max(cin_g + cout, 1)
        return intensity >= threshold

    return select


def resolve_select(spec: str) -> Callable[[str, dict], bool]:
    """Parse a selection-policy string: ``"all"`` (every non-depthwise conv),
    ``"mxu"`` or ``"mxu:<threshold>"`` (``mxu_bound_select``)."""
    if spec in ("", "all"):
        return default_select
    if spec == "mxu" or spec.startswith("mxu:"):
        if ":" in spec:
            raw = spec.split(":", 1)[1]
            try:
                t = float(raw)
            except ValueError:
                raise ValueError(
                    f"bad mxu threshold {raw!r} in quant selection policy "
                    f"{spec!r} (expected mxu:<float>)") from None
        else:
            t = 240.0
        return mxu_bound_select(t)
    raise ValueError(f"unknown quant selection policy {spec!r}")


def _quantize_conv(node: dict, absmax: float, eps: float = 1e-12) -> dict:
    w = np.asarray(jax.device_get(node["w"]), np.float32)
    w_absmax = np.maximum(np.abs(w).max(axis=(0, 1, 2)), eps)
    sw = (w_absmax / 127.0).astype(np.float32)
    wq = np.clip(np.round(w / sw), -127, 127).astype(np.int8)
    out = {"w": jnp.asarray(wq), "q_sw": jnp.asarray(sw),
           "q_sx": jnp.asarray(np.float32(max(absmax, eps) / 127.0))}
    if "b" in node:
        out["b"] = node["b"]
    return out


def quantize_params(params, ranges: dict[str, float], *,
                    select: Callable[[str, dict], bool] = default_select):
    """Return a copy of ``params`` with every conv node that (a) appears in
    ``ranges`` (i.e. actually executed as a conv during calibration — this
    naturally excludes deconvs and plain matmul weights) and (b) passes
    ``select`` replaced by its int8-quantized form."""

    def walk(node, path):
        sep = "/" if path else ""
        if isinstance(node, dict):
            if "q_sx" in node:
                # already int8: re-quantizing would treat the raw codes as
                # float weights and silently destroy the per-channel scale
                return dict(node)
            if ("w" in node and path in ranges and select(path, node)):
                return _quantize_conv(node, ranges[path])
            return {k: walk(v, f"{path}{sep}{k}") for k, v in node.items()}
        if isinstance(node, (list, tuple)):
            out = [walk(v, f"{path}{sep}{i}") for i, v in enumerate(node)]
            return tuple(out) if isinstance(node, tuple) else out
        return node

    return walk(params, "")


def quantized_fraction(params) -> float:
    """Fraction of QUANTIZABLE conv-weight elements stored as int8.

    The denominator excludes 4-D weights that can never execute through
    the int8 conv path: deconv kernels (``lax.conv_transpose``) and the
    descriptor-head ``conv_h`` reducers.  Depthwise convs ARE counted —
    they are quantizable in principle and only excluded by the default
    policy (``default_select``) — so a default-policy model reports the
    true policy coverage, not a number diluted by structurally-ineligible
    weights."""
    total = q = 0
    for path, leaf in tree_util.tree_flatten_with_path(params)[0]:
        if _path_str(path[-1:]) != "w" or getattr(leaf, "ndim", 0) != 4:
            continue
        keys = _path_str(path)
        if "deconv" in keys or "conv_h" in keys:
            continue
        total += leaf.size
        if leaf.dtype == jnp.int8:
            q += leaf.size
    return q / max(total, 1)
