"""Fused Pallas TPU kernel for orientation-bin matching.

The einsum formulation (``ops.matching.matching_scores``) issues two separate
matmuls over the satellite feature map (numerators against the banded
descriptor matrix, window norms against the static mask), so the map is read
from HBM twice.  This kernel keeps each spatial tile resident in VMEM and
does both MXU contractions plus the cosine epilogue in one pass:

    per tile t:   X   = x[b, t*T:(t+1)*T, :]          (VMEM, read once)
                  num = X @ W_b                        (MXU)
                  sq  = (X*X) @ M                      (MXU)
                  out = num / (sqrt(sq) * ||g_b||)     (VPU)

Training still works: the op carries a custom VJP whose backward is the
gradient of the (numerically identical) einsum formulation.

Numerics match ``matching_scores`` to float32 round-off; see
``tests/test_pallas_matching.py``.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .matching import _window_mask, matching_scores, window_start


def _kernel(x_ref, w_ref, m_ref, g_ref, out_ref, *, full_window: bool):
    x = x_ref[0].astype(jnp.float32)                      # [T, Cs]
    num = jnp.dot(x, w_ref[0].astype(jnp.float32),
                  preferred_element_type=jnp.float32)     # [T, bins]
    if full_window:
        # Cg == Cs: the window norm is bin-independent (one VPU reduction)
        sq = jnp.sum(x * x, axis=-1, keepdims=True)       # [T, 1]
    else:
        sq = jnp.dot(x * x, m_ref[:].astype(jnp.float32),
                     preferred_element_type=jnp.float32)  # [T, bins]
    gnorm = g_ref[pl.program_id(0), 0]
    # padded zero rows (pad-and-slice tiling) reach here with sq == 0; the
    # results are sliced off but a bare divide makes 0/0 NaNs that trip
    # interpret-mode FP warnings and debug_nans — clamp like l2_normalize
    out_ref[0] = (num / jnp.maximum(jnp.sqrt(sq) * gnorm, 1e-12)
                  ).astype(out_ref.dtype)


def _pick_tile(hw: int, cs: int, budget_bytes: int = 1 << 21,
               cap: int = 4096) -> tuple[int, int]:
    """Choose the spatial tile and the (possibly padded) grid extent.

    Returns ``(tile, hw_padded)`` with ``hw_padded % tile == 0``.  Prefers an
    aligned tile that divides ``hw`` exactly; when none exists under the VMEM
    budget (non-power-of-two custom spatial maps), pads up to the next
    multiple of the largest in-budget tile instead of falling back to a
    budget-busting ``tile=hw`` launch — callers zero-pad the input rows and
    slice the output back.
    """
    # larger tiles amortize the lane padding of small channel counts; the
    # budget bounds the tile to budget_bytes/cs ELEMENTS (i.e. a 4x-larger
    # f32 byte footprint — tile*cs*4 <= 8 MB at the default), which the
    # shipped per-scale dispatch shapes were measured to fit in scoped VMEM
    # alongside the x^2 temp and double-buffered operand blocks
    budget = max(512, min(cap, budget_bytes // max(cs, 1)))
    tiles = (4096, 2048, 1024, 512, 256, 128, 64, 32, 16, 8)
    for t in tiles:
        if t <= budget and hw % t == 0:
            return t, hw
    if hw <= budget:
        return hw, hw
    # pad fallback (non-divisible custom spatial maps): minimize the padded
    # extent among in-budget tiles that still fill the MXU reasonably —
    # tiny tiles also minimize padding but explode the grid-step count
    # (hw=4356: t=8 pads to just 4360 but takes 545 steps of 8-row
    # matmuls; t=512 pads to 4608 in 9 steps).  Largest tile on ties.
    floor_t = min(256, budget)
    best = min((t for t in tiles if floor_t <= t <= budget),
               key=lambda t: (-(-hw // t) * t, -t))
    return best, -(-hw // best) * best


def _auto_interpret(interpret: bool) -> bool:
    # the kernel targets TPU; on any other backend fall back to the Pallas
    # interpreter so `matching_impl="pallas"` stays runnable everywhere
    return interpret or jax.default_backend() != "tpu"


def _forward(x, g, shift: int, offsets: tuple[int, ...], window: str,
             interpret: bool):
    interpret = _auto_interpret(interpret)
    b, h, w_sp, cs = x.shape
    cg = g.shape[-1]
    start = window_start(cs, cg, window)
    bins = len(offsets)
    hw = h * w_sp
    tile, hw_pad = _pick_tile(hw, cs)
    full_window = cg == cs

    # banded per-sample descriptor matrix + static window mask (as in the
    # einsum path)
    gp = jnp.pad(g, ((0, 0), (0, cs - cg)))
    wmat = jnp.stack(
        [jnp.roll(gp, (start + i * shift) % cs, axis=1) for i in offsets],
        axis=-1)                                          # [B, Cs, bins]
    mask = jnp.asarray(_window_mask(cs, cg, start, shift, offsets))
    gnorm = jnp.sqrt(jnp.sum(jnp.square(g.astype(jnp.float32)),
                             axis=-1))[:, None]           # [B, 1]

    xf = x.reshape(b, hw, cs)
    if hw_pad != hw:
        # zero rows produce 0/0 in the cosine epilogue; sliced off below
        xf = jnp.pad(xf, ((0, 0), (0, hw_pad - hw), (0, 0)))
    out = pl.pallas_call(
        functools.partial(_kernel, full_window=full_window),
        grid=(b, hw_pad // tile),
        in_specs=[
            pl.BlockSpec((1, tile, cs), lambda i, j: (i, j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, cs, bins), lambda i, j: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((cs, bins), lambda i, j: (0, 0),
                         memory_space=pltpu.VMEM),
            # full per-batch norm vector in SMEM, indexed by program id
            pl.BlockSpec((b, 1), lambda i, j: (0, 0),
                         memory_space=pltpu.SMEM),
        ],
        out_specs=pl.BlockSpec((1, tile, bins), lambda i, j: (i, j, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, hw_pad, bins), x.dtype),
        cost_estimate=pl.CostEstimate(
            flops=4 * b * hw * cs * bins,
            bytes_accessed=b * hw * cs * x.dtype.itemsize
            + b * hw * bins * x.dtype.itemsize,
            transcendentals=b * hw * bins,
        ),
        interpret=interpret,
    )(xf, wmat.astype(x.dtype), mask.astype(x.dtype), gnorm)
    return out[:, :hw].reshape(b, h, w_sp, bins)


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3, 4, 5))
def matching_scores_pallas(x, g, shift: int, offsets: tuple[int, ...],
                           window: str = "first", interpret: bool = False):
    """Drop-in replacement for ``matching_scores`` with a fused TPU kernel.

    ``interpret=True`` runs the Pallas interpreter (CPU testing).
    """
    return _forward(x, g, shift, tuple(int(o) for o in offsets), window,
                    interpret)


def _fwd(x, g, shift, offsets, window, interpret):
    out = _forward(x, g, shift, tuple(int(o) for o in offsets), window,
                   interpret)
    return out, (x, g)


def _bwd(shift, offsets, window, interpret, res, ct):
    x, g = res
    _, vjp = jax.vjp(
        lambda x_, g_: matching_scores(x_, g_, shift, tuple(offsets), window),
        x, g)
    return vjp(ct)


matching_scores_pallas.defvjp(_fwd, _bwd)


# ---------------------------------------------------------------------------
# v2: matching + decoder-stage epilogue in one pass.
#
# Every LMU stage consumes, besides the score stack, ``max(stack, bins)`` and
# ``l2_normalize(x, channels)`` (reference ``models.py:204-317``).  Both share
# the kernel's per-pixel sum-of-squares, so emitting them from the same VMEM
# tile removes one full HBM re-read of the feature map per stage.  Full-window
# (Cg == Cs) configs only — true at all six VIGOR/Oxford scales.
# ---------------------------------------------------------------------------


def _kernel_fused(x_ref, w_ref, g_ref, scores_ref, smax_ref, xnorm_ref):
    x = x_ref[0].astype(jnp.float32)                      # [T, Cs]
    sq = jnp.sum(x * x, axis=-1, keepdims=True)           # [T, 1]
    norm = jnp.sqrt(sq)
    num = jnp.dot(x, w_ref[0].astype(jnp.float32),
                  preferred_element_type=jnp.float32)     # [T, bins]
    gnorm = g_ref[pl.program_id(0), 0]
    # clamp: padded zero rows otherwise produce 0/0 NaNs (sliced off, but
    # they trip interpret-mode FP warnings and debug_nans)
    scores = num / jnp.maximum(norm * gnorm, 1e-12)
    scores_ref[0] = scores.astype(scores_ref.dtype)
    # cast after the f32 max: rounding is monotonic, so this equals the max
    # over the cast stack bit-for-bit
    smax_ref[0] = jnp.max(scores, axis=-1, keepdims=True).astype(
        smax_ref.dtype)
    # F.normalize(p=2) semantics (nn.layers.l2_normalize)
    xnorm_ref[0] = (x / jnp.maximum(norm, 1e-12)).astype(xnorm_ref.dtype)


def _forward_fused(x, g, shift: int, offsets: tuple[int, ...], window: str,
                   interpret: bool):
    interpret = _auto_interpret(interpret)
    b, h, w_sp, cs = x.shape
    cg = g.shape[-1]
    assert cg == cs, "fused epilogue kernel requires the full-window config"
    start = window_start(cs, cg, window)
    bins = len(offsets)
    hw = h * w_sp
    # tighter budget than v1: three outputs + two [T,Cs] f32 temporaries
    # share the ~16MB scoped-VMEM stack
    tile, hw_pad = _pick_tile(hw, cs, budget_bytes=1 << 20, cap=2048)

    gp = jnp.pad(g, ((0, 0), (0, cs - cg)))
    wmat = jnp.stack(
        [jnp.roll(gp, (start + i * shift) % cs, axis=1) for i in offsets],
        axis=-1)
    gnorm = jnp.sqrt(jnp.sum(jnp.square(g.astype(jnp.float32)),
                             axis=-1))[:, None]

    xf = x.reshape(b, hw, cs)
    if hw_pad != hw:
        xf = jnp.pad(xf, ((0, 0), (0, hw_pad - hw), (0, 0)))
    scores, smax, xnorm = pl.pallas_call(
        _kernel_fused,
        grid=(b, hw_pad // tile),
        in_specs=[
            pl.BlockSpec((1, tile, cs), lambda i, j: (i, j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, cs, bins), lambda i, j: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((b, 1), lambda i, j: (0, 0),
                         memory_space=pltpu.SMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, tile, bins), lambda i, j: (i, j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tile, 1), lambda i, j: (i, j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tile, cs), lambda i, j: (i, j, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((b, hw_pad, bins), x.dtype),
            jax.ShapeDtypeStruct((b, hw_pad, 1), x.dtype),
            jax.ShapeDtypeStruct((b, hw_pad, cs), x.dtype),
        ],
        cost_estimate=pl.CostEstimate(
            flops=2 * b * hw * cs * bins + 3 * b * hw * cs,
            bytes_accessed=2 * b * hw * cs * x.dtype.itemsize
            + b * hw * bins * x.dtype.itemsize,
            transcendentals=2 * b * hw,
        ),
        interpret=interpret,
    )(xf, wmat.astype(x.dtype), gnorm)
    return (scores[:, :hw].reshape(b, h, w_sp, bins),
            smax[:, :hw].reshape(b, h, w_sp, 1),
            xnorm[:, :hw].reshape(b, h, w_sp, cs))


def _fused_reference(x, g, shift, offsets, window):
    """Composite lax formulation of the fused op (numerics oracle + VJP)."""
    s = matching_scores(x, g, shift, offsets, window)
    smax = jnp.max(s, axis=-1, keepdims=True)
    sq = jnp.sum(jnp.square(x.astype(jnp.float32)), axis=-1, keepdims=True)
    xnorm = (x.astype(jnp.float32)
             / jnp.maximum(jnp.sqrt(sq), 1e-12)).astype(x.dtype)
    return s, smax, xnorm


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3, 4, 5))
def matching_epilogue_pallas(x, g, shift: int, offsets: tuple[int, ...],
                             window: str = "first",
                             interpret: bool = False):
    """Fused matching + LMU-stage epilogue: returns
    ``(scores [B,H,W,bins], max-over-bins [B,H,W,1], l2-normalized x)``.

    One VMEM pass instead of matching + two extra HBM sweeps.  Requires
    Cg == Cs (all VIGOR/Oxford scales).
    """
    return _forward_fused(x, g, shift, tuple(int(o) for o in offsets),
                          window, interpret)


def _fused_fwd(x, g, shift, offsets, window, interpret):
    out = _forward_fused(x, g, shift, tuple(int(o) for o in offsets),
                         window, interpret)
    return out, (x, g)


def _fused_bwd(shift, offsets, window, interpret, res, ct):
    x, g = res
    _, vjp = jax.vjp(
        lambda x_, g_: _fused_reference(x_, g_, shift, tuple(offsets),
                                        window), x, g)
    return vjp(ct)


matching_epilogue_pallas.defvjp(_fused_fwd, _fused_bwd)
