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
    out_ref[0] = (num / (jnp.sqrt(sq) * gnorm)).astype(out_ref.dtype)


def _pick_tile(hw: int, cs: int) -> int:
    # larger tiles amortize the lane padding of small channel counts
    budget = max(512, min(4096, (1 << 21) // max(cs, 1)))  # ~2MB fp32 tile
    for t in (4096, 2048, 1024, 512, 256, 128, 64, 32, 16, 8):
        if t <= budget and hw % t == 0:
            return t
    return hw


def _forward(x, g, shift: int, offsets: tuple[int, ...], window: str,
             interpret: bool):
    b, h, w_sp, cs = x.shape
    cg = g.shape[-1]
    start = window_start(cs, cg, window)
    bins = len(offsets)
    hw = h * w_sp
    tile = _pick_tile(hw, cs)
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

    import functools as _ft
    xf = x.reshape(b, hw, cs)
    out = pl.pallas_call(
        _ft.partial(_kernel, full_window=full_window),
        grid=(b, hw // tile),
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
        out_shape=jax.ShapeDtypeStruct((b, hw, bins), x.dtype),
        cost_estimate=pl.CostEstimate(
            flops=4 * b * hw * cs * bins,
            bytes_accessed=b * hw * cs * x.dtype.itemsize
            + b * hw * bins * x.dtype.itemsize,
            transcendentals=b * hw * bins,
        ),
        interpret=interpret,
    )(xf, wmat.astype(x.dtype), mask.astype(x.dtype), gnorm)
    return out.reshape(b, h, w_sp, bins)


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
