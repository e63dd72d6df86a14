"""On-device ground-truth synthesis.

The reference builds per-sample Gaussian heatmaps, orientation-binned label
volumes, and dense (cos, sin) maps in numpy inside ``Dataset.__getitem__``
(reference ``datasets.py:144-166`` VIGOR, ``:326-351`` Oxford, ``:471-501``
KITTI) — a hot CPU loop.  Here the same math is pure jnp: jit it, vmap it
over the batch, and it fuses into the input pipeline on device.

Semantics preserved exactly, including:
* the ``linspace`` grid construction (endpoint-inclusive, so the step is
  size/(size-1), not 1 — reference ``datasets.py:147``),
* VIGOR/KITTI's counter-clockwise bin indexing ``bins[(B - idx) % B]`` vs
  Oxford's clockwise ``bins[idx]`` (``datasets.py:153-163`` vs ``:339-348``),
* linear interpolation between the two nearest bins.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

SIGMA = 4.0  # reference ``datasets.py:149``


def gaussian_heatmap(height: int, width: int, row_offset, col_offset,
                     sigma: float = SIGMA):
    """[H, W] Gaussian centered per the reference's sign conventions
    (``datasets.py:147-150``): x grid shifted by +col_offset, y grid by
    -row_offset."""
    x = jnp.linspace(-width / 2, width / 2, width) + col_offset
    y = jnp.linspace(-height / 2, height / 2, height) - row_offset
    d2 = jnp.square(x)[None, :] + jnp.square(y)[:, None]
    return jnp.exp(-d2 / (2.0 * sigma * sigma))


def orientation_bin_weights(angle_deg, bins: int, clockwise: bool):
    """[bins] interpolation weights for an orientation angle in [0, 360).

    counter-clockwise (VIGOR ``datasets.py:153-162``, KITTI ``:489-497``):
        w[(B - idx) % B] = 1-ratio,  w[(B - idx - 1) % B] = ratio
    clockwise (Oxford ``datasets.py:339-348``):
        w[idx] = 1-ratio,            w[(idx + 1) % B] = ratio
    """
    step = 360.0 / bins
    idx = jnp.floor(angle_deg / step).astype(jnp.int32)
    ratio = (angle_deg % step) / step
    if clockwise:
        a, b = idx % bins, (idx + 1) % bins
    else:
        a, b = (bins - idx) % bins, (bins - idx - 1) % bins
    return (jax.nn.one_hot(a, bins) * (1 - ratio)
            + jax.nn.one_hot(b, bins) * ratio)


def gt_with_orientation(height: int, width: int, row_offset, col_offset,
                        angle_deg, bins: int, clockwise: bool = False):
    """[H, W, bins] orientation-binned Gaussian GT (NHWC bin-last)."""
    g = gaussian_heatmap(height, width, row_offset, col_offset)
    w = orientation_bin_weights(angle_deg, bins, clockwise)
    return g[:, :, None] * w[None, None, :]


def orientation_map(height: int, width: int, angle_deg):
    """[H, W, 2] dense (cos, sin) field (reference ``datasets.py:165-166``)."""
    rad = angle_deg * jnp.pi / 180.0
    return jnp.broadcast_to(jnp.stack([jnp.cos(rad), jnp.sin(rad)]),
                            (height, width, 2))


@functools.partial(jax.jit, static_argnames=("height", "width", "bins",
                                             "clockwise", "with_bins"))
def synthesize_batch(row_offset, col_offset, angle_deg, *, height: int,
                     width: int, bins: int, clockwise: bool = False,
                     with_bins: bool = True):
    """Batched GT synthesis: offsets/angles [B] -> (gt [B,H,W,1],
    gt_with_ori [B,H,W,bins], orientation [B,H,W,2]).

    NOTE: materializing the full-resolution binned volume costs
    B*H*W*bins floats (8 GB padded at batch 64 on TPU).  Training uses the
    factored form (``synthesize_batch_factored``); this dense variant exists
    for parity testing and the reference-shaped API."""
    gt = jax.vmap(lambda r, c: gaussian_heatmap(height, width, r, c))(
        row_offset, col_offset)[..., None]
    if with_bins:
        gwo = jax.vmap(lambda r, c, a: gt_with_orientation(
            height, width, r, c, a, bins, clockwise))(
                row_offset, col_offset, angle_deg)
    else:
        gwo = jnp.zeros((gt.shape[0], height, width, bins), gt.dtype)
    omap = jax.vmap(lambda a: orientation_map(height, width, a))(angle_deg)
    return gt, gwo, omap


@functools.partial(jax.jit, static_argnames=("height", "width", "bins",
                                             "clockwise"))
def synthesize_batch_factored(row_offset, col_offset, angle_deg, *,
                              height: int, width: int, bins: int,
                              clockwise: bool = False):
    """Memory-safe batched GT: (gt [B,H,W], bin_weights [B,bins],
    orientation [B,H,W,2]).

    The binned GT volume is a rank-1 outer product per sample
    (``gt_with_ori[b] = gaussian[b] ⊗ weights[b]``) and max-pooling commutes
    with multiplication by the non-negative per-sample weights, so the loss
    pyramid can be rebuilt from the pooled Gaussian alone — the
    [B, H, W, bins] tensor (8 GB padded at batch 64) never exists."""
    gt = jax.vmap(lambda r, c: gaussian_heatmap(height, width, r, c))(
        row_offset, col_offset)
    weights = jax.vmap(
        lambda a: orientation_bin_weights(a, bins, clockwise))(angle_deg)
    omap = jax.vmap(lambda a: orientation_map(height, width, a))(angle_deg)
    return gt, weights, omap
