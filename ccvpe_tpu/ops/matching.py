"""Orientation-aware rolled-channel cross-view matching.

The reference computes, per orientation bin i (reference ``models.py:191-201``):

    rolled  = roll(sat_map, shifts=-i*shift, dims=channel)
    window  = rolled[:, start : start+Cg]         # start=0 (VIGOR/KITTI,
                                                  #  ``models.py:193``) or
                                                  # centered (Oxford,
                                                  #  ``models.py:1094``)
    score_i = sum_c(grd_desc * window) / (||window|| * ||grd_desc||)

i.e. 20 (or 16) separate roll+multiply+reduce passes per scale, 6 scales per
forward — 120 memory-bound sweeps of the feature map.

TPU-native reformulation (this module): because ``window_i`` channel j is just
``sat[:, (start + i*shift + j) mod Cs]`` and the ground descriptor is constant
over space, all bins reduce to two MXU matmuls over the feature map:

    num[b,h,w,i] = sum_c x[b,h,w,c] * W[b,c,i]     W[b,c,i] = rolled copies of
                                                   the (zero-padded) descriptor
    sq [b,h,w,i] = sum_c x^2[b,h,w,c] * M[c,i]     M = static 0/1 window mask
    score        = num * rsqrt(sq) / ||g||

No rolls, no per-bin passes; the feature map is read twice (once by each
einsum) instead of 2*bins times.  ``matching_scores_reference`` keeps the
naive roll formulation for numerics pinning and as an interpret-mode fallback.

Scores are returned as [B, H, W, bins] (NHWC bin-last; the reference stacks
bins as NCHW channels).
"""

from __future__ import annotations

import functools

import numpy as np
import jax.numpy as jnp
from jax import lax


def window_start(cs: int, cg: int, window: str) -> int:
    """'first' -> 0 (``models.py:193``); 'center' -> int(Cs/2 - Cg/2)
    (``models.py:1094``)."""
    if window == "first":
        return 0
    if window == "center":
        return (cs - cg) // 2
    raise ValueError(f"unknown window mode {window!r}")


@functools.lru_cache(maxsize=None)
def _window_mask(cs: int, cg: int, start: int, shift: int,
                 offsets: tuple[int, ...]):
    """Static [Cs, bins] 0/1 mask: M[c,i] = channel c inside window of bin i."""
    c = np.arange(cs)[:, None]
    sh = np.array([(start + i * shift) % cs for i in offsets])[None, :]
    return np.asarray((c - sh) % cs < cg, dtype=np.float32)


def matching_scores(x, g, shift: int, offsets: tuple[int, ...],
                    window: str = "first", precision=None):
    """All-bins matching scores via two matmuls.

    Args:
      x: [B, H, W, Cs] satellite feature map.
      g: [B, Cg] ground descriptor (Cg <= Cs).
      shift: channel roll per orientation bin (static).
      offsets: orientation bin indices, e.g. ``range(20)`` or the restricted
        ``range(-n, n+1)`` of the ori-prior model (``models.py:489``).
      window: 'first' or 'center'.

    Returns: [B, H, W, len(offsets)] cosine-similarity scores.
    """
    cs = x.shape[-1]
    cg = g.shape[-1]
    if cg == cs:
        # every rolled window covers all channels (true at all six VIGOR
        # scales): single formulation shared with the fused-epilogue path
        # (XLA dead-code-eliminates the unused smax/xnorm outputs)
        return matching_scores_with_norm(x, g, shift, offsets, window,
                                         precision=precision)[0]
    start = window_start(cs, cg, window)
    offsets = tuple(int(o) for o in offsets)

    gp = jnp.pad(g, ((0, 0), (0, cs - cg)))
    w = jnp.stack(
        [jnp.roll(gp, (start + i * shift) % cs, axis=1) for i in offsets],
        axis=-1)  # [B, Cs, bins]

    num = jnp.einsum("bhwc,bci->bhwi", x, w.astype(x.dtype),
                     precision=precision, preferred_element_type=jnp.float32)
    mask = jnp.asarray(_window_mask(cs, cg, start, shift, offsets))
    sq = jnp.einsum("bhwc,ci->bhwi", jnp.square(x), mask.astype(x.dtype),
                    precision=precision,
                    preferred_element_type=jnp.float32)
    gnorm = jnp.sqrt(jnp.sum(jnp.square(g.astype(jnp.float32)), axis=-1))
    return (num / (jnp.sqrt(sq) * gnorm[:, None, None, None])).astype(x.dtype)


def matching_scores_with_norm(x, g, shift: int, offsets: tuple[int, ...],
                              window: str = "first", precision=None):
    """``matching_scores`` + the LMU-stage epilogue (max-over-bins and the
    l2-normalized feature map) from ONE sum-of-squares pass.

    Every LMU stage computes both the matching scores of ``x`` (whose
    denominator is ``sqrt(sum_c x^2)``) and ``l2_normalize(x)`` (same
    reduction).  When the window spans all channels (true at all six VIGOR
    scales) the two are identical, so computing the reduction once saves a
    full HBM sweep of the feature map per stage.  Falls back to plain
    ``matching_scores`` when ``Cg != Cs`` (the window norm is then masked,
    not the full-channel norm).

    Returns (scores [B,H,W,bins], smax [B,H,W,1] | None, xnorm | None).
    """
    cs = x.shape[-1]
    cg = g.shape[-1]
    if cg != cs:
        return matching_scores(x, g, shift, offsets, window,
                               precision=precision), None, None
    start = window_start(cs, cg, window)
    offsets = tuple(int(o) for o in offsets)
    w = jnp.stack(
        [jnp.roll(g, (start + i * shift) % cs, axis=1) for i in offsets],
        axis=-1)  # [B, Cs, bins]
    num = jnp.einsum("bhwc,bci->bhwi", x, w.astype(x.dtype),
                     precision=precision, preferred_element_type=jnp.float32)
    ss = jnp.sum(jnp.square(x.astype(jnp.float32)), axis=-1, keepdims=True)
    norm = jnp.sqrt(ss)
    gnorm = jnp.sqrt(jnp.sum(jnp.square(g.astype(jnp.float32)), axis=-1))
    scores = (num / (norm * gnorm[:, None, None, None])).astype(x.dtype)
    smax = jnp.max(scores, axis=-1, keepdims=True)
    # F.normalize(p=2) semantics (||x|| clamped at 1e-12, ``models.py:33-40``)
    xnorm = (x / jnp.maximum(norm, 1e-12).astype(x.dtype))
    return scores, smax, xnorm


def matching_scores_reference(x, g, shift: int, offsets: tuple[int, ...],
                              window: str = "first"):
    """Naive roll/slice formulation, bit-matching the reference loop
    (``models.py:191-201``).  Used to pin the fast path's numerics."""
    cs = x.shape[-1]
    cg = g.shape[-1]
    start = window_start(cs, cg, window)
    gnorm = jnp.sqrt(jnp.sum(jnp.square(g), axis=-1))[:, None, None]
    scores = []
    for i in offsets:
        rolled = jnp.roll(x, -int(i) * shift, axis=-1)
        win = lax.slice_in_dim(rolled, start, start + cg, axis=-1)
        wnorm = jnp.sqrt(jnp.sum(jnp.square(win), axis=-1))
        num = jnp.sum(win * g[:, None, None, :], axis=-1)
        scores.append(num / (wnorm * gnorm))
    return jnp.stack(scores, axis=-1)
