"""On-device image geometry with PIL-compatible conventions.

The KITTI pipeline aligns each aerial image to the vehicle heading through a
chain of PIL calls — rotate (nearest) -> affine translate (bilinear) ->
affine translate (bilinear) -> rotate (nearest) -> center crop (reference
``datasets.py:443-464``).  ``data/kitti.py`` runs that chain on host with PIL
for bit-faithful eval; this module provides the jitted device equivalents so
the whole augmentation can run on-TPU in the training input pipeline
(batched via vmap), matching PIL's coordinate conventions:

* ``Image.transform(AFFINE, (a,b,c,d,e,f))`` maps output pixel (x, y) to
  input (a·(x+½) + b·(y+½) + c, d·(x+½) + e·(y+½) + f).
* NEAREST truncates the continuous coordinate; BILINEAR samples at
  (u−½, v−½) against integer pixel centers with zero fill.
* ``Image.rotate(angle)`` rotates CCW about the image center (w/2, h/2).
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp


def pil_rotate_matrix(angle_deg: float, hw: tuple[int, int]):
    """The 6-tuple PIL builds for ``Image.rotate(angle)`` (output->input)."""
    h, w = hw
    cx, cy = w / 2.0, h / 2.0
    a = -math.radians(angle_deg)
    cos_a, sin_a = round(math.cos(a), 15), round(math.sin(a), 15)
    # translate center to origin, rotate, translate back
    c = cx - (cos_a * cx + sin_a * cy)
    f = cy - (-sin_a * cx + cos_a * cy)
    return (cos_a, sin_a, c, -sin_a, cos_a, f)


def pil_translate_matrix(dx: float, dy: float):
    """``Image.transform(AFFINE, (1, 0, dx, 0, 1, dy))``: output (x,y) samples
    input (x+dx, y+dy)."""
    return (1.0, 0.0, dx, 0.0, 1.0, dy)


def _input_coords(matrix, out_hw):
    a, b, c, d, e, f = matrix
    h, w = out_hw
    xs = jnp.arange(w, dtype=jnp.float32) + 0.5
    ys = jnp.arange(h, dtype=jnp.float32) + 0.5
    u = a * xs[None, :] + b * ys[:, None] + c
    v = d * xs[None, :] + e * ys[:, None] + f
    return u, v


def warp_affine(img, matrix, out_hw=None, method: str = "bilinear"):
    """Warp one [H, W, C] image by a PIL-convention affine matrix."""
    in_h, in_w = img.shape[:2]
    out_hw = out_hw or (in_h, in_w)
    u, v = _input_coords(matrix, out_hw)
    imgf = img.astype(jnp.float32)
    if method == "nearest":
        xi = jnp.floor(u).astype(jnp.int32)
        yi = jnp.floor(v).astype(jnp.int32)
        valid = (u >= 0) & (xi < in_w) & (v >= 0) & (yi < in_h)
        xi = jnp.clip(xi, 0, in_w - 1)
        yi = jnp.clip(yi, 0, in_h - 1)
        out = imgf[yi, xi]
        out = jnp.where(valid[..., None], out, 0.0)
    elif method == "bilinear":
        uu = u - 0.5
        vv = v - 0.5
        x0 = jnp.floor(uu).astype(jnp.int32)
        y0 = jnp.floor(vv).astype(jnp.int32)
        wx = (uu - x0)[..., None]
        wy = (vv - y0)[..., None]

        def tap(yi, xi):
            # PIL clamps partial border neighbors to the edge pixel
            return imgf[jnp.clip(yi, 0, in_h - 1), jnp.clip(xi, 0, in_w - 1)]

        out = (tap(y0, x0) * (1 - wx) * (1 - wy)
               + tap(y0, x0 + 1) * wx * (1 - wy)
               + tap(y0 + 1, x0) * (1 - wx) * wy
               + tap(y0 + 1, x0 + 1) * wx * wy)
        # PIL's generic transform fills the whole pixel when the *center*
        # coordinate falls outside the input
        inside = (u >= 0) & (u < in_w) & (v >= 0) & (v < in_h)
        out = jnp.where(inside[..., None], out, 0.0)
    else:
        raise ValueError(method)
    if jnp.issubdtype(img.dtype, jnp.integer):
        # PIL truncates when storing back to uint8
        out = jnp.clip(jnp.floor(out), 0, 255)
    return out.astype(img.dtype)


def rotate_matrix_traced(angle_deg, hw: tuple[int, int]):
    """Traced-angle variant of ``pil_rotate_matrix`` (for jit/vmap batched
    augmentation; skips PIL's round-to-15-decimals of the trig terms)."""
    h, w = hw
    cx, cy = w / 2.0, h / 2.0
    a = -angle_deg * jnp.pi / 180.0
    cos_a, sin_a = jnp.cos(a), jnp.sin(a)
    c = cx - (cos_a * cx + sin_a * cy)
    f = cy - (-sin_a * cx + cos_a * cy)
    return (cos_a, sin_a, c, -sin_a, cos_a, f)


def translate_matrix_traced(dx, dy):
    one = jnp.float32(1.0)
    zero = jnp.float32(0.0)
    return (one, zero, dx, zero, one, dy)


def kitti_alignment_chain_batched(sat, heading, mpp: float, camera_shift,
                                  shift_x, shift_y, random_ori,
                                  side: int = 512):
    """Batched, fully-traced device version of the KITTI aerial alignment
    (training augmentation at scale): sat [B, H, W, 3] uint8, per-sample
    heading (radians), shift_x/shift_y (pixels), random_ori (degrees)."""
    hw = sat.shape[1:3]

    def one(img, hd, sx, sy, ro):
        x = warp_affine(img, rotate_matrix_traced(-hd / jnp.pi * 180, hw),
                        method="nearest")
        x = warp_affine(
            x, translate_matrix_traced(jnp.float32(camera_shift[0] / mpp),
                                       jnp.float32(camera_shift[1] / mpp)),
            method="bilinear")
        x = warp_affine(x, translate_matrix_traced(sx, -sy),
                        method="bilinear")
        x = warp_affine(x, rotate_matrix_traced(ro, hw), method="nearest")
        return center_crop(x, side)

    return jax.vmap(one)(sat, heading, shift_x, shift_y, random_ori)


def center_crop(img, side: int):
    """torchvision ``TF.center_crop`` semantics (reference
    ``datasets.py:464``): the offset is ``int(round((h - side) / 2))``
    (banker's rounding — NOT floor, which shifts the crop one pixel when
    ``(h - side) % 4 == 3``), and a crop larger than the image zero-pads
    symmetrically instead of mis-slicing with a negative start."""
    h, w = img.shape[:2]
    if side > h or side > w:
        ph, pw = max(side - h, 0), max(side - w, 0)
        pad = ((ph // 2, ph - ph // 2), (pw // 2, pw - pw // 2)) + \
            ((0, 0),) * (img.ndim - 2)
        img = jnp.pad(img, pad)
        h, w = img.shape[:2]
    top = int(round((h - side) / 2))
    left = int(round((w - side) / 2))
    return img[top:top + side, left:left + side]


def kitti_alignment_chain(sat, heading, mpp: float, camera_shift,
                          shift_px, random_ori, side: int = 512):
    """Device-side equivalent of the reference's aerial alignment
    (``datasets.py:443-464``): rotate(-heading) [nearest] -> camera-offset
    translate [bilinear] -> random/test shift [bilinear] ->
    rotate(random_ori) [nearest] -> center crop.

    Static python floats for the angles/shifts compile one program per
    sample configuration; use the host PIL path for bit-faithful eval and
    this for on-device training augmentation at scale.
    """
    hw = sat.shape[:2]
    x = warp_affine(sat, pil_rotate_matrix(-heading / math.pi * 180, hw),
                    method="nearest")
    x = warp_affine(
        x, pil_translate_matrix(camera_shift[0] / mpp, camera_shift[1] / mpp),
        method="bilinear")
    x = warp_affine(x, pil_translate_matrix(shift_px[0], -shift_px[1]),
                    method="bilinear")
    x = warp_affine(x, pil_rotate_matrix(random_ori, hw), method="nearest")
    return center_crop(x, side)
