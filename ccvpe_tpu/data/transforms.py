"""Host-side image decode/resize + device-side normalization.

Split chosen for TPU throughput: JPEG decode and the first resize stay on
host worker threads (smallest possible host->device transfer, uint8), while
normalization, panorama rolling, and all ground-truth synthesis run jitted on
device (the reference does everything per-sample in Python workers,
``datasets.py:98-177`` — its 14 FPS ceiling).

Numerical conventions mirrored from the reference drivers:
* PIL bilinear resize (torchvision ``transforms.Resize`` on PIL images,
  ``train_VIGOR.py:57-70``),
* ImageNet mean/std normalization,
* panorama roll by ``round(rotation * W)`` pixels (``datasets.py:118``).
"""

from __future__ import annotations

import functools
import os

import numpy as np
import jax
import jax.numpy as jnp
from PIL import Image

IMAGENET_MEAN = (0.485, 0.456, 0.406)
IMAGENET_STD = (0.229, 0.224, 0.225)


def _use_native() -> bool:
    if os.environ.get("CCVPE_NATIVE_LOADER", "0") != "1":
        return False
    from . import native_loader

    return native_loader.available()


def load_image_status(path: str, size_hw: tuple[int, int] | None = None,
                      fallback_hw: tuple[int, int] | None = None,
                      ) -> tuple[np.ndarray, int]:
    """Like ``load_image`` but also reports whether the decode succeeded
    (status 0) or the blank fallback was used (status 1) — callers that
    must *record* failures (cache builds, samplers deciding between
    fallback and raise) need the distinction a silent blank hides."""
    if size_hw is not None and _use_native():
        from . import native_loader

        out, status = native_loader.load_batch([path], size_hw, n_threads=1)
        if status[0] == 0:
            return out[0], 0
        return np.zeros((*size_hw, 3), np.uint8), 1
    try:
        img = Image.open(path).convert("RGB")
    except Exception:
        hw = size_hw or fallback_hw or (320, 640)
        return np.zeros((*hw, 3), np.uint8), 1
    if size_hw is not None and img.size != (size_hw[1], size_hw[0]):
        img = img.resize((size_hw[1], size_hw[0]), Image.BILINEAR)
    return np.asarray(img, np.uint8), 0


def load_image(path: str, size_hw: tuple[int, int] | None = None,
               fallback_hw: tuple[int, int] | None = None) -> np.ndarray:
    """Decode to RGB uint8 [H, W, 3], optionally PIL-bilinear resized.

    Unreadable files fall back to a blank image like the reference
    (``datasets.py:100-105``).  Set ``CCVPE_NATIVE_LOADER=1`` to route
    decode+resize through the C++ loader (Pillow-exact resampling; JPEG IDCT
    may differ from PIL by sub-LSB rounding)."""
    return load_image_status(path, size_hw, fallback_hw)[0]


@functools.partial(jax.jit, static_argnames=("dtype",))
def normalize_images(x_uint8, dtype=jnp.float32):
    """uint8 [B,H,W,3] -> ImageNet-normalized float [B,H,W,3] on device."""
    x = x_uint8.astype(dtype) / 255.0
    mean = jnp.asarray(IMAGENET_MEAN, dtype)
    std = jnp.asarray(IMAGENET_STD, dtype)
    return (x - mean) / std


@jax.jit
def roll_panorama(grd, rotation):
    """Per-sample horizontal roll: shift = round(rotation * W) pixels
    (reference ``datasets.py:108-118``).  rotation: [B] in (-1, 1)."""
    w = grd.shape[2]
    shifts = jnp.round(rotation * w).astype(jnp.int32)
    return jax.vmap(lambda img, s: jnp.roll(img, s, axis=1))(grd, shifts)


def to_pil(arr: np.ndarray) -> Image.Image:
    return Image.fromarray(np.asarray(arr, np.uint8))


def assemble_device_batch(raw: dict, *, sat_hw, bins: int, clockwise: bool,
                          roll: bool = False) -> dict:
    """Shared collated-host-batch -> device-batch assembly (all jitted):
    normalize both images, optionally roll panoramas by the per-sample
    rotation, synthesize the factored GT.  The per-dataset ``device_batch``
    wrappers differ only in the bin convention (``clockwise``) and whether
    the ground image is a rollable panorama — keeping the batch contract in
    one place so the three datasets cannot drift."""
    from ..ops import gt as gt_ops

    grd = normalize_images(jnp.asarray(raw["grd"]))
    if roll:
        grd = roll_panorama(grd, jnp.asarray(raw["rotation"]))
    sat = normalize_images(jnp.asarray(raw["sat"]))
    gt, weights, omap = gt_ops.synthesize_batch_factored(
        jnp.asarray(raw["row_offset"]), jnp.asarray(raw["col_offset"]),
        jnp.asarray(raw["angle"]), height=sat_hw[0], width=sat_hw[1],
        bins=bins, clockwise=clockwise)
    return {"grd": grd, "sat": sat, "gt": gt, "bin_weights": weights,
            "orientation": omap}
