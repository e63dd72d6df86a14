"""On-device pose readout.

The reference ships full heatmaps and orientation fields to host and runs
numpy argmaxes per sample (``train_VIGOR.py:182-217``).  For streaming
evaluation that transfer dominates (a 512x512 float heatmap is 1 MB/sample);
this readout reduces each sample to a dozen scalars on device, matching the
reference's argmax semantics exactly (row-major first-maximum, like
``np.argmax``/``np.unravel_index``).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def _argmax_rc(maps):
    """[B, H, W] -> (rows, cols) of the row-major first maximum."""
    b, h, w = maps.shape
    flat_idx = jnp.argmax(maps.reshape(b, -1), axis=1)
    return flat_idx // w, flat_idx % w


def pose_readout_from_outputs(out, gt, gt_orientation):
    """``pose_readout`` computed from raw model outputs WITHOUT
    materializing the softmax heatmap (for use inside the eval jit, where
    XLA then dead-code-eliminates the 512x512 softmax): softmax is
    monotonic, so the argmax comes from the logits, and the probability at
    the GT peak is ``exp(l_gt - logsumexp(l))``."""
    logits = out.logits_flattened
    w = out.heatmap.shape[2]  # static shape only; no materialization
    g = gt if gt.ndim == 3 else gt[..., 0]
    b = logits.shape[0]
    flat = jnp.argmax(logits, axis=1)
    pr, pc = flat // w, flat % w
    gr, gc = _argmax_rc(g)
    idx = jnp.arange(b)
    l32 = logits.astype(jnp.float32)
    lse = jax.scipy.special.logsumexp(l32, axis=1)
    ori = out.ori
    return {
        "pred_row": pr, "pred_col": pc, "gt_row": gr, "gt_col": gc,
        "pixel_distance": jnp.sqrt(
            (gr - pr).astype(jnp.float32) ** 2
            + (gc - pc).astype(jnp.float32) ** 2),
        "prob_at_gt": jnp.exp(l32[idx, gr * w + gc] - lse),
        "cos_pred": ori[idx, pr, pc, 0].astype(jnp.float32),
        "sin_pred": ori[idx, pr, pc, 1].astype(jnp.float32),
        "cos_gt": gt_orientation[idx, gr, gc, 0].astype(jnp.float32),
        "sin_gt": gt_orientation[idx, gr, gc, 1].astype(jnp.float32),
    }


@jax.jit
def pose_readout(heatmap, ori, gt, gt_orientation):
    """Per-sample pose scalars (all [B]-shaped, NHWC inputs):

    pred_row/pred_col, gt_row/gt_col, pixel_distance, probability at the GT
    argmax, predicted (cos, sin) at the predicted peak, GT (cos, sin) at the
    GT peak — everything the reference metric loop needs.
    """
    hm = heatmap[..., 0]
    g = gt if gt.ndim == 3 else gt[..., 0]
    b = hm.shape[0]
    pr, pc = _argmax_rc(hm)
    gr, gc = _argmax_rc(g)
    idx = jnp.arange(b)
    return {
        "pred_row": pr, "pred_col": pc, "gt_row": gr, "gt_col": gc,
        "pixel_distance": jnp.sqrt(
            (gr - pr).astype(jnp.float32) ** 2
            + (gc - pc).astype(jnp.float32) ** 2),
        "prob_at_gt": hm[idx, gr, gc].astype(jnp.float32),
        "cos_pred": ori[idx, pr, pc, 0].astype(jnp.float32),
        "sin_pred": ori[idx, pr, pc, 1].astype(jnp.float32),
        "cos_gt": gt_orientation[idx, gr, gc, 0].astype(jnp.float32),
        "sin_gt": gt_orientation[idx, gr, gc, 1].astype(jnp.float32),
    }
