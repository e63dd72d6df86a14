"""Training objective: weighted infoNCE over matching-score volumes +
cross-entropy over the heatmap + Gaussian-weighted orientation MSE
(reference ``losses.py`` and the loss assembly in ``train_VIGOR.py:137-146``).

All functions are pure jnp ports with identical semantics; torch's
``masked_select`` reductions become mask-weighted sums (same values, static
shapes, jit-friendly).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..nn.layers import max_pool

POSITIVE_THRESHOLD = 1e-2  # reference ``losses.py:14``


def info_nce_loss(scores, labels, temperature: float = 0.1):
    """Contrastive loss over a flattened matching-score volume
    (reference ``losses.py:4-20``).

    scores, labels: [B, N] (N = bins*h*w).  Cells with GT likelihood > 1e-2
    are positives, weighted by that likelihood; the denominator sums over all
    cells of the sample.
    """
    scores = scores / temperature
    # log(exp(s)/sum(exp(s))) computed stably; the reference uses raw
    # exp-then-log which overflows for |s|>~88 — mathematically identical.
    log_prob = scores - jax.nn.logsumexp(scores, axis=1, keepdims=True)
    mask = labels > POSITIVE_THRESHOLD
    w = jnp.where(mask, labels, 0.0)
    return -jnp.sum(log_prob * w) / jnp.sum(w)


def cross_entropy_loss(logits, labels):
    """-sum(labels * log_softmax(logits)) / B (reference ``losses.py:23-24``).

    labels: sum-normalized flattened Gaussian GT (``train_VIGOR.py:120-121``).
    """
    log_probs = jax.nn.log_softmax(logits, axis=1)
    return -jnp.sum(labels * log_probs) / logits.shape[0]


def orientation_loss(ori, gt_orientation, gt):
    """Squared (cos,sin) error, spatially weighted by the unnormalized GT
    Gaussian (reference ``losses.py:28-29``).  NHWC: channels last."""
    sq = jnp.sum(jnp.square(gt_orientation - ori), axis=-1, keepdims=True)
    return jnp.sum(sq * gt) / ori.shape[0]


def gt_pyramid(gt_with_ori):
    """Per-scale infoNCE labels: MaxPool2d(2^(7-k)) downsamplings of the
    binned GT (reference ``train_VIGOR.py:123-128``), NHWC in/out."""
    return tuple(max_pool(gt_with_ori, 2 ** k) for k in (6, 5, 4, 3, 2, 1))


def total_loss(outputs, gt, bin_weights, gt_orientation, *,
               weight_info_nce: float = 1e4, weight_ori: float = 1e1):
    """Full objective (reference ``train_VIGOR.py:137-146``), factored-GT
    form.

    Args:
      outputs: CVMOutputs (NHWC).
      gt: [B, H, W] unnormalized Gaussian heatmap GT (no trailing channel —
        trailing size-1 lanes pad 128x on TPU).
      bin_weights: [B, bins] orientation interpolation weights.  The dense
        binned GT is ``gt[b] ⊗ bin_weights[b]``; because max-pooling commutes
        with multiplication by the non-negative per-sample weights, the
        per-scale labels are ``max_pool(gt) ⊗ bin_weights`` — bit-identical
        to pooling the dense volume, without ever materializing it.
      gt_orientation: [B, H, W, 2] dense (cos, sin) GT.

    Loss math always runs in float32 regardless of the forward compute dtype
    (bf16 activations train fine; bf16 loss reductions over 512*512 logits
    do not).

    Returns (loss, dict of components).
    """
    b = gt.shape[0]
    f32 = jnp.float32
    gt = gt.astype(f32)
    w = bin_weights.astype(f32)
    gt_flat = gt.reshape(b, -1)
    gt_flat = gt_flat / jnp.sum(gt_flat, axis=1, keepdims=True)

    loss_ce = cross_entropy_loss(outputs.logits_flattened.astype(f32),
                                 gt_flat)
    loss_ori = orientation_loss(outputs.ori.astype(f32),
                                gt_orientation.astype(f32), gt[..., None])

    gt4 = gt[..., None]
    nce_terms = []
    for k, stack in zip((6, 5, 4, 3, 2, 1), outputs.matching_scores):
        pooled = max_pool(gt4, 2 ** k)  # [B, h, w, 1]
        label = (pooled * w[:, None, None, :]).reshape(b, -1)
        nce_terms.append(info_nce_loss(stack.astype(f32).reshape(b, -1),
                                       label))
    loss_nce = sum(nce_terms) / len(nce_terms)

    loss = loss_ce + weight_info_nce * loss_nce + weight_ori * loss_ori
    return loss, {"loss": loss, "ce": loss_ce, "info_nce": loss_nce,
                  "ori": loss_ori}


def total_loss_binned(outputs, gt, gt_with_ori, gt_orientation, *,
                      weight_info_nce: float = 1e4, weight_ori: float = 1e1):
    """Reference-shaped objective taking the dense binned GT volume
    (``[B, H, W, bins]``) — used for equivalence testing against the
    factored form; training uses ``total_loss``."""
    b = gt.shape[0]
    f32 = jnp.float32
    gt = gt.astype(f32)
    gt_flat = gt.reshape(b, -1)
    gt_flat = gt_flat / jnp.sum(gt_flat, axis=1, keepdims=True)

    loss_ce = cross_entropy_loss(outputs.logits_flattened.astype(f32),
                                 gt_flat)
    loss_ori = orientation_loss(outputs.ori.astype(f32),
                                gt_orientation.astype(f32), gt)

    labels = gt_pyramid(gt_with_ori.astype(f32))
    nce_terms = []
    for stack, label in zip(outputs.matching_scores, labels):
        nce_terms.append(info_nce_loss(stack.astype(f32).reshape(b, -1),
                                       label.reshape(b, -1)))
    loss_nce = sum(nce_terms) / len(nce_terms)

    loss = loss_ce + weight_info_nce * loss_nce + weight_ori * loss_ori
    return loss, {"loss": loss, "ce": loss_ce, "info_nce": loss_nce,
                  "ori": loss_ori}
