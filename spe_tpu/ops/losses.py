"""Loss primitives (pure jnp, fixed-shape + mask semantics).

TPU-native equivalents of the reference loss math:
  * weighted_sigmoid_focal_loss — conditional_detr.py:468-494 (note the
    EPS=1e-5 p_t clamp and the mean-over-queries/sum/num_boxes reduction).
  * l1 / giou box losses — conditional_detr.py:300-319 with per-pair masks
    replacing the gather-by-matched-indices dynamic shapes.
  * image-label multilabel BCE — conditional_detr.py:225-235.

All reductions take an explicit `num_boxes` normalizer; callers psum it
across the data mesh axis first (reference all_reduces it at
conditional_detr.py:435-440).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

_EPS = 1e-5


def sigmoid_binary_cross_entropy(logits: jnp.ndarray, labels: jnp.ndarray) -> jnp.ndarray:
    """Elementwise BCE-with-logits, numerically stable."""
    return jnp.clip(logits, 0, None) - logits * labels + jnp.log1p(jnp.exp(-jnp.abs(logits)))


def weighted_sigmoid_focal_loss(
    logits: jnp.ndarray,
    targets: jnp.ndarray,
    num_boxes: jnp.ndarray,
    weights: jnp.ndarray,
    alpha: float = 0.25,
    gamma: float = 2.0,
) -> jnp.ndarray:
    """Focal loss with per-element weights.

    Args:
      logits/targets/weights: (B, Q, C).
      num_boxes: scalar normalizer (already cross-replica averaged).
    Returns scalar: mean over Q, sum over (B, C), / num_boxes — exactly the
    reference reduction (conditional_detr.py:494).
    """
    prob = jax.nn.sigmoid(logits)
    ce = sigmoid_binary_cross_entropy(logits, targets)
    p_t = prob * targets + (1 - prob) * (1 - targets)
    p_t = jnp.clip(p_t, _EPS, 1 - _EPS)
    loss = weights * ce * (1 - p_t) ** gamma
    if alpha >= 0:
        alpha_t = alpha * targets + (1 - alpha) * (1 - targets)
        loss = alpha_t * loss
    return loss.mean(axis=1).sum() / num_boxes


def image_label_bce(logits: jnp.ndarray, labels: jnp.ndarray) -> jnp.ndarray:
    """Multilabel image classification BCE, mean over all elements
    (reference conditional_detr.py:231-232 uses default 'mean' reduction)."""
    return sigmoid_binary_cross_entropy(logits, labels.astype(logits.dtype)).mean()


def masked_l1_loss(
    src_boxes: jnp.ndarray,
    tgt_boxes: jnp.ndarray,
    pair_mask: jnp.ndarray,
    num_boxes: jnp.ndarray,
    pair_weight: jnp.ndarray | None = None,
) -> jnp.ndarray:
    """L1 box loss over matched pairs.

    src_boxes/tgt_boxes: (..., 4) aligned matched pairs (padded rows carry
    arbitrary values); pair_mask: (...,) 1.0 for real pairs.
    """
    l1 = jnp.abs(src_boxes - tgt_boxes).sum(-1)
    if pair_weight is not None:
        l1 = l1 * pair_weight
    return (l1 * pair_mask).sum() / num_boxes


def masked_giou_loss(
    src_xyxy: jnp.ndarray,
    tgt_xyxy: jnp.ndarray,
    pair_mask: jnp.ndarray,
    num_boxes: jnp.ndarray,
    pair_weight: jnp.ndarray | None = None,
) -> jnp.ndarray:
    """(1 - GIoU) over matched aligned pairs."""
    from spe_tpu.ops.boxes import generalized_box_iou_aligned

    giou = generalized_box_iou_aligned(src_xyxy, tgt_xyxy)
    loss = 1.0 - giou
    if pair_weight is not None:
        loss = loss * pair_weight
    return (loss * pair_mask).sum() / num_boxes


def dice_loss(logits: jnp.ndarray, targets: jnp.ndarray, num_boxes: jnp.ndarray,
              row_mask: jnp.ndarray = None) -> jnp.ndarray:
    """Dice loss for masks, (N, P) flattened (reference segmentation.py).
    row_mask (N,) zeroes padded rows before the sum."""
    probs = jax.nn.sigmoid(logits)
    numerator = 2 * (probs * targets).sum(-1)
    denominator = probs.sum(-1) + targets.sum(-1)
    loss = 1 - (numerator + 1) / (denominator + 1)
    if row_mask is not None:
        loss = loss * row_mask
    return loss.sum() / num_boxes


def sigmoid_focal_loss_masks(
    logits: jnp.ndarray,
    targets: jnp.ndarray,
    num_boxes: jnp.ndarray,
    alpha: float = 0.25,
    gamma: float = 2.0,
    row_mask: jnp.ndarray = None,
) -> jnp.ndarray:
    """Plain focal loss for mask logits (reference segmentation.py flavor):
    mean over last dim, sum / num_boxes."""
    prob = jax.nn.sigmoid(logits)
    ce = sigmoid_binary_cross_entropy(logits, targets)
    p_t = prob * targets + (1 - prob) * (1 - targets)
    loss = ce * ((1 - p_t) ** gamma)
    if alpha >= 0:
        alpha_t = alpha * targets + (1 - alpha) * (1 - targets)
        loss = alpha_t * loss
    loss = loss.mean(axis=1)
    if row_mask is not None:
        loss = loss * row_mask
    return loss.sum() / num_boxes
