"""Detection post-processors, fixed-shape on device.

Rebuilds of the reference post-processing heads (conditional_detr.py):
  * top-k detection output (`PostProcess`, :592-623): sigmoid -> flat top-k
    over queries x classes -> gather boxes -> scale to original size.
  * per-class argmax pseudo-labels (`PostProcessRefine`, :641-677): for each
    class present in the image label, the best query's box and score. The
    reference loops in Python per image per class; here it's one gather.
  * threshold multi-keep (`PostProcessRefineMulti`, :680-715): keep all
    queries >= 0.5 * per-class max (built but unused by the published
    recipe; provided for API parity).
"""

from __future__ import annotations

import functools
import jax
import jax.numpy as jnp

from spe_tpu.ops.boxes import box_cxcywh_to_xyxy


@functools.partial(jax.jit, static_argnames=("keep_queries",))
def postprocess_topk(pred_logits: jnp.ndarray, pred_boxes: jnp.ndarray,
                     target_sizes: jnp.ndarray, keep_queries: int = 100):
    """(B,Q,K) logits + (B,Q,4) cxcywh + (B,2) (h,w) -> top-k detections.

    Returns dict of scores (B,k), labels (B,k), boxes (B,k,4) xyxy in
    absolute target-size coordinates (reference conditional_detr.py:609-622).
    """
    B, Q, K = pred_logits.shape
    prob = jax.nn.sigmoid(pred_logits.astype(jnp.float32)).reshape(B, Q * K)
    # small configs can have fewer than keep_queries candidates
    keep_queries = min(keep_queries, Q * K)
    scores, idx = jax.lax.top_k(prob, keep_queries)
    q_idx = idx // K
    labels = idx % K
    boxes = jnp.clip(box_cxcywh_to_xyxy(pred_boxes.astype(jnp.float32)), 0.0, None)
    boxes = jnp.take_along_axis(boxes, q_idx[:, :, None], axis=1)
    h, w = target_sizes[:, 0], target_sizes[:, 1]
    scale = jnp.stack([w, h, w, h], axis=-1).astype(jnp.float32)
    return {"scores": scores, "labels": labels, "boxes": boxes * scale[:, None, :]}


@jax.jit
def postprocess_refine(pred_logits: jnp.ndarray, pred_boxes: jnp.ndarray,
                       tgt_labels: jnp.ndarray, tgt_mask: jnp.ndarray):
    """Per-class argmax pseudo-labels restricted to classes in the target
    label set (reference PostProcessRefine, conditional_detr.py:641-677).

    tgt_labels (B, T) det-class columns of the current targets, tgt_mask
    (B, T). Output is per target slot (same layout as the inputs):
      scores (B, T), boxes (B, T, 4) normalized cxcywh, labels/mask passthrough.
    """
    prob = jax.nn.sigmoid(pred_logits.astype(jnp.float32))      # (B, Q, K)
    top_val = jnp.max(prob, axis=1)                              # (B, K)
    top_idx = jnp.argmax(prob, axis=1)                           # (B, K)
    K = prob.shape[-1]
    ids = jnp.clip(tgt_labels, 0, K - 1)
    scores = jnp.take_along_axis(top_val, ids, axis=1)           # (B, T)
    q_of_class = jnp.take_along_axis(top_idx, ids, axis=1)       # (B, T)
    boxes = jnp.take_along_axis(pred_boxes.astype(jnp.float32),
                                q_of_class[:, :, None], axis=1)  # (B, T, 4)
    return {
        "boxes": boxes,
        "labels": tgt_labels,
        "scores": jnp.where(tgt_mask, scores, 0.0),
        "mask": tgt_mask,
    }


@functools.partial(jax.jit, static_argnames=("max_keep",))
def postprocess_refine_multi(pred_logits: jnp.ndarray, pred_boxes: jnp.ndarray,
                             img_label_det: jnp.ndarray, max_keep: int = 64):
    """Keep all queries with prob >= 0.5 * per-class max, classes restricted
    to the det-class multi-hot `img_label_det` (B, K). Fixed budget
    `max_keep` slots ordered by score (reference PostProcessRefineMulti)."""
    B, Q, K = pred_logits.shape
    prob = jax.nn.sigmoid(pred_logits.astype(jnp.float32))
    top_val = jnp.max(prob, axis=1, keepdims=True)               # (B, 1, K)
    keep = (prob >= 0.5 * top_val) & (img_label_det[:, None, :] > 0)
    flat_score = jnp.where(keep, prob, 0.0).reshape(B, Q * K)
    scores, idx = jax.lax.top_k(flat_score, max_keep)
    q_idx = idx // K
    labels = idx % K
    boxes = jnp.take_along_axis(pred_boxes.astype(jnp.float32),
                                q_idx[:, :, None], axis=1)
    return {"scores": scores, "labels": labels, "boxes": boxes,
            "mask": scores > 0.0}
