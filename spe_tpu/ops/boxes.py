"""Box geometry ops (pure jnp, shape-polymorphic, vmap/jit friendly).

TPU-native equivalent of reference util/box_ops.py (box_cxcywh_to_xyxy,
box_xyxy_to_cxcywh, box_iou, generalized_box_iou, masks_to_boxes). Unlike the
reference these never assert on degenerate boxes (asserts don't exist under
jit); degenerate inputs produce finite values via eps-guarded divisions and
are expected to be masked out by callers.
"""

from __future__ import annotations

import jax.numpy as jnp

_EPS = 1e-9


def box_cxcywh_to_xyxy(b: jnp.ndarray) -> jnp.ndarray:
    cx, cy, w, h = jnp.split(b, 4, axis=-1)
    return jnp.concatenate(
        [cx - 0.5 * w, cy - 0.5 * h, cx + 0.5 * w, cy + 0.5 * h], axis=-1)


def box_xyxy_to_cxcywh(b: jnp.ndarray) -> jnp.ndarray:
    x0, y0, x1, y1 = jnp.split(b, 4, axis=-1)
    return jnp.concatenate(
        [(x0 + x1) * 0.5, (y0 + y1) * 0.5, x1 - x0, y1 - y0], axis=-1)


def box_area(b: jnp.ndarray) -> jnp.ndarray:
    """Area of xyxy boxes, last dim 4 -> scalar per box."""
    return jnp.clip(b[..., 2] - b[..., 0], 0, None) * jnp.clip(
        b[..., 3] - b[..., 1], 0, None)


def box_iou_pairwise(boxes1: jnp.ndarray, boxes2: jnp.ndarray):
    """Pairwise IoU of xyxy boxes: (..., N, 4) x (..., M, 4) -> (..., N, M).

    Matches reference util/box_ops.py:33-46 (returns iou and union).
    """
    area1 = box_area(boxes1)
    area2 = box_area(boxes2)
    lt = jnp.maximum(boxes1[..., :, None, :2], boxes2[..., None, :, :2])
    rb = jnp.minimum(boxes1[..., :, None, 2:], boxes2[..., None, :, 2:])
    wh = jnp.clip(rb - lt, 0, None)
    inter = wh[..., 0] * wh[..., 1]
    union = area1[..., :, None] + area2[..., None, :] - inter
    iou = inter / jnp.maximum(union, _EPS)
    return iou, union


def generalized_box_iou_pairwise(boxes1: jnp.ndarray, boxes2: jnp.ndarray):
    """Pairwise GIoU (reference util/box_ops.py:49-74), eps-guarded."""
    iou, union = box_iou_pairwise(boxes1, boxes2)
    lt = jnp.minimum(boxes1[..., :, None, :2], boxes2[..., None, :, :2])
    rb = jnp.maximum(boxes1[..., :, None, 2:], boxes2[..., None, :, 2:])
    wh = jnp.clip(rb - lt, 0, None)
    area = wh[..., 0] * wh[..., 1]
    return iou - (area - union) / jnp.maximum(area, _EPS)


def box_iou_aligned(boxes1: jnp.ndarray, boxes2: jnp.ndarray) -> jnp.ndarray:
    """Elementwise IoU of equal-shaped xyxy box arrays (..., 4)."""
    lt = jnp.maximum(boxes1[..., :2], boxes2[..., :2])
    rb = jnp.minimum(boxes1[..., 2:], boxes2[..., 2:])
    wh = jnp.clip(rb - lt, 0, None)
    inter = wh[..., 0] * wh[..., 1]
    union = box_area(boxes1) + box_area(boxes2) - inter
    return inter / jnp.maximum(union, _EPS)


def generalized_box_iou_aligned(boxes1: jnp.ndarray, boxes2: jnp.ndarray) -> jnp.ndarray:
    """Elementwise GIoU of equal-shaped xyxy box arrays (..., 4).

    Equivalent to diag(generalized_box_iou(a, b)) in the reference loss path
    (conditional_detr.py:315-317) without materializing the NxN matrix.
    """
    iou = box_iou_aligned(boxes1, boxes2)
    lt = jnp.minimum(boxes1[..., :2], boxes2[..., :2])
    rb = jnp.maximum(boxes1[..., 2:], boxes2[..., 2:])
    wh = jnp.clip(rb - lt, 0, None)
    area = wh[..., 0] * wh[..., 1]
    inter_lt = jnp.maximum(boxes1[..., :2], boxes2[..., :2])
    inter_rb = jnp.minimum(boxes1[..., 2:], boxes2[..., 2:])
    inter_wh = jnp.clip(inter_rb - inter_lt, 0, None)
    inter = inter_wh[..., 0] * inter_wh[..., 1]
    union = box_area(boxes1) + box_area(boxes2) - inter
    return iou - (area - union) / jnp.maximum(area, _EPS)


def masks_to_boxes(masks: jnp.ndarray) -> jnp.ndarray:
    """Bounding boxes (xyxy) around binary masks (N, H, W) -> (N, 4).

    Reference util/box_ops.py:77-101. Empty masks produce zeros.
    """
    n, h, w = masks.shape
    ys = jnp.arange(h, dtype=jnp.float32)[None, :, None]
    xs = jnp.arange(w, dtype=jnp.float32)[None, None, :]
    m = masks.astype(bool)
    big = jnp.float32(1e8)
    x_max = jnp.max(jnp.where(m, xs, -big), axis=(1, 2))
    x_min = jnp.min(jnp.where(m, xs, big), axis=(1, 2))
    y_max = jnp.max(jnp.where(m, ys, -big), axis=(1, 2))
    y_min = jnp.min(jnp.where(m, ys, big), axis=(1, 2))
    any_pix = jnp.any(m, axis=(1, 2))
    out = jnp.stack([x_min, y_min, x_max, y_max], axis=1)
    return jnp.where(any_pix[:, None], out, 0.0)
