"""Masked per-class NMS on device.

The reference calls torchvision.ops.nms per class in a Python loop at eval
time (engine.py:662-680, engine_loc.py:154-174). Here NMS is a fixed-shape
batched op: greedy suppression expressed as `lax.scan` over the
score-sorted box list, with class equality folded into the IoU mask so one
pass handles all classes ("batched NMS" trick: no per-class loop).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from spe_tpu.ops.boxes import box_iou_pairwise


@functools.partial(jax.jit, static_argnames=("iou_threshold",))
def nms_per_class(boxes: jnp.ndarray, scores: jnp.ndarray, labels: jnp.ndarray,
                  valid: jnp.ndarray, iou_threshold: float = 0.5) -> jnp.ndarray:
    """Greedy class-wise NMS.

    Args:
      boxes: (N, 4) xyxy; scores: (N,); labels: (N,) int; valid: (N,) bool.
    Returns:
      keep: (N,) bool — survivors, semantics identical to running
      torchvision NMS independently per class on the valid subset.
    """
    n = boxes.shape[0]
    order = jnp.argsort(-jnp.where(valid, scores, -jnp.inf))
    b = boxes[order]
    l = labels[order]
    v = valid[order]

    iou, _ = box_iou_pairwise(b, b)
    same_class = l[:, None] == l[None, :]
    suppress = (iou > iou_threshold) & same_class  # (N, N), in sorted order

    def step(keep, i):
        # box i survives iff no higher-scoring kept box suppresses it
        killed = jnp.any(keep & suppress[i, :] & (jnp.arange(n) < i))
        keep = keep.at[i].set(v[i] & ~killed)
        return keep, None

    keep_sorted, _ = jax.lax.scan(step, jnp.zeros(n, bool), jnp.arange(n))
    # scatter back to original order
    keep = jnp.zeros(n, bool).at[order].set(keep_sorted)
    return keep


def batched_nms(boxes, scores, labels, valid, iou_threshold: float = 0.5):
    """vmap over a batch: (B, N, ...) -> (B, N) keep mask."""
    return jax.vmap(lambda b, s, l, v: nms_per_class(b, s, l, v, iou_threshold))(
        boxes, scores, labels, valid)
