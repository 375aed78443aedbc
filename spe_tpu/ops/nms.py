"""Masked per-class NMS on device.

The reference calls torchvision.ops.nms per class in a Python loop at eval
time (engine.py:662-680, engine_loc.py:154-174). Here NMS is a fixed-shape
batched op with class equality folded into the IoU mask so one pass handles
all classes ("batched NMS" trick: no per-class loop).

Greedy NMS is the recurrence  keep[i] = valid[i] & ~any_{j<i}(keep[j] &
suppress[j,i])  over score-sorted boxes — inherently sequential, but the
dependency DAG is shallow: suppression chains in real detections are a
handful of boxes deep. Instead of a 300-step lax.scan of tiny ops
(launch-bound: ~1 op per box), we iterate the WHOLE recurrence as a
fixpoint: start optimistically from keep=valid and apply
F(k)[i] = valid[i] & ~any_{j<i}(k[j] & suppress[j,i]) until k stops
changing. F is antitone, and each sweep finalizes one more level of the
dependency DAG (induction over chain depth), so it converges to the unique
greedy solution in (longest suppression chain)+1 sweeps — typically <6 —
each sweep one (N,N) masked reduction that vectorizes across the batch.
The scan formulation is kept as `nms_scan_reference` for the oracle tests.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from spe_tpu.ops.boxes import box_iou_pairwise


def _suppression(boxes, scores, labels, valid, iou_threshold):
    """Sorted order + S[j, i] = 'earlier box j suppresses i'."""
    n = boxes.shape[0]
    order = jnp.argsort(-jnp.where(valid, scores, -jnp.inf))
    b = boxes[order]
    l = labels[order]
    v = valid[order]
    iou, _ = box_iou_pairwise(b, b)
    same_class = l[:, None] == l[None, :]
    earlier = jnp.arange(n)[:, None] < jnp.arange(n)[None, :]
    return order, v, (iou > iou_threshold) & same_class & earlier


def _nms_fixpoint(boxes, scores, labels, valid, iou_threshold: float):
    """Fixpoint core: returns (keep (N,) bool, sweeps int32). `sweeps` is the
    number of antitone iterations until the greedy solution stabilized —
    (longest suppression chain)+1, the <6-typical claim the eval bench
    reports under realistic clustered detections (VERDICT r4 #7)."""
    n = boxes.shape[0]
    order, v, sup = _suppression(boxes, scores, labels, valid, iou_threshold)

    def cond(st):
        k, prev, it = st
        return jnp.any(k != prev) & (it < n)

    def body(st):
        k, _, it = st
        killed = jnp.any(k[:, None] & sup, axis=0)
        return v & ~killed, k, it + 1

    keep_sorted, _, sweeps = jax.lax.while_loop(
        cond, body, (v, ~v, jnp.int32(0)))
    return jnp.zeros(n, bool).at[order].set(keep_sorted), sweeps


@functools.partial(jax.jit, static_argnames=("iou_threshold",))
def nms_per_class(boxes: jnp.ndarray, scores: jnp.ndarray, labels: jnp.ndarray,
                  valid: jnp.ndarray, iou_threshold: float = 0.5) -> jnp.ndarray:
    """Greedy class-wise NMS (fixpoint formulation).

    Args:
      boxes: (N, 4) xyxy; scores: (N,); labels: (N,) int; valid: (N,) bool.
    Returns:
      keep: (N,) bool — survivors, semantics identical to running
      torchvision NMS independently per class on the valid subset.
    """
    keep, _ = _nms_fixpoint(boxes, scores, labels, valid, iou_threshold)
    return keep


def nms_scan_reference(boxes, scores, labels, valid, iou_threshold: float = 0.5):
    """The direct sequential recurrence (one lax.scan step per box) — kept
    as the exactness oracle for the fixpoint formulation above."""
    n = boxes.shape[0]
    order, v, sup = _suppression(boxes, scores, labels, valid, iou_threshold)

    def step(keep, i):
        killed = jnp.any(keep & sup[:, i])
        keep = keep.at[i].set(v[i] & ~killed)
        return keep, None

    keep_sorted, _ = jax.lax.scan(step, jnp.zeros(n, bool), jnp.arange(n))
    return jnp.zeros(n, bool).at[order].set(keep_sorted)


def batched_nms(boxes, scores, labels, valid, iou_threshold: float = 0.5):
    """vmap over a batch: (B, N, ...) -> (B, N) keep mask."""
    return jax.vmap(lambda b, s, l, v: nms_per_class(b, s, l, v, iou_threshold))(
        boxes, scores, labels, valid)


def batched_nms_stats(boxes, scores, labels, valid, iou_threshold: float = 0.5):
    """batched_nms plus the per-image fixpoint sweep count (observability:
    the eval bench reports sweeps under a realistic clustered-detection
    load; note vmapped while_loops run all lanes to the max count, so the
    BATCH cost is max(sweeps), which is what the numbers should quote)."""
    return jax.vmap(lambda b, s, l, v: _nms_fixpoint(b, s, l, v, iou_threshold))(
        boxes, scores, labels, valid)
