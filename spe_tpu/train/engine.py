"""Train / eval loops (reference engine.py + engine_loc.py).

train_one_epoch: iterate the loader, run the single jitted train step
(forward + pseudo-labels + criteria + update all fused), log metrics.
The reference's per-step host work (cv2 CAM boxes, scipy matching, python
postprocess loops) is gone — the host only feeds batches and reads scalars.

evaluate_coco: reference `evaluate_refinements` (engine.py:616-724): the
eval head is outputs[stage]['aux_outputs'][-1] — i.e. the SECOND-TO-LAST
decoder layer (aux excludes the final layer) — then top-100 postprocess,
per-class NMS@0.5 on device, host-side COCO accumulation.

evaluate_voc: reference `evaluate_det_voc` (engine_loc.py:126-201): stage-0
final layer, optional horizontal-flip TTA merged via decouple (flip x,
elementwise-max image logits, concat query sets), top-300, NMS, VOC mAP +
CorLoc.
"""

from __future__ import annotations

import sys
from typing import Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from spe_tpu.config import SPEConfig
from spe_tpu.data.coco_eval import CocoEvaluator
from spe_tpu.data.voc_eval import corloc, voc_eval_all
from spe_tpu.ops.nms import batched_nms
from spe_tpu.ops.postprocess import postprocess_topk
from spe_tpu.utils.logging import MetricLogger


def train_one_epoch(step_fn, state, loader, epoch: int, cfg: SPEConfig,
                    gates, rng, mesh=None, print_freq: int = 100,
                    logger: Optional[MetricLogger] = None):
    """Returns (state, stats dict)."""
    from spe_tpu.parallel.mesh import shard_batch

    metric = logger or MetricLogger()
    total = loader.steps_per_epoch()
    for i, batch in enumerate(metric.log_every(
            loader.epoch(epoch), print_freq, header=f"Epoch [{epoch}]", total=total)):
        batch = {k: jnp.asarray(v) for k, v in batch.items()
                 if k in ("images", "pad_mask", "img_label")}
        if mesh is not None:
            batch = shard_batch(mesh, batch)
        state, metrics = step_fn(state, batch, jax.random.fold_in(rng, i), gates)
        if i % print_freq == 0:
            # host sync only at print boundaries; bad_steps accumulates
            # device-side so no non-finite step in the window is missed
            # (reference aborts per step, engine.py:156-159 — here the
            # offending updates were already skipped on device)
            loss = float(metrics["loss"])
            if not np.isfinite(loss) or int(metrics["bad_steps"]) > 0:
                print(f"Loss is {loss} ({int(metrics['bad_steps'])} non-finite "
                      f"steps so far), stopping training")
                sys.exit(1)
            metric.update(loss=loss,
                          loss_ce=float(metrics.get("loss_ce", 0.0)),
                          loss_bbox=float(metrics.get("loss_bbox", 0.0)),
                          loss_giou=float(metrics.get("loss_giou", 0.0)),
                          grad_norm=float(metrics.get("grad_norm", 0.0)),
                          # assignment-solver health (ops/assignment.py):
                          # worst iteration count + cleanup activations
                          match_iters=float(metrics.get("match_iters", 0.0)),
                          match_cleanup=float(metrics.get("match_cleanup", 0.0)),
                          # assignment-cost optimality vs exact Hungarian
                          # (cfg.log_match_cost runs only; zeros otherwise)
                          **{k: float(metrics[k]) for k in
                             ("match_subopt_mean", "match_subopt_max")
                             if k in metrics})
    metric.synchronize_between_processes()
    return state, {k: m.global_avg for k, m in metric.meters.items()}


# ---------------------------------------------------------------------------
# Eval
# ---------------------------------------------------------------------------

def _eval_outputs(model, params, batch, *, refine_stage: int, use_aux_layer: bool,
                  layer: int = -1):
    """layer selects the aux decoder layer when use_aux_layer (default -1 =
    second-to-last overall, engine.py:642; other indices reproduce the
    reference's evaluate_refinements_specific_layer, engine.py:727)."""
    out = model.apply(params, batch["images"], pad_mask=batch.get("pad_mask"),
                      deterministic=True)
    st = out["stages"][refine_stage]
    if use_aux_layer:
        return {"pred_logits": st["aux_pred_logits"][layer],
                "pred_boxes": st["aux_pred_boxes"][layer]}, out
    return {"pred_logits": st["pred_logits"], "pred_boxes": st["pred_boxes"]}, out


def evaluate_coco(model, params, loader, gt_coco: Dict, cfg: SPEConfig,
                  refine_stage: int = 0, keep: int = 100,
                  nms_iou: float = 0.5, use_aux_layer: bool = True,
                  eval_save_path=None) -> Dict[str, float]:
    """use_aux_layer=True evaluates the second-to-last decoder layer like the
    reference's evaluate_refinements (engine.py:642); False evaluates the
    final layer (the reference's plain `evaluate`, engine.py:447).

    When the loader's batches carry padded GT arrays (gt_boxes/gt_labels/
    gt_mask), eval-time criterion losses on the evaluated layer are logged
    and returned alongside the AP stats, like the reference's eval-loop
    loss logging (engine.py:644-660, losses=['labels','boxes','cardinality'])."""
    evaluator = CocoEvaluator(gt_coco)
    metric = MetricLogger()

    @jax.jit
    def infer(params, images, pad_mask, orig_sizes):
        outs, _ = _eval_outputs(model, params,
                                {"images": images, "pad_mask": pad_mask},
                                refine_stage=refine_stage, use_aux_layer=use_aux_layer)
        res = postprocess_topk(outs["pred_logits"], outs["pred_boxes"],
                               orig_sizes.astype(jnp.float32), keep_queries=keep)
        keep_mask = batched_nms(res["boxes"], res["scores"], res["labels"],
                                jnp.ones_like(res["scores"], bool), nms_iou)
        return res, keep_mask

    @jax.jit
    def eval_losses(params, images, pad_mask, gt_boxes, gt_labels, gt_mask):
        from spe_tpu.train.criterion import _layer_losses, match

        outs, _ = _eval_outputs(model, params,
                                {"images": images, "pad_mask": pad_mask},
                                refine_stage=refine_stage, use_aux_layer=use_aux_layer)
        targets = {"boxes": gt_boxes, "labels": gt_labels, "mask": gt_mask}
        row = match(outs["pred_logits"], outs["pred_boxes"], targets,
                    method=cfg.assignment, cost_class=cfg.set_cost_class,
                    cost_bbox=cfg.set_cost_bbox, cost_giou=cfg.set_cost_giou)
        nb = jnp.maximum(gt_mask.astype(jnp.float32).sum(), 1.0)
        return _layer_losses(outs["pred_logits"], outs["pred_boxes"], targets,
                             row, nb, focal_alpha=cfg.focal_alpha,
                             focal_gamma=cfg.focal_gamma, refine_weights=False)

    for batch in loader.epoch(0):
        res, keep_mask = infer(params, jnp.asarray(batch["images"]),
                               jnp.asarray(batch["pad_mask"]),
                               jnp.asarray(batch["orig_size"]))
        if "gt_boxes" in batch:
            ld = eval_losses(params, jnp.asarray(batch["images"]),
                             jnp.asarray(batch["pad_mask"]),
                             jnp.asarray(batch["gt_boxes"]),
                             jnp.asarray(batch["gt_labels"]),
                             jnp.asarray(batch["gt_mask"]))
            metric.update(**{k: float(v) for k, v in ld.items()})
        evaluator.update_from_arrays(
            batch["image_id"], np.asarray(res["boxes"]), np.asarray(res["scores"]),
            np.asarray(res["labels"]), np.asarray(keep_mask))
    merge_across_processes(evaluator)
    metric.synchronize_between_processes()
    stats = evaluator.summarize()
    stats.update({f"eval_{k}": m.global_avg for k, m in metric.meters.items()})
    if eval_save_path is not None and jax.process_index() == 0:
        evaluator.save_eval(eval_save_path)
    return stats


def pack_detections(evaluator, max_dets: int = 200_000) -> np.ndarray:
    """One host's detections as a fixed-shape float plane
    [valid, image_id, category_id, x, y, w, h, score] (max_dets, 8)."""
    rows = []
    for (img, cat), ds in evaluator._dt.items():
        for d in ds:
            b = d["bbox"]
            rows.append([1.0, img, cat, b[0], b[1], b[2], b[3], d["score"]])
    if len(rows) > max_dets:
        print(f"merge_across_processes: truncating {len(rows)} local detections "
              f"to the {max_dets} fixed-gather cap; AP may be affected",
              flush=True)
    arr = np.zeros((max_dets, 8), np.float32)
    if rows:
        packed = np.asarray(rows[:max_dets], np.float32)
        arr[: len(packed)] = packed
    return arr


def unpack_detections(evaluator, gathered: np.ndarray) -> None:
    """Replace the evaluator's detections with the union of all processes'
    packed planes (P, max_dets, 8)."""
    for k in evaluator._dt:
        evaluator._dt[k] = []
    for p in range(gathered.shape[0]):
        plane = gathered[p]
        for row in plane[plane[:, 0] > 0.5]:
            evaluator.update([{
                "image_id": int(row[1]), "category_id": int(row[2]),
                "bbox": [float(row[3]), float(row[4]), float(row[5]), float(row[6])],
                "score": float(row[7]),
            }])


def merge_across_processes(evaluator, max_dets: int = 200_000) -> None:
    """Cross-host eval merge: fixed-shape array gather instead of the
    reference's pickle-based all_gather (coco_eval.py:178-207). Each host
    packs its detections into one padded float plane; process_allgather
    moves them over ICI/DCN; every host rebuilds the full detection set.
    No-op with a single process. (pack/unpack are separate so the >1-process
    merge logic is unit-testable without a multi-host run.)"""
    if jax.process_count() == 1:
        return
    from jax.experimental import multihost_utils

    arr = pack_detections(evaluator, max_dets)
    gathered = multihost_utils.process_allgather(arr)  # (P, max_dets, 8)
    unpack_detections(evaluator, np.asarray(gathered))


def _flip_merge(out_n, out_f, bb_n=None, bb_f=None):
    """decouple_output (engine_loc.py:99-124): flip x back, concat query sets;
    image-level logits (x_logits / x_cls_logits) are elementwise-MAX merged
    (engine_loc.py:111-112) when backbone outputs are provided."""
    boxes_f = out_f["pred_boxes"].at[..., 0].set(1.0 - out_f["pred_boxes"][..., 0])
    merged = {
        "pred_logits": jnp.concatenate([out_n["pred_logits"], out_f["pred_logits"]], axis=1),
        "pred_boxes": jnp.concatenate([out_n["pred_boxes"], boxes_f], axis=1),
    }
    if bb_n is not None:
        for k in ("x_logits", "x_cls_logits"):
            if k in bb_n:
                merged[k] = jnp.maximum(bb_n[k], bb_f[k])
    return merged


def evaluate_voc(model, params, loader, dataset, cfg: SPEConfig,
                 refine_stage: int = 0, with_flip: bool = False,
                 keep: int = 300, nms_iou: float = 0.5,
                 use_07_metric: bool = True,
                 results_dir=None) -> Dict[str, float]:
    """VOC mAP + CorLoc over a VOCDevkitDataset.

    results_dir: when set, additionally dump reference-format VOCdevkit
    result files (comp4_det_test_{cls}.txt, voc_voc.py:366-391) so the
    official devkit tools can cross-check the detections."""
    num_classes = len(dataset.classes)
    all_dets = {c + 1: [] for c in range(num_classes)}
    top_boxes = {c + 1: {} for c in range(num_classes)}
    top_scores = {c + 1: {} for c in range(num_classes)}

    @jax.jit
    def infer(params, images, pad_mask, sizes):
        if with_flip:
            # batch normal+flipped into ONE forward (reference stacks them,
            # engine_loc.py:142-147) — 2B through the MXU beats two passes
            B = images.shape[0]
            cat = {"images": jnp.concatenate(
                       [images, images[:, :, ::-1, :]], axis=0),
                   "pad_mask": jnp.concatenate(
                       [pad_mask, pad_mask[:, :, ::-1]], axis=0)}
            outs2, full2 = _eval_outputs(model, params, cat,
                                         refine_stage=refine_stage,
                                         use_aux_layer=False)
            outs = {k: v[:B] for k, v in outs2.items()}
            outs_f = {k: v[B:] for k, v in outs2.items()}
            bb_n = {k: v[:B] for k, v in full2["backbone"].items()}
            bb_f = {k: v[B:] for k, v in full2["backbone"].items()}
            outs = _flip_merge(outs, outs_f, bb_n, bb_f)
        else:
            outs, _ = _eval_outputs(model, params,
                                    {"images": images, "pad_mask": pad_mask},
                                    refine_stage=refine_stage, use_aux_layer=False)
        res = postprocess_topk(outs["pred_logits"], outs["pred_boxes"],
                               sizes.astype(jnp.float32), keep_queries=keep)
        keep_mask = batched_nms(res["boxes"], res["scores"], res["labels"],
                                jnp.ones_like(res["scores"], bool), nms_iou)
        return res, keep_mask

    for batch in loader.epoch(0):
        # VOC eval scales boxes to the resized image size flipped to (w,h)?
        # reference uses t["image_size"].flip(0) = (w, h) of the ORIGINAL
        # image (engine_loc.py:152) — i.e. boxes in original coordinates.
        res, keep_mask = infer(params, jnp.asarray(batch["images"]),
                               jnp.asarray(batch["pad_mask"]),
                               jnp.asarray(batch["orig_size"]))
        boxes = np.asarray(res["boxes"])
        scores = np.asarray(res["scores"])
        labels = np.asarray(res["labels"])
        km = np.asarray(keep_mask)
        for b in range(len(batch["image_id"])):
            idx = int(batch["image_id"][b])
            for i in np.where(km[b])[0]:
                c = int(labels[b][i])
                if c == 0:  # class column 0 is unused (labels are 1..C)
                    continue
                if c > num_classes:
                    continue
                all_dets[c].append((idx, float(scores[b][i]), boxes[b][i].tolist()))
                if (idx not in top_scores[c]) or scores[b][i] > top_scores[c][idx]:
                    top_scores[c][idx] = float(scores[b][i])
                    top_boxes[c][idx] = boxes[b][i].tolist()

    if results_dir is not None:
        from spe_tpu.data.voc_eval import write_voc_results_files

        write_voc_results_files(all_dets, lambda k: dataset.items[k],
                                results_dir, dataset.classes)

    gt = dataset.eval_ground_truth()
    det_stats = voc_eval_all(all_dets, gt, use_07_metric=use_07_metric)
    loc_stats = corloc(top_boxes, gt)
    return {**det_stats, **loc_stats}
