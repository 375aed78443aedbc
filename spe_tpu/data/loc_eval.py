"""GT-known localization scoring (host-side eval metric).

Ports the behavior of the reference's CAM localization scorer
(/root/reference/cams_deit.py:262-491: evaluate_cls_loc, get_topk_boxes,
cls_loc_err, cal_iou, get_badcase_detail) to a pure-numpy array interface:
no torch tensors, no string-encoded boxes, no file I/O side effects. The
box-from-CAM estimate reproduces get_bboxes (cams_deit.py:34-58): uint8
threshold at thr*max, largest connected component, bounding rect.

This is an offline metric (CUB/ImageNet-style single-label localization);
it is not on the VOC/COCO training path, which is why it runs on host numpy
like the other evaluators (data/voc_eval.py, data/coco_eval.py).
"""

from __future__ import annotations

from typing import Dict, List, Sequence

import numpy as np

from spe_tpu.utils.visualize import resize_cam

try:  # pragma: no cover - exercised when scipy present (it is in-tree CI)
    from scipy import ndimage as _ndimage
except Exception:  # pragma: no cover
    _ndimage = None

_EIGHT_CONN = np.ones((3, 3), dtype=bool)


def estimate_bbox(cam: np.ndarray, cam_thr: float = 0.2) -> List[int]:
    """Single box from a normalized CAM: threshold at thr*max (uint8 like
    the reference, cams_deit.py:40-45), largest 8-connected component,
    bounding rect [x0, y0, x1, y1]. Empty CAM -> [0, 0, 1, 1]."""
    cam8 = (np.asarray(cam, np.float32) * 255.0).astype(np.uint8)
    fg = cam8 > int(cam_thr * cam8.max())
    if not fg.any():
        return [0, 0, 1, 1]
    if _ndimage is not None:
        labels, n = _ndimage.label(fg, structure=_EIGHT_CONN)
        if n == 0:
            return [0, 0, 1, 1]
        areas = np.bincount(labels.ravel())[1:]
        comp = labels == (int(np.argmax(areas)) + 1)
    else:  # no scipy: bounding rect of all foreground (upper bound)
        comp = fg
    ys, xs = np.nonzero(comp)
    # cv2.boundingRect returns (x, y, w, h) with w/h = extent + 1;
    # the reference box is [x, y, x + w, y + h]
    return [int(xs.min()), int(ys.min()), int(xs.max()) + 1, int(ys.max()) + 1]


def cal_iou(box1, box2, method: str = "iou") -> np.ndarray:
    """IoU / IoG (intersection over gt) / IoB (over predicted box) with the
    reference's +1px pixel-extent convention (cams_deit.py:422-451)."""
    box1 = np.atleast_2d(np.asarray(box1, np.float64))
    box2 = np.atleast_2d(np.asarray(box2, np.float64))
    iw = np.minimum(box1[:, 2], box2[:, 2]) - np.maximum(box1[:, 0], box2[:, 0]) + 1
    ih = np.minimum(box1[:, 3], box2[:, 3]) - np.maximum(box1[:, 1], box2[:, 1]) + 1
    inter = np.maximum(iw, 0.0) * np.maximum(ih, 0.0)
    a1 = (box1[:, 2] - box1[:, 0] + 1) * (box1[:, 3] - box1[:, 1] + 1)
    a2 = (box2[:, 2] - box2[:, 0] + 1) * (box2[:, 3] - box2[:, 1] + 1)
    if method == "iog":
        return inter / a2
    if method == "iob":
        return inter / a1
    return inter / (a1 + a2 - inter)


def get_badcase_detail(top1_box, gt_boxes: np.ndarray, gt_label: int,
                       max_iou: float, max_gt_id: int):
    """Failure taxonomy of the top-1 prediction (cams_deit.py:453-491):
    (cls_wrong, multi_instances, region_part, region_more, region_wrong)."""
    pred_cls, pred_bbox = top1_box[0], top1_box[1:]
    if int(pred_cls) != int(gt_label):
        return 1, 0, 0, 0, 0
    if max_iou > 0.5:
        return 0, 0, 0, 0, 0
    gt_boxes = np.asarray(gt_boxes, np.float64).reshape(-1, 4)
    if len(gt_boxes) > 1:
        iogs = cal_iou(np.asarray(pred_bbox)[None].repeat(len(gt_boxes), 0),
                       gt_boxes, method="iog")
        if int(np.sum(iogs > 0.3)) > 1:
            return 0, 1, 0, 0, 0
    gt = gt_boxes[max_gt_id]
    if float(cal_iou(pred_bbox, gt, method="iob")[0]) > 0.5:
        return 0, 0, 1, 0, 0
    if float(cal_iou(pred_bbox, gt, method="iog")[0]) >= 0.7:
        return 0, 0, 0, 1, 0
    return 0, 0, 0, 0, 1


def cls_loc_err(topk_boxes, gt_label: int, gt_boxes, topk: Sequence[int] = (1,),
                iou_th: float = 0.5):
    """Top-k cls / loc accuracy (cams_deit.py:394-419). topk_boxes is a list
    (one entry per k) of [cls, x0, y0, x1, y1] candidate lists."""
    assert len(topk_boxes) == len(topk)
    gt_boxes = np.asarray(gt_boxes, np.float64).reshape(-1, 4)
    topk_cls, topk_loc = [], []
    wrong_details = (0, 0, 0, 0, 0)
    for topk_box in topk_boxes:
        loc_acc = cls_acc = 0
        for cls_box in topk_box:
            ious = cal_iou(np.asarray(cls_box[1:])[None].repeat(len(gt_boxes), 0),
                           gt_boxes)
            max_gt_id = int(np.argmax(ious))
            max_iou = float(ious[max_gt_id])
            if len(topk_box) == 1:
                wrong_details = get_badcase_detail(cls_box, gt_boxes, gt_label,
                                                   max_iou, max_gt_id)
            if int(cls_box[0]) == int(gt_label):
                cls_acc = 1
            if int(cls_box[0]) == int(gt_label) and max_iou > iou_th:
                loc_acc = 1
                break
        topk_loc.append(float(loc_acc))
        topk_cls.append(float(cls_acc))
    return topk_cls, topk_loc, wrong_details


def evaluate_cls_loc(logits: np.ndarray, cls_label: np.ndarray,
                     gt_boxes_per_image: Sequence[np.ndarray],
                     cams: np.ndarray, crop_size: int,
                     cam_thr: float = 0.2) -> Dict[str, List[float]]:
    """GT-known localization over a batch (cams_deit.py:262-372, minus the
    image dumping, which utils/visualize.py covers separately).

    logits: (B, C); cls_label: (B,) int single-label GT; gt_boxes_per_image:
    per image (Gi, 4) xyxy at crop_size resolution; cams: (B, C, h, w).
    Returns per-image 0/1 lists: cls_top1/5, loc_top1/5, loc_gt_known, and
    the top-1 failure taxonomy.
    """
    logits = np.asarray(logits, np.float32)
    cams = np.asarray(cams, np.float32)
    B = cams.shape[0]
    order = np.argsort(-logits, axis=1)
    out: Dict[str, List[float]] = {k: [] for k in (
        "cls_top1", "cls_top5", "loc_top1", "loc_top5", "loc_gt_known",
        "top1_loc_right", "top1_loc_cls", "top1_loc_mins", "top1_loc_part",
        "top1_loc_more", "top1_loc_wrong")}
    for b in range(B):
        gt_boxes = np.asarray(gt_boxes_per_image[b], np.float64).reshape(-1, 4)
        top5 = order[b, :5]
        boxes5 = []
        for cls in top5:
            cam = resize_cam(cams[b, cls], (crop_size, crop_size))
            boxes5.append([int(cls)] + estimate_bbox(cam, cam_thr))
        (c1, c5), (l1, l5), wrong = cls_loc_err(
            [boxes5[:1], boxes5], int(cls_label[b]), gt_boxes, topk=(1, 5))
        out["cls_top1"].append(c1)
        out["cls_top5"].append(c5)
        out["loc_top1"].append(l1)
        out["loc_top5"].append(l5)
        cls_wrong, mins, part, more, wrong_r = wrong
        out["top1_loc_right"].append(
            1 - (cls_wrong + mins + part + more + wrong_r))
        out["top1_loc_cls"].append(cls_wrong)
        out["top1_loc_mins"].append(mins)
        out["top1_loc_part"].append(part)
        out["top1_loc_more"].append(more)
        out["top1_loc_wrong"].append(wrong_r)
        # GT-known: CAM of the true class, box vs best-matching GT
        cam = resize_cam(cams[b, int(cls_label[b])], (crop_size, crop_size))
        est = estimate_bbox(cam, cam_thr)
        max_iou = float(np.max(cal_iou(
            np.asarray(est)[None].repeat(len(gt_boxes), 0), gt_boxes)))
        out["loc_gt_known"].append(1.0 if max_iou >= 0.5 else 0.0)
    return out
