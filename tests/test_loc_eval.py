"""GT-known localization scorer vs the reference formulas
(/root/reference/cams_deit.py:262-491) re-derived with cv2 as oracle."""

import numpy as np
import pytest

from spe_tpu.data.loc_eval import (cal_iou, cls_loc_err, estimate_bbox,
                                   evaluate_cls_loc, get_badcase_detail)

cv2 = pytest.importorskip("cv2")


def _cv2_get_bboxes(cam, cam_thr):
    """Literal reimplementation of reference get_bboxes (cams_deit.py:34-58)
    as a test oracle."""
    cam = (cam * 255.0).astype(np.uint8)
    map_thr = cam_thr * np.max(cam)
    _, thr_map = cv2.threshold(cam, int(map_thr), 255, cv2.THRESH_TOZERO)
    contours, _ = cv2.findContours(thr_map, cv2.RETR_TREE,
                                   cv2.CHAIN_APPROX_SIMPLE)
    if len(contours) == 0:
        return [0, 0, 1, 1]
    c = max(contours, key=cv2.contourArea)
    x, y, w, h = cv2.boundingRect(c)
    return [x, y, x + w, y + h]


def test_estimate_bbox_matches_cv2(rng):
    """Parity when the largest blob is unambiguous (we rank components by
    pixel count, cv2 by contourArea — near-ties may legitimately differ)."""
    yy, xx = np.mgrid[:56, :56]
    for trial in range(20):
        cam = np.zeros((56, 56), np.float32)
        # one dominant blob + optional small satellites
        cy, cx = rng.integers(16, 40, size=2)
        cam += np.exp(-(((yy - cy) ** 2 + (xx - cx) ** 2) / (2 * 7.0 ** 2)))
        for _ in range(int(rng.integers(0, 3))):
            sy, sx = rng.integers(4, 52, size=2)
            cam += 0.8 * np.exp(
                -(((yy - sy) ** 2 + (xx - sx) ** 2) / (2 * 2.0 ** 2)))
        cam = cam / cam.max()
        ours = estimate_bbox(cam, 0.2)
        ref = _cv2_get_bboxes(cam, 0.2)
        assert ours == ref, (trial, ours, ref)


def test_estimate_bbox_empty_cam():
    assert estimate_bbox(np.zeros((8, 8), np.float32), 0.2) == [0, 0, 1, 1]


def test_cal_iou_conventions():
    a = [0, 0, 9, 9]
    b = [0, 0, 4, 9]
    np.testing.assert_allclose(cal_iou(a, b)[0], 5.0 / 10.0)   # +1 extent
    np.testing.assert_allclose(cal_iou(a, b, "iog")[0], 1.0)   # covers gt
    np.testing.assert_allclose(cal_iou(a, b, "iob")[0], 0.5)


def test_badcase_taxonomy():
    gt = np.array([[10, 10, 30, 30]])
    # wrong class
    assert get_badcase_detail([1, 10, 10, 30, 30], gt, 0, 1.0, 0)[0] == 1
    # correct localization -> all zeros
    assert get_badcase_detail([0, 10, 10, 30, 30], gt, 0, 0.9, 0) == (0, 0, 0, 0, 0)
    # region part: pred inside gt (iob > 0.5)
    det = get_badcase_detail([0, 12, 12, 20, 20], gt, 0, 0.2, 0)
    assert det == (0, 0, 1, 0, 0)
    # region more: pred covers gt (iog >= 0.7) but too large
    det = get_badcase_detail([0, 0, 0, 55, 55], gt, 0, 0.14, 0)
    assert det == (0, 0, 0, 1, 0)


def test_cls_loc_err_topk():
    gt = [10, 10, 30, 30]
    boxes5 = [[3, 10, 10, 30, 30], [0, 10, 10, 30, 30], [1, 0, 0, 5, 5],
              [2, 0, 0, 5, 5], [4, 0, 0, 5, 5]]
    (c1, c5), (l1, l5), _ = cls_loc_err([boxes5[:1], boxes5], 0, gt, topk=(1, 5))
    assert (c1, l1) == (0.0, 0.0)      # top-1 is class 3, not 0
    assert (c5, l5) == (1.0, 1.0)      # class 0 with the right box is in top-5


def test_evaluate_cls_loc_end_to_end():
    B, C, h, crop = 2, 4, 14, 56
    cams = np.zeros((B, C, h, h), np.float32)
    logits = np.zeros((B, C), np.float32)
    # image 0: class 2 CAM is a tight blob where the GT box is
    cams[0, 2, 3:7, 3:7] = 1.0
    logits[0] = [0.1, 0.2, 3.0, 0.3]
    # image 1: class 1 predicted but CAM misses the GT region
    cams[1, 1, 0:2, 0:2] = 1.0
    logits[1] = [0.2, 2.0, 0.1, 0.0]
    scale = crop / h
    gt0 = np.array([[3 * scale, 3 * scale, 7 * scale, 7 * scale]])
    gt1 = np.array([[40, 40, 55, 55]])
    out = evaluate_cls_loc(logits, np.array([2, 1]), [gt0, gt1], cams,
                           crop_size=crop, cam_thr=0.2)
    assert out["cls_top1"] == [1.0, 1.0]
    assert out["loc_gt_known"][0] == 1.0
    assert out["loc_gt_known"][1] == 0.0
    assert out["loc_top1"][0] == 1.0
    assert out["loc_top1"][1] == 0.0
    assert out["top1_loc_right"][0] == 1
    assert sum(out["top1_loc_wrong"]) + sum(out["top1_loc_more"]) + \
        sum(out["top1_loc_part"]) + sum(out["top1_loc_mins"]) >= 1
