import numpy as np

from spe_tpu.data.panoptic_eval import PanopticEvaluator, pq_compute_single


def _map(seed_boxes, shape=(20, 20)):
    m = np.zeros(shape, np.int64)
    for sid, (y0, y1, x0, x1) in seed_boxes.items():
        m[y0:y1, x0:x1] = sid
    return m


def test_pq_perfect_match():
    gm = _map({1: (0, 10, 0, 10), 2: (10, 20, 10, 20)})
    gs = [{"id": 1, "category_id": 5}, {"id": 2, "category_id": 7}]
    ev = PanopticEvaluator()
    ev.update(gm, gs, gm.copy(), [dict(s) for s in gs])
    out = ev.summarize()
    assert abs(out["PQ"] - 1.0) < 1e-9
    assert abs(out["SQ"] - 1.0) < 1e-9


def test_pq_fp_on_void_is_ignored():
    """panopticapi semantics: predictions mostly covered by VOID are not FP."""
    gm = _map({1: (0, 10, 0, 10)})
    gs = [{"id": 1, "category_id": 5}]
    pm = _map({3: (12, 19, 12, 19)})  # entirely on void background
    ps = [{"id": 3, "category_id": 5}]
    stats = pq_compute_single(gm, gs, pm, ps)
    assert stats[5] == [0.0, 0, 0, 1]  # FN only; FP suppressed by void
    ev = PanopticEvaluator()
    ev.update(gm, gs, pm, ps)
    assert ev.summarize()["PQ"] == 0.0


def test_pq_fp_on_labeled_region_counts():
    # background fully labeled as category 9 -> stray prediction IS an FP
    gm = _map({2: (0, 20, 0, 20), 1: (0, 10, 0, 10)})
    gs = [{"id": 1, "category_id": 5}, {"id": 2, "category_id": 9}]
    pm = _map({8: (0, 20, 0, 20), 9: (0, 10, 0, 10), 3: (12, 19, 12, 19)})
    ps = [{"id": 9, "category_id": 5}, {"id": 8, "category_id": 9},
          {"id": 3, "category_id": 5}]
    stats = pq_compute_single(gm, gs, pm, ps)
    iou_sum, tp, fp, fn = stats[5]
    assert tp == 1 and fp == 1 and fn == 0


def test_pq_partial_iou():
    gm = _map({1: (0, 10, 0, 10)})
    gs = [{"id": 1, "category_id": 5}]
    pm = _map({9: (0, 10, 0, 8)})  # iou = 80/100 = 0.8
    ps = [{"id": 9, "category_id": 5}]
    stats = pq_compute_single(gm, gs, pm, ps)
    iou_sum, tp, fp, fn = stats[5]
    assert tp == 1 and fp == 0 and fn == 0
    assert abs(iou_sum - 0.8) < 1e-9


def test_pq_crowd_ignored():
    gm = _map({1: (0, 10, 0, 10)})
    gs = [{"id": 1, "category_id": 5, "iscrowd": 1}]
    pm = _map({9: (0, 10, 0, 10)})
    ps = [{"id": 9, "category_id": 5}]
    stats = pq_compute_single(gm, gs, pm, ps)
    # crowd GT: no FN; the prediction overlapping the crowd is not FP either
    assert stats.get(5, [0, 0, 0, 0])[1:] == [0, 0, 0]
