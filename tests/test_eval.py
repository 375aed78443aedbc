import numpy as np

from spe_tpu.data.coco_eval import CocoEvaluator
from spe_tpu.data.voc_eval import corloc, voc_ap, voc_eval_all, voc_eval_class


def _gt(images, anns, n_cats=2):
    return {
        "images": [{"id": i, "width": 100, "height": 100} for i in images],
        "annotations": [
            {"id": k + 1, "image_id": a[0], "category_id": a[1],
             "bbox": a[2], "area": a[2][2] * a[2][3], "iscrowd": a[3] if len(a) > 3 else 0}
            for k, a in enumerate(anns)],
        "categories": [{"id": c, "name": str(c)} for c in range(1, n_cats + 1)],
    }


def test_coco_eval_perfect_detections():
    gt = _gt([0, 1], [(0, 1, [10, 10, 20, 20]), (1, 1, [30, 30, 10, 10]),
                      (1, 2, [50, 50, 20, 10])])
    ev = CocoEvaluator(gt)
    for a in gt["annotations"]:
        x, y, w, h = a["bbox"]
        ev.update([{"image_id": a["image_id"], "category_id": a["category_id"],
                    "bbox": [x, y, w, h], "score": 0.9}])
    stats = ev.summarize()
    assert abs(stats["AP"] - 1.0) < 1e-6
    assert abs(stats["AP50"] - 1.0) < 1e-6
    assert abs(stats["AP75"] - 1.0) < 1e-6


def test_coco_eval_no_detections():
    gt = _gt([0], [(0, 1, [10, 10, 20, 20])])
    ev = CocoEvaluator(gt)
    stats = ev.summarize()
    assert stats["AP"] == 0.0


def test_coco_eval_half_iou():
    """A detection at IoU ~0.57 counts at thr 0.5/0.55 but not 0.6+."""
    gt = _gt([0], [(0, 1, [0, 0, 20, 20])])
    ev = CocoEvaluator(gt)
    # shifted box: overlap 14x20=280, union 520+... compute: det [6,0,20,20]
    # inter = 14*20 = 280, union = 400+400-280 = 520, iou = 0.538
    ev.update([{"image_id": 0, "category_id": 1, "bbox": [6, 0, 20, 20], "score": 0.9}])
    stats = ev.summarize()
    # matched at 0.5 only -> AP50 = 1, AP = 1/10
    assert abs(stats["AP50"] - 1.0) < 1e-6
    assert abs(stats["AP"] - 0.1) < 1e-6


def test_coco_eval_score_ordering_fp():
    """A high-scoring FP before the TP halves interpolated precision."""
    gt = _gt([0], [(0, 1, [0, 0, 20, 20])])
    ev = CocoEvaluator(gt)
    ev.update([
        {"image_id": 0, "category_id": 1, "bbox": [60, 60, 10, 10], "score": 0.95},
        {"image_id": 0, "category_id": 1, "bbox": [0, 0, 20, 20], "score": 0.9},
    ])
    stats = ev.summarize()
    assert abs(stats["AP50"] - 0.5) < 1e-6


def test_coco_eval_crowd_ignore():
    """Matching a crowd GT neither helps nor hurts."""
    gt = _gt([0], [(0, 1, [0, 0, 20, 20]), (0, 1, [50, 50, 30, 30], 1)])
    ev = CocoEvaluator(gt)
    ev.update([
        {"image_id": 0, "category_id": 1, "bbox": [0, 0, 20, 20], "score": 0.9},
        {"image_id": 0, "category_id": 1, "bbox": [50, 50, 30, 30], "score": 0.8},
    ])
    stats = ev.summarize()
    assert abs(stats["AP50"] - 1.0) < 1e-6


def test_coco_eval_area_ranges():
    gt = _gt([0], [(0, 1, [0, 0, 10, 10])])  # area 100 -> small
    ev = CocoEvaluator(gt)
    ev.update([{"image_id": 0, "category_id": 1, "bbox": [0, 0, 10, 10], "score": 0.9}])
    stats = ev.summarize()
    assert abs(stats["APs"] - 1.0) < 1e-6
    assert stats["APl"] == -1.0  # no large GT


def test_voc_ap_11pt_vs_auc():
    rec = np.array([0.5, 1.0])
    prec = np.array([1.0, 0.5])
    ap11 = voc_ap(rec, prec, use_07_metric=True)
    # 11-pt: t in 0..0.5 -> p=1 (6 points), t in 0.6..1.0 -> p=0.5 (5 points)
    assert abs(ap11 - (6 * 1.0 + 5 * 0.5) / 11) < 1e-9
    auc = voc_ap(rec, prec, use_07_metric=False)
    assert abs(auc - (0.5 * 1.0 + 0.5 * 0.5)) < 1e-9


def test_voc_eval_class_difficult_handling():
    gt = {0: (np.array([[0, 0, 20, 20], [50, 50, 70, 70]], np.float64),
              np.array([False, True]))}
    dets = [(0, 0.9, [0, 0, 20, 20]), (0, 0.8, [50, 50, 70, 70])]
    rec, prec, ap = voc_eval_class(dets, gt)
    # difficult GT: its detection is neither TP nor FP; npos counts only easy
    assert abs(rec[-1] - 1.0) < 1e-9
    assert abs(ap - 1.0) < 1e-9


def test_voc_eval_double_detection_is_fp():
    gt = {0: (np.array([[0, 0, 20, 20]], np.float64), np.array([False]))}
    dets = [(0, 0.9, [0, 0, 20, 20]), (0, 0.8, [1, 1, 21, 21])]
    rec, prec, ap = voc_eval_class(dets, gt)
    assert abs(rec[-1] - 1.0) < 1e-9
    assert prec[-1] == 0.5


def test_corloc():
    gt = {1: {0: (np.array([[0, 0, 20, 20]], np.float64), np.array([False])),
              1: (np.array([[10, 10, 40, 40]], np.float64), np.array([False]))}}
    top = {1: {0: [0, 0, 20, 20], 1: [80, 80, 90, 90]}}
    out = corloc(top, gt)
    assert abs(out["CorLoc"] - 0.5) < 1e-9


def test_coco_eval_merge():
    gt = _gt([0, 1], [(0, 1, [10, 10, 20, 20]), (1, 1, [30, 30, 10, 10])])
    ev1 = CocoEvaluator(gt)
    ev2 = CocoEvaluator(gt)
    ev1.update([{"image_id": 0, "category_id": 1, "bbox": [10, 10, 20, 20], "score": 0.9}])
    ev2.update([{"image_id": 1, "category_id": 1, "bbox": [30, 30, 10, 10], "score": 0.9}])
    ev1.merge(ev2)
    stats = ev1.summarize()
    assert abs(stats["AP50"] - 1.0) < 1e-6


def test_merge_across_processes_single_host_noop():
    from spe_tpu.train.engine import merge_across_processes

    gt = _gt([0], [(0, 1, [10, 10, 20, 20])])
    ev = CocoEvaluator(gt)
    ev.update([{"image_id": 0, "category_id": 1, "bbox": [10, 10, 20, 20],
                "score": 0.9}])
    merge_across_processes(ev)  # process_count == 1 -> no-op
    assert abs(ev.summarize()["AP50"] - 1.0) < 1e-6


def test_voc_results_file_roundtrip(tmp_path):
    """Devkit result-file dump compatibility (reference voc_voc.py:366-391):
    byte format '{name} {score:.3f} {x1+1:.1f} ...' (1-based), one file per
    (year, class); read_voc_results_file inverts it to 0-based boxes."""
    from spe_tpu.data.voc_eval import (read_voc_results_file,
                                       write_voc_results_files)

    items = [("VOC2007", "000005"), ("VOC2007", "000012"),
             ("VOC2012", "2008_000001")]
    classes = ["aeroplane", "bicycle"]
    all_dets = {
        1: [(0, 0.91234, [10.0, 20.0, 110.5, 220.25]),
            (2, 0.5, [1.0, 2.0, 3.0, 4.0])],
        2: [(1, 0.25, [0.0, 0.0, 50.0, 60.0])],
    }
    written = write_voc_results_files(all_dets, lambda k: items[k],
                                      tmp_path, classes)
    assert sorted(p.split("/")[-3:] for p in written) == [
        ["VOC2007", "Main", "comp4_det_test_aeroplane.txt"],
        ["VOC2007", "Main", "comp4_det_test_bicycle.txt"],
        ["VOC2012", "Main", "comp4_det_test_aeroplane.txt"],
    ]
    line = (tmp_path / "VOC2007" / "Main" /
            "comp4_det_test_aeroplane.txt").read_text().splitlines()[0]
    assert line == "000005 0.912 11.0 21.0 111.5 221.2"  # 1-based, %.3f/%.1f

    back = read_voc_results_file(
        tmp_path / "VOC2007" / "Main" / "comp4_det_test_aeroplane.txt")
    assert back[0][0] == "000005"
    assert abs(back[0][1] - 0.912) < 1e-9
    assert back[0][2] == [10.0, 20.0, 110.5, 220.2]  # %.1f rounding only
