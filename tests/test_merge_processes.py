"""Multi-process eval-merge logic (pack -> allgather -> unpack), simulated
with two packed planes — exercises the >1-process branch the reference
covers only by live multi-GPU runs (coco_eval.py:178-207)."""

import numpy as np

from spe_tpu.data.coco_eval import CocoEvaluator
from spe_tpu.train.engine import pack_detections, unpack_detections


def _gt():
    return {
        "images": [{"id": 1, "width": 100, "height": 100},
                   {"id": 2, "width": 100, "height": 100}],
        "annotations": [
            {"id": 1, "image_id": 1, "category_id": 1,
             "bbox": [10, 10, 30, 30], "area": 900, "iscrowd": 0},
            {"id": 2, "image_id": 2, "category_id": 2,
             "bbox": [40, 40, 20, 20], "area": 400, "iscrowd": 0},
        ],
        "categories": [{"id": 1, "name": "a"}, {"id": 2, "name": "b"}],
    }


def _det(image_id, cat, score, box=(10, 10, 30, 30)):
    return {"image_id": image_id, "category_id": cat,
            "bbox": list(map(float, box)), "score": score}


def test_two_process_merge_union():
    gt = _gt()
    # process 0 sees image 1's detections, process 1 sees image 2's
    ev0 = CocoEvaluator(gt)
    ev0.update([_det(1, 1, 0.9)])
    ev1 = CocoEvaluator(gt)
    ev1.update([_det(2, 2, 0.8, (40, 40, 20, 20))])

    gathered = np.stack([pack_detections(ev0, max_dets=16),
                         pack_detections(ev1, max_dets=16)])
    unpack_detections(ev0, gathered)
    unpack_detections(ev1, gathered)

    # both processes now hold the union and agree on the summary
    direct = CocoEvaluator(gt)
    direct.update([_det(1, 1, 0.9), _det(2, 2, 0.8, (40, 40, 20, 20))])
    s_direct = direct.summarize()
    for ev in (ev0, ev1):
        s = ev.summarize()
        for k, v in s_direct.items():
            np.testing.assert_allclose(s[k], v, atol=1e-9, err_msg=k)
    assert s_direct["AP50"] == 1.0


def test_pack_truncation_logs_and_keeps_cap(capsys):
    ev = CocoEvaluator(_gt())
    ev.update([_det(1, 1, 0.5 + 0.001 * i) for i in range(10)])
    plane = pack_detections(ev, max_dets=4)
    assert (plane[:, 0] > 0.5).sum() == 4
    assert "truncating" in capsys.readouterr().out


def test_pack_roundtrip_preserves_fields():
    ev = CocoEvaluator(_gt())
    ev.update([_det(1, 2, 0.73, (1.5, 2.5, 3.5, 4.5))])
    plane = pack_detections(ev, max_dets=8)[None]
    ev2 = CocoEvaluator(_gt())
    unpack_detections(ev2, plane)
    (key, ds), = [(k, v) for k, v in ev2._dt.items() if v]
    assert key == (1, 2)
    np.testing.assert_allclose(ds[0]["bbox"], [1.5, 2.5, 3.5, 4.5])
    np.testing.assert_allclose(ds[0]["score"], 0.73, atol=1e-6)
