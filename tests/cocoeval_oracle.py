"""Test-only COCOeval oracle: a literal, loop-by-loop transcription of the
pycocotools bbox protocol (cocoeval.py evaluateImg/accumulate/summarize) —
pycocotools itself is not installable here (zero egress), so this second,
structurally independent implementation is the strongest available A/B
check for the production evaluator (spe_tpu/data/coco_eval.py).

Deliberate structural differences from the production code (so shared
mistakes are unlikely):
  * one evaluateImg pass at the LARGEST maxDet, then column slicing per
    maxDets entry in accumulate (pycocotools' actual control flow; the
    production code re-evaluates per max_det — equivalent because greedy
    matching of the top-m detections never depends on later detections);
  * match bookkeeping via annotation ids (gtm/dtm store ids, 0 = unmatched)
    exactly like cocoeval.py, not indices;
  * explicit python loops for the precision envelope and searchsorted fill.
"""

from __future__ import annotations

import numpy as np

IOU_THRS = np.linspace(0.5, 0.95, 10)
REC_THRS = np.linspace(0.0, 1.0, 101)
AREA_RNGS = [(0.0, 1e10), (0.0, 32.0**2), (32.0**2, 96.0**2), (96.0**2, 1e10)]
MAX_DETS = [1, 10, 100]


def _iou(d, g, iscrowd):
    # cocoeval maskUtils.iou for bboxes: crowd -> union = det area
    out = np.zeros((len(d), len(g)))
    for i, db in enumerate(d):
        dx0, dy0, dw, dh = db
        for j, gb in enumerate(g):
            gx0, gy0, gw, gh = gb
            iw = min(dx0 + dw, gx0 + gw) - max(dx0, gx0)
            ih = min(dy0 + dh, gy0 + gh) - max(dy0, gy0)
            if iw <= 0 or ih <= 0:
                continue
            inter = iw * ih
            union = dw * dh if iscrowd[j] else dw * dh + gw * gh - inter
            out[i, j] = inter / union
    return out


def _evaluate_img(gts, dts, area_rng, max_det):
    """gts/dts: lists of dicts with id/bbox/area/iscrowd/score."""
    if len(gts) == 0 and len(dts) == 0:
        return None
    for g in gts:
        g["_ignore"] = 1 if (g.get("iscrowd", 0) or g["area"] < area_rng[0]
                             or g["area"] > area_rng[1]) else 0
    gtind = np.argsort([g["_ignore"] for g in gts], kind="mergesort")
    gt = [gts[i] for i in gtind]
    dtind = np.argsort([-d["score"] for d in dts], kind="mergesort")
    dt = [dts[i] for i in dtind[:max_det]]
    iscrowd = [int(g.get("iscrowd", 0)) for g in gt]
    ious = _iou([d["bbox"] for d in dt], [g["bbox"] for g in gt], iscrowd)

    T, G, D = len(IOU_THRS), len(gt), len(dt)
    gtm = np.zeros((T, G))
    dtm = np.zeros((T, D))
    gt_ig = np.array([g["_ignore"] for g in gt])
    dt_ig = np.zeros((T, D))
    for tind, t in enumerate(IOU_THRS):
        for dind, d in enumerate(dt):
            iou = min(t, 1 - 1e-10)
            m = -1
            for gind, g in enumerate(gt):
                if gtm[tind, gind] > 0 and not iscrowd[gind]:
                    continue
                if m > -1 and gt_ig[m] == 0 and gt_ig[gind] == 1:
                    break
                if ious[dind, gind] < iou:
                    continue
                iou = ious[dind, gind]
                m = gind
            if m == -1:
                continue
            dt_ig[tind, dind] = gt_ig[m]
            dtm[tind, dind] = gt[m]["id"]
            gtm[tind, m] = d["id"]
    a = np.array([d["area"] < area_rng[0] or d["area"] > area_rng[1]
                  for d in dt]).reshape(1, -1)
    dt_ig = np.logical_or(dt_ig, np.logical_and(dtm == 0, np.repeat(a, T, 0)))
    return {
        "dtMatches": dtm,
        "dtScores": np.array([d["score"] for d in dt]),
        "gtIgnore": gt_ig,
        "dtIgnore": dt_ig,
    }


class OracleCocoEval:
    def __init__(self, gt_dict):
        self.cat_ids = sorted(c["id"] for c in gt_dict["categories"])
        self.img_ids = sorted(im["id"] for im in gt_dict["images"])
        self._gts = {(i, c): [] for i in self.img_ids for c in self.cat_ids}
        for a in gt_dict["annotations"]:
            a = dict(a)
            a.setdefault("area", a["bbox"][2] * a["bbox"][3])
            self._gts[(a["image_id"], a["category_id"])].append(a)
        self._dts = {k: [] for k in self._gts}
        self._next_dt_id = 1

    def add_detections(self, dets):
        for d in dets:
            d = dict(d)
            d["id"] = self._next_dt_id
            self._next_dt_id += 1
            d.setdefault("area", d["bbox"][2] * d["bbox"][3])
            key = (d["image_id"], d["category_id"])
            if key in self._dts:
                self._dts[key].append(d)

    def run(self):
        T, R = len(IOU_THRS), len(REC_THRS)
        K, A, M = len(self.cat_ids), len(AREA_RNGS), len(MAX_DETS)
        precision = -np.ones((T, R, K, A, M))
        recall = -np.ones((T, K, A, M))
        max_det_top = MAX_DETS[-1]
        for k, cat in enumerate(self.cat_ids):
            for a, rng in enumerate(AREA_RNGS):
                E = [_evaluate_img(self._gts[(i, cat)], self._dts[(i, cat)],
                                   rng, max_det_top) for i in self.img_ids]
                E = [e for e in E if e is not None]
                if not E:
                    continue
                for m, md in enumerate(MAX_DETS):
                    dt_scores = np.concatenate(
                        [e["dtScores"][:md] for e in E])
                    inds = np.argsort(-dt_scores, kind="mergesort")
                    dtm = np.concatenate(
                        [e["dtMatches"][:, :md] for e in E], axis=1)[:, inds]
                    dt_ig = np.concatenate(
                        [e["dtIgnore"][:, :md] for e in E], axis=1)[:, inds]
                    gt_ig = np.concatenate([e["gtIgnore"] for e in E])
                    npig = int(np.count_nonzero(gt_ig == 0))
                    if npig == 0:
                        continue
                    tps = np.logical_and(dtm, np.logical_not(dt_ig))
                    fps = np.logical_and(np.logical_not(dtm),
                                         np.logical_not(dt_ig))
                    tp_sum = np.cumsum(tps, axis=1).astype(float)
                    fp_sum = np.cumsum(fps, axis=1).astype(float)
                    for t in range(T):
                        tp = tp_sum[t]
                        fp = fp_sum[t]
                        nd = len(tp)
                        rc = tp / npig
                        pr = tp / (fp + tp + np.spacing(1))
                        q = np.zeros(R)
                        recall[t, k, a, m] = rc[-1] if nd else 0
                        pr = pr.tolist()
                        for i in range(nd - 1, 0, -1):
                            if pr[i] > pr[i - 1]:
                                pr[i - 1] = pr[i]
                        inds_r = np.searchsorted(rc, REC_THRS, side="left")
                        try:
                            for ri, pi in enumerate(inds_r):
                                q[ri] = pr[pi]
                        except IndexError:
                            pass
                        precision[t, :, k, a, m] = q
        self.precision = precision
        self.recall = recall
        return self

    def stats(self):
        def ap(t=None, a=0, m=2):
            s = self.precision[:, :, :, a, m]
            if t is not None:
                s = s[t:t + 1]
            s = s[s > -1]
            return float(np.mean(s)) if s.size else -1.0

        def ar(a=0, m=2):
            s = self.recall[:, :, a, m]
            s = s[s > -1]
            return float(np.mean(s)) if s.size else -1.0

        return {
            "AP": ap(), "AP50": ap(t=0), "AP75": ap(t=5),
            "APs": ap(a=1), "APm": ap(a=2), "APl": ap(a=3),
            "AR1": ar(m=0), "AR10": ar(m=1), "AR100": ar(m=2),
            "ARs": ar(a=1), "ARm": ar(a=2), "ARl": ar(a=3),
        }
