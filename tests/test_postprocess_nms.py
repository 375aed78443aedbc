import jax.numpy as jnp
import numpy as np

from spe_tpu.ops.nms import batched_nms, nms_per_class
from spe_tpu.ops.postprocess import (postprocess_refine, postprocess_refine_multi,
                                     postprocess_topk)


def _np_nms(boxes, scores, thr):
    """torchvision-semantics greedy NMS oracle."""
    order = np.argsort(-scores)
    keep = []
    while order.size:
        i = order[0]
        keep.append(i)
        if order.size == 1:
            break
        rest = order[1:]
        lt = np.maximum(boxes[i, :2], boxes[rest, :2])
        rb = np.minimum(boxes[i, 2:], boxes[rest, 2:])
        wh = np.clip(rb - lt, 0, None)
        inter = wh[:, 0] * wh[:, 1]
        a1 = (boxes[i, 2] - boxes[i, 0]) * (boxes[i, 3] - boxes[i, 1])
        a2 = (boxes[rest, 2] - boxes[rest, 0]) * (boxes[rest, 3] - boxes[rest, 1])
        iou = inter / (a1 + a2 - inter)
        order = rest[iou <= thr]
    return sorted(keep)


def test_nms_matches_oracle_per_class(rng):
    for _ in range(5):
        n = 40
        boxes = rng.uniform(0, 80, (n, 2))
        boxes = np.concatenate([boxes, boxes + rng.uniform(5, 40, (n, 2))], -1).astype(np.float32)
        scores = rng.uniform(size=n).astype(np.float32)
        labels = rng.integers(0, 3, n).astype(np.int32)
        valid = rng.uniform(size=n) > 0.2
        keep = np.asarray(nms_per_class(jnp.array(boxes), jnp.array(scores),
                                        jnp.array(labels), jnp.array(valid), 0.5))
        expected = np.zeros(n, bool)
        for c in range(3):
            sel = np.where((labels == c) & valid)[0]
            if sel.size:
                kept = _np_nms(boxes[sel], scores[sel], 0.5)
                expected[sel[kept]] = True
        np.testing.assert_array_equal(keep, expected)


def test_batched_nms_shape(rng):
    B, N = 3, 16
    boxes = rng.uniform(0, 50, (B, N, 2))
    boxes = np.concatenate([boxes, boxes + 10], -1).astype(np.float32)
    keep = batched_nms(jnp.array(boxes), jnp.array(rng.uniform(size=(B, N)).astype(np.float32)),
                       jnp.zeros((B, N), jnp.int32), jnp.ones((B, N), bool))
    assert keep.shape == (B, N)


def test_postprocess_topk_matches_reference_semantics(rng):
    B, Q, K = 2, 10, 5
    logits = rng.normal(size=(B, Q, K)).astype(np.float32)
    boxes = rng.uniform(0.2, 0.6, (B, Q, 4)).astype(np.float32)
    sizes = np.array([[100, 200], [50, 80]], np.float32)
    out = postprocess_topk(jnp.array(logits), jnp.array(boxes), jnp.array(sizes),
                           keep_queries=7)
    prob = 1 / (1 + np.exp(-logits))
    flat = prob.reshape(B, -1)
    for b in range(B):
        top = np.sort(flat[b])[::-1][:7]
        np.testing.assert_allclose(np.sort(np.asarray(out["scores"][b]))[::-1], top, rtol=1e-5)
        # labels/boxes consistent with the flat index decomposition
        idx = np.argsort(-flat[b])[:7]
        np.testing.assert_array_equal(
            np.sort(np.asarray(out["labels"][b])), np.sort(idx % K))
    # boxes scaled to (w, h) of target size
    assert np.asarray(out["boxes"][0, :, 0]).max() <= 200.0 + 1e-3
    assert np.asarray(out["boxes"][0, :, 1]).max() <= 100.0 + 1e-3


def test_postprocess_refine_per_class_argmax(rng):
    B, Q, K, T = 1, 8, 6, 3
    logits = rng.normal(size=(B, Q, K)).astype(np.float32)
    boxes = rng.uniform(0, 1, (B, Q, 4)).astype(np.float32)
    labels = np.array([[1, 4, 0]], np.int32)
    mask = np.array([[True, True, False]])
    out = postprocess_refine(jnp.array(logits), jnp.array(boxes),
                             jnp.array(labels), jnp.array(mask))
    prob = 1 / (1 + np.exp(-logits))
    for t, c in [(0, 1), (1, 4)]:
        q = prob[0, :, c].argmax()
        np.testing.assert_allclose(np.asarray(out["scores"][0, t]), prob[0, q, c], rtol=1e-5)
        np.testing.assert_allclose(np.asarray(out["boxes"][0, t]), boxes[0, q], rtol=1e-5)
    assert float(out["scores"][0, 2]) == 0.0


def test_postprocess_refine_multi_threshold(rng):
    B, Q, K = 1, 12, 4
    logits = rng.normal(size=(B, Q, K)).astype(np.float32)
    boxes = rng.uniform(0, 1, (B, Q, 4)).astype(np.float32)
    img_label = np.zeros((B, K), np.float32)
    img_label[0, 2] = 1
    out = postprocess_refine_multi(jnp.array(logits), jnp.array(boxes),
                                   jnp.array(img_label), max_keep=16)
    prob = 1 / (1 + np.exp(-logits))
    expected_n = int((prob[0, :, 2] >= 0.5 * prob[0, :, 2].max()).sum())
    assert int(np.asarray(out["mask"][0]).sum()) == expected_n
    assert set(np.asarray(out["labels"][0])[np.asarray(out["mask"][0])]) == {2}


def test_nms_fixpoint_matches_scan_on_chains(rng):
    """The fixpoint NMS must equal the sequential recurrence even on deep
    suppression chains (a ladder of boxes each overlapping the next, where
    greedy keeps every other box)."""
    from spe_tpu.ops.nms import nms_scan_reference

    # ladder: box i = [4i, 0, 4i+10, 10] overlaps i+1 (IoU 6/14 > 0.3)
    n = 32
    xs = 4.0 * np.arange(n)
    boxes = np.stack([xs, np.zeros(n), xs + 10, np.full(n, 10.0)], -1).astype(np.float32)
    scores = np.linspace(1.0, 0.5, n).astype(np.float32)  # descending: chain order
    labels = np.zeros(n, np.int32)
    valid = np.ones(n, bool)
    for thr in (0.3, 0.5):
        kf = np.asarray(nms_per_class(jnp.array(boxes), jnp.array(scores),
                                      jnp.array(labels), jnp.array(valid), thr))
        ks = np.asarray(nms_scan_reference(jnp.array(boxes), jnp.array(scores),
                                           jnp.array(labels), jnp.array(valid), thr))
        np.testing.assert_array_equal(kf, ks)

    # random stress incl. invalid entries and multiple classes
    for _ in range(8):
        n = 64
        b0 = rng.uniform(0, 60, (n, 2))
        boxes = np.concatenate([b0, b0 + rng.uniform(4, 30, (n, 2))], -1).astype(np.float32)
        scores = rng.uniform(size=n).astype(np.float32)
        labels = rng.integers(0, 4, n).astype(np.int32)
        valid = rng.uniform(size=n) > 0.3
        kf = np.asarray(nms_per_class(jnp.array(boxes), jnp.array(scores),
                                      jnp.array(labels), jnp.array(valid), 0.5))
        ks = np.asarray(nms_scan_reference(jnp.array(boxes), jnp.array(scores),
                                           jnp.array(labels), jnp.array(valid), 0.5))
        np.testing.assert_array_equal(kf, ks)
