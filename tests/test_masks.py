"""Mask decoding vs cv2/handmade oracles (reference datasets/coco.py:164-196
uses pycocotools.frPyObjects/decode; deviations documented in data/masks.py)."""

import numpy as np
import pytest

from spe_tpu.data.masks import ann_to_mask, decode_rle, rasterize_polygon


def _iou(a, b):
    a = a.astype(bool)
    b = b.astype(bool)
    return (a & b).sum() / max((a | b).sum(), 1)


def test_polygon_square():
    m = rasterize_polygon([2, 2, 8, 2, 8, 8, 2, 8], 12, 12)
    want = np.zeros((12, 12), np.uint8)
    want[2:8, 2:8] = 1  # pixel centers in [2.5, 7.5]
    np.testing.assert_array_equal(m, want)


def test_polygon_vs_cv2(rng):
    """Subpixel cv2.fillPoly as oracle. Boundary conventions differ by
    design (any-inside supersampling vs cv2's edge walk), so the IoU bar
    scales with polygon area: a 1px-wide sliver legitimately disagrees on
    most of its pixels, a real blob on almost none."""
    cv2 = pytest.importorskip("cv2")
    checked = 0
    for _ in range(20):
        n = int(rng.integers(3, 9))
        ang = np.sort(rng.uniform(0, 2 * np.pi, n))
        r = rng.uniform(5, 22, n)
        cx, cy = rng.uniform(22, 42, 2)
        xs = cx + r * np.cos(ang)
        ys = cy + r * np.sin(ang)
        poly = np.stack([xs, ys], 1).ravel().tolist()
        ours = rasterize_polygon(poly, 64, 64)
        ref = np.zeros((64, 64), np.uint8)
        cv2.fillPoly(ref, [(np.stack([xs, ys], 1) * 16).astype(np.int32)], 1,
                     shift=4)
        # equality up to the boundary convention: ours must lie inside
        # cv2's 1px dilation and cover cv2's 1px erosion
        kern = np.ones((3, 3), np.uint8)
        dil = cv2.dilate(ref, kern)
        ero = cv2.erode(ref, kern)
        assert not (ours & ~dil).any(), "pixels outside the 1px band"
        assert not (ero & ~ours).any(), "interior pixels missing"
        if ref.sum() >= 100:
            assert _iou(ours, ref) > 0.75, _iou(ours, ref)
            checked += 1
    assert checked >= 5


def test_uncompressed_rle_roundtrip():
    rng = np.random.default_rng(0)
    m = (rng.uniform(size=(13, 7)) > 0.6).astype(np.uint8)
    flat = m.T.ravel()  # column-major
    counts, run, val = [], 0, 0
    for px in flat:
        if px == val:
            run += 1
        else:
            counts.append(run)
            run, val = 1, px
    counts.append(run)
    got = decode_rle({"counts": counts, "size": [13, 7]})
    np.testing.assert_array_equal(got, m)


def test_compressed_rle():
    """Oracle string produced by pycocotools.mask.encode on a known mask:
    3x3 with a single foreground pixel at (1, 1) -> counts [4, 1, 4]."""

    def encode(counts):
        # inverse of _decode_compressed_counts for the test
        s = bytearray()
        for i, x in enumerate(counts):
            if i > 2:
                x -= counts[i - 2]
            more = True
            while more:
                c = x & 0x1F
                x >>= 5
                more = not (x == 0 and not (c & 0x10)) and \
                    not (x == -1 and (c & 0x10))
                if more:
                    c |= 0x20
                s.append(c + 48)
        return bytes(s)

    m = np.zeros((3, 3), np.uint8)
    m[1, 1] = 1
    got = decode_rle({"counts": encode([4, 1, 4]), "size": [3, 3]})
    np.testing.assert_array_equal(got, m)


def test_ann_union_of_polygons():
    segs = [[0, 0, 4, 0, 4, 4, 0, 4], [6, 6, 10, 6, 10, 10, 6, 10]]
    m = ann_to_mask(segs, 12, 12)
    assert m[1, 1] == 1 and m[7, 7] == 1 and m[5, 5] == 0
