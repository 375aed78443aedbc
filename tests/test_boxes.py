import jax.numpy as jnp
import numpy as np

from spe_tpu.ops import boxes as B


def _np_giou(b1, b2):
    """Numpy oracle implementing the formulas of reference util/box_ops.py."""
    area1 = (b1[:, 2] - b1[:, 0]) * (b1[:, 3] - b1[:, 1])
    area2 = (b2[:, 2] - b2[:, 0]) * (b2[:, 3] - b2[:, 1])
    lt = np.maximum(b1[:, None, :2], b2[None, :, :2])
    rb = np.minimum(b1[:, None, 2:], b2[None, :, 2:])
    wh = np.clip(rb - lt, 0, None)
    inter = wh[..., 0] * wh[..., 1]
    union = area1[:, None] + area2[None, :] - inter
    iou = inter / union
    lt2 = np.minimum(b1[:, None, :2], b2[None, :, :2])
    rb2 = np.maximum(b1[:, None, 2:], b2[None, :, 2:])
    wh2 = np.clip(rb2 - lt2, 0, None)
    area = wh2[..., 0] * wh2[..., 1]
    return iou - (area - union) / area, iou


def random_boxes(rng, n):
    cxcywh = np.stack([
        rng.uniform(0.2, 0.8, n),
        rng.uniform(0.2, 0.8, n),
        rng.uniform(0.05, 0.4, n),
        rng.uniform(0.05, 0.4, n),
    ], axis=-1).astype(np.float32)
    return cxcywh


def test_cxcywh_roundtrip(rng):
    b = random_boxes(rng, 17)
    out = np.asarray(B.box_xyxy_to_cxcywh(B.box_cxcywh_to_xyxy(jnp.array(b))))
    np.testing.assert_allclose(out, b, atol=1e-6)


def test_iou_giou_match_numpy_oracle(rng):
    b1 = np.asarray(B.box_cxcywh_to_xyxy(jnp.array(random_boxes(rng, 13))))
    b2 = np.asarray(B.box_cxcywh_to_xyxy(jnp.array(random_boxes(rng, 7))))
    giou_ref, iou_ref = _np_giou(b1, b2)
    iou, _ = B.box_iou_pairwise(jnp.array(b1), jnp.array(b2))
    giou = B.generalized_box_iou_pairwise(jnp.array(b1), jnp.array(b2))
    np.testing.assert_allclose(np.asarray(iou), iou_ref, atol=1e-5)
    np.testing.assert_allclose(np.asarray(giou), giou_ref, atol=1e-5)


def test_aligned_matches_pairwise_diag(rng):
    b1 = np.asarray(B.box_cxcywh_to_xyxy(jnp.array(random_boxes(rng, 9))))
    b2 = np.asarray(B.box_cxcywh_to_xyxy(jnp.array(random_boxes(rng, 9))))
    diag = np.diag(np.asarray(B.generalized_box_iou_pairwise(jnp.array(b1), jnp.array(b2))))
    aligned = np.asarray(B.generalized_box_iou_aligned(jnp.array(b1), jnp.array(b2)))
    np.testing.assert_allclose(aligned, diag, atol=1e-5)


def test_degenerate_boxes_are_finite():
    z = jnp.zeros((3, 4))
    giou = B.generalized_box_iou_pairwise(z, z)
    assert np.isfinite(np.asarray(giou)).all()


def test_masks_to_boxes():
    m = np.zeros((2, 8, 8), bool)
    m[0, 2:5, 3:7] = True  # y 2..4, x 3..6
    out = np.asarray(B.masks_to_boxes(jnp.array(m)))
    np.testing.assert_allclose(out[0], [3, 2, 6, 4])
    np.testing.assert_allclose(out[1], [0, 0, 0, 0])
