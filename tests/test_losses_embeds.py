import math

import jax.numpy as jnp
import numpy as np

from spe_tpu.ops import embeds as E
from spe_tpu.ops import losses as L


def _np_sineembed(pos, d_model):
    """Numpy oracle for reference transformer.py:35-49."""
    n_steps = d_model // 2
    dim_t = np.arange(n_steps, dtype=np.float32)
    dim_t = 10000.0 ** (2 * (dim_t // 2) / 128.0)
    x = pos[..., 0] * 2 * math.pi
    y = pos[..., 1] * 2 * math.pi
    px = x[..., None] / dim_t
    py = y[..., None] / dim_t

    def inter(p):
        return np.stack([np.sin(p[..., 0::2]), np.cos(p[..., 1::2])], -1).reshape(*p.shape[:-1], -1)

    return np.concatenate([inter(py), inter(px)], -1)


def test_sineembed_matches_reference_formula(rng):
    pos = rng.uniform(0, 1, (4, 6, 2)).astype(np.float32)
    out = np.asarray(E.gen_sineembed_for_position(jnp.array(pos), 192))
    ref = _np_sineembed(pos, 192)
    assert out.shape == (4, 6, 192)
    np.testing.assert_allclose(out, ref, atol=1e-5)


def test_position_embedding_sine_shape_and_norm():
    mask = np.zeros((2, 4, 6), bool)
    mask[1, :, 4:] = True  # second image padded on the right
    out = np.asarray(E.position_embedding_sine(jnp.array(mask), num_pos_feats=96))
    assert out.shape == (2, 4, 6, 192)
    assert np.isfinite(out).all()
    # embeddings of valid region should not depend on padding presence
    full = np.asarray(E.position_embedding_sine(jnp.zeros((1, 4, 4), bool), num_pos_feats=96))
    part = np.asarray(E.position_embedding_sine(
        jnp.array(np.pad(np.zeros((1, 4, 4), bool), ((0, 0), (0, 0), (0, 2)), constant_values=True)),
        num_pos_feats=96))
    np.testing.assert_allclose(part[:, :, :4], full, atol=1e-5)


def test_inverse_sigmoid_roundtrip(rng):
    x = rng.uniform(0.01, 0.99, (20,)).astype(np.float32)
    y = np.asarray(E.inverse_sigmoid(jnp.array(x)))
    np.testing.assert_allclose(1 / (1 + np.exp(-y)), x, atol=1e-5)


def test_bce_matches_numpy(rng):
    logits = rng.normal(size=(3, 5)).astype(np.float32)
    labels = (rng.uniform(size=(3, 5)) > 0.5).astype(np.float32)
    got = float(L.image_label_bce(jnp.array(logits), jnp.array(labels)))
    p = 1 / (1 + np.exp(-logits))
    ref = -(labels * np.log(p) + (1 - labels) * np.log(1 - p)).mean()
    np.testing.assert_allclose(got, ref, atol=1e-5)


def test_focal_loss_reduction_semantics(rng):
    """Check mean(Q).sum()/num_boxes reduction and alpha/gamma weighting."""
    B, Q, C = 2, 4, 3
    logits = rng.normal(size=(B, Q, C)).astype(np.float32)
    targets = (rng.uniform(size=(B, Q, C)) > 0.8).astype(np.float32)
    weights = np.ones((B, Q, C), np.float32)
    num_boxes = 5.0
    got = float(L.weighted_sigmoid_focal_loss(
        jnp.array(logits), jnp.array(targets), num_boxes, jnp.array(weights),
        alpha=0.25, gamma=2.0))

    p = 1 / (1 + np.exp(-logits))
    ce = -(targets * np.log(p) + (1 - targets) * np.log(1 - p))
    p_t = np.clip(p * targets + (1 - p) * (1 - targets), 1e-5, 1 - 1e-5)
    loss = ce * (1 - p_t) ** 2.0
    alpha_t = 0.25 * targets + 0.75 * (1 - targets)
    ref = (alpha_t * loss).mean(axis=1).sum() / num_boxes
    np.testing.assert_allclose(got, ref, rtol=1e-4)


def test_masked_box_losses(rng):
    from spe_tpu.ops.boxes import box_cxcywh_to_xyxy

    n = 6
    src = rng.uniform(0.2, 0.6, (n, 4)).astype(np.float32)
    tgt = rng.uniform(0.2, 0.6, (n, 4)).astype(np.float32)
    mask = np.array([1, 1, 1, 0, 0, 0], np.float32)
    l1 = float(L.masked_l1_loss(jnp.array(src), jnp.array(tgt), jnp.array(mask), 3.0))
    ref = np.abs(src[:3] - tgt[:3]).sum() / 3.0
    np.testing.assert_allclose(l1, ref, rtol=1e-5)

    giou = float(L.masked_giou_loss(
        box_cxcywh_to_xyxy(jnp.array(src)), box_cxcywh_to_xyxy(jnp.array(tgt)),
        jnp.array(mask), 3.0))
    assert np.isfinite(giou)
