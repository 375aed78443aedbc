import jax
import jax.numpy as jnp
import numpy as np
import pytest

from spe_tpu.models.cait import CaiTConfig
from spe_tpu.models.detector import SPEDetector
from spe_tpu.models.segmentation import (MHAttentionMap, SegmentationHead,
                                         postprocess_segm)
from spe_tpu.ops.losses import dice_loss, sigmoid_focal_loss_masks

TINY = CaiTConfig(img_size=64, patch_size=16, embed_dim=32, depth=4, num_heads=2,
                  num_classes=5, layer_to_det=3, depth_token_only=2)


def test_mh_attention_map_softmax(rng):
    m = MHAttentionMap(hidden_dim=32, num_heads=4)
    q = jnp.array(rng.normal(size=(2, 6, 32)).astype(np.float32))
    feat = jnp.array(rng.normal(size=(2, 4, 4, 32)).astype(np.float32))
    params = m.init(jax.random.PRNGKey(0), q, feat)
    attn = m.apply(params, q, feat)
    assert attn.shape == (2, 6, 4, 4, 4)
    np.testing.assert_allclose(np.asarray(attn).reshape(2, 6, 4, -1).sum(-1),
                               1.0, rtol=1e-4)


def test_segmentation_head_shapes(rng):
    m = SegmentationHead(hidden_dim=32, num_heads=4)
    hs = jnp.array(rng.normal(size=(2, 6, 32)).astype(np.float32))
    feat = jnp.array(rng.normal(size=(2, 4, 4, 32)).astype(np.float32))
    params = m.init(jax.random.PRNGKey(0), hs, feat)
    masks = m.apply(params, hs, feat)
    assert masks.shape == (2, 6, 16, 16)  # 2 upsamples
    assert np.isfinite(np.asarray(masks)).all()


@pytest.mark.slow
def test_detector_with_masks_flag(rng):
    det = SPEDetector(backbone_cfg=TINY, num_det_classes=6, num_queries=5,
                      num_refines=1, enc_layers=1, dec_layers=2,
                      dim_feedforward=64, nheads=2, masks=True)
    x = jnp.array(rng.normal(size=(1, 64, 64, 3)).astype(np.float32))
    params = det.init(jax.random.PRNGKey(0), x)
    out = det.apply(params, x)
    assert "pred_masks" in out
    assert out["pred_masks"].shape == (1, 5, 16, 16)


def test_postprocess_segm(rng):
    logits = jnp.array(rng.normal(size=(1, 5, 8, 8)).astype(np.float32))
    keep = jnp.array([[0, 2]], jnp.int32)
    masks = postprocess_segm(logits, keep, (32, 32))
    assert masks.shape == (1, 2, 32, 32)
    assert masks.dtype == bool


def test_mask_losses(rng):
    logits = jnp.array(rng.normal(size=(4, 64)).astype(np.float32))
    targets = jnp.array((rng.uniform(size=(4, 64)) > 0.5).astype(np.float32))
    d = float(dice_loss(logits, targets, 4.0))
    f = float(sigmoid_focal_loss_masks(logits, targets, 4.0))
    assert np.isfinite(d) and np.isfinite(f)
    # perfect prediction -> near-zero losses
    perfect = jnp.where(targets > 0, 20.0, -20.0)
    assert float(dice_loss(perfect, targets, 4.0)) < 1e-3
    assert float(sigmoid_focal_loss_masks(perfect, targets, 4.0)) < 1e-3
