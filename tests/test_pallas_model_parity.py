"""use_pallas=True end-to-end: the full SPEDetector with ALL fused
attention flavors (talking-heads backbone, class-attention + CAM output,
encoder self-attention, conditional cross-attention) must match the einsum
model on the same params, deterministic path. Interpret mode on CPU."""

import jax
import jax.numpy as jnp
import numpy as np

from spe_tpu.models.cait import CaiTConfig
from spe_tpu.models.detector import SPEDetector
import pytest


def _build(use_pallas):
    bb = CaiTConfig(img_size=64, patch_size=16, embed_dim=32, depth=3,
                    num_heads=2, num_classes=4, layer_to_det=2,
                    depth_token_only=2, use_pallas=use_pallas)
    return SPEDetector(backbone_cfg=bb, num_det_classes=5, num_queries=12,
                       num_refines=1, enc_layers=2, dec_layers=2,
                       dim_feedforward=64, nheads=2, dropout=0.1,
                       use_pallas=use_pallas)


def test_detector_pallas_matches_einsum(rng):
    m0 = _build(False)
    m1 = _build(True)
    x = jnp.asarray(rng.normal(size=(2, 64, 64, 3)).astype(np.float32))
    pad = jnp.zeros((2, 64, 64), bool).at[1, :, 48:].set(True)
    params = m0.init(jax.random.PRNGKey(0), x)
    o0 = m0.apply(params, x, pad_mask=pad, deterministic=True)
    o1 = m1.apply(params, x, pad_mask=pad, deterministic=True)
    for r in (0, 1):
        np.testing.assert_allclose(np.asarray(o1["stages"][r]["pred_logits"]),
                                   np.asarray(o0["stages"][r]["pred_logits"]),
                                   atol=2e-4)
        np.testing.assert_allclose(np.asarray(o1["stages"][r]["pred_boxes"]),
                                   np.asarray(o0["stages"][r]["pred_boxes"]),
                                   atol=2e-5)
    np.testing.assert_allclose(np.asarray(o1["backbone"]["cams_cls"]),
                               np.asarray(o0["backbone"]["cams_cls"]), atol=1e-5)
    np.testing.assert_allclose(np.asarray(o1["backbone"]["x_logits"]),
                               np.asarray(o0["backbone"]["x_logits"]), atol=1e-4)


@pytest.mark.slow
def test_detector_pallas_grads_match(rng):
    m0 = _build(False)
    m1 = _build(True)
    x = jnp.asarray(rng.normal(size=(1, 64, 64, 3)).astype(np.float32))
    params = m0.init(jax.random.PRNGKey(0), x)

    def loss(model):
        def f(p):
            o = model.apply(p, x, deterministic=True)
            return (o["stages"][0]["pred_logits"].astype(jnp.float32) ** 2).mean() \
                + (o["backbone"]["x_logits"] ** 2).mean()
        return f

    g0 = jax.grad(loss(m0))(params)
    g1 = jax.grad(loss(m1))(params)
    l0 = jax.tree_util.tree_leaves(g0)
    l1 = jax.tree_util.tree_leaves(g1)
    for a, b in zip(l0, l1):
        a, b = np.asarray(a), np.asarray(b)
        # per-leaf scale-normalized: near-zero leaves (k-proj bias grads are
        # softmax-invariant, i.e. pure float noise) compare at atol only
        scale = np.abs(a).max()
        assert np.abs(a - b).max() <= 1e-5 * scale + 1e-6, np.abs(a - b).max()
