import jax
import jax.numpy as jnp
import numpy as np
import pytest

from spe_tpu.models.cait import CaiTConfig, CaiTTwoBranch, std_reweighting
from spe_tpu.models.detector import SPEDetector
from spe_tpu.models.transformer import ConditionalTransformer


TINY = CaiTConfig(img_size=64, patch_size=16, embed_dim=32, depth=4, num_heads=2,
                  num_classes=5, layer_to_det=3, depth_token_only=2)


def test_std_reweighting_matches_torch_formula(rng):
    cam = rng.normal(size=(2, 4, 5, 16)).astype(np.float32)
    got = np.asarray(std_reweighting(jnp.array(cam)))
    std = cam.std(axis=-1, keepdims=True, ddof=1)
    std = std - std.min(axis=1, keepdims=True)
    std = std / std.max(axis=1, keepdims=True)
    ref = (cam * std).sum(axis=1)
    np.testing.assert_allclose(got, ref, rtol=1e-4, atol=1e-5)


def test_cait_two_branch_shapes(rng):
    model = CaiTTwoBranch(TINY)
    x = jnp.array(rng.normal(size=(2, 64, 64, 3)).astype(np.float32))
    params = model.init(jax.random.PRNGKey(0), x)
    out = model.apply(params, x)
    assert out["x_logits"].shape == (2, 5)
    assert out["x_cls_logits"].shape == (2, 5)
    assert out["cams_cls"].shape == (2, 5, 4, 4)
    assert out["x_patch"].shape == (2, 4, 4, 32)
    for v in jax.tree_util.tree_leaves(out):
        assert np.isfinite(np.asarray(v)).all()


def test_cait_variable_input_size(rng):
    """Per-forward pos-embed interpolation handles non-training sizes
    (reference InterpolateInitPosEmbed, cait.py:744-759)."""
    model = CaiTTwoBranch(TINY)
    x64 = jnp.array(rng.normal(size=(1, 64, 64, 3)).astype(np.float32))
    params = model.init(jax.random.PRNGKey(0), x64)
    x96 = jnp.array(rng.normal(size=(1, 96, 64, 3)).astype(np.float32))
    out = model.apply(params, x96)
    assert out["cams_cls"].shape == (1, 5, 6, 4)
    assert out["x_patch"].shape == (1, 6, 4, 32)


def test_cait_det_branch_forks_from_layer_to_det(rng):
    """Zeroing a post-fork classification block must not change x_patch
    (det branch), but must change x_logits (cls branch)."""
    model = CaiTTwoBranch(TINY)
    x = jnp.array(rng.normal(size=(1, 64, 64, 3)).astype(np.float32))
    params = model.init(jax.random.PRNGKey(0), x)
    out0 = model.apply(params, x)

    # layer_to_det=3, depth=4 -> fork after block index 2; block 3 is
    # cls-only; blocks_det_0 is det-only
    p = jax.tree_util.tree_map(lambda a: a, params)
    import flax

    flat = flax.traverse_util.flatten_dict(p["params"])
    # perturb (zeroing a residual block just makes it identity)
    mutated = {k: (v + 0.5 if k[0] == "blocks_3" else v) for k, v in flat.items()}
    p2 = {"params": flax.traverse_util.unflatten_dict(mutated)}
    out1 = model.apply(p2, x)
    np.testing.assert_allclose(np.asarray(out1["x_patch"]), np.asarray(out0["x_patch"]),
                               atol=1e-5)
    assert not np.allclose(np.asarray(out1["x_logits"]), np.asarray(out0["x_logits"]))

    mutated = {k: (v + 0.5 if k[0] == "blocks_det_0" else v) for k, v in flat.items()}
    p3 = {"params": flax.traverse_util.unflatten_dict(mutated)}
    out2 = model.apply(p3, x)
    assert not np.allclose(np.asarray(out2["x_patch"]), np.asarray(out0["x_patch"]))
    np.testing.assert_allclose(np.asarray(out2["x_logits"]), np.asarray(out0["x_logits"]),
                               atol=1e-5)


def test_cam_is_softmax_attention_slice(rng):
    """CAMs derive from a softmax attention: nonneg before reweighting is
    not guaranteed after std-sum, but shape/finiteness and label coverage
    hold; also each CAM row should respond to its own class token."""
    model = CaiTTwoBranch(TINY)
    x = jnp.array(rng.normal(size=(1, 64, 64, 3)).astype(np.float32))
    params = model.init(jax.random.PRNGKey(1), x)
    out = model.apply(params, x)
    cam = np.asarray(out["cams_cls"])
    assert np.isfinite(cam).all()
    assert cam.shape == (1, 5, 4, 4)


def test_conditional_transformer_shapes(rng):
    d = 32
    model = ConditionalTransformer(d_model=d, num_heads=4, num_queries=7,
                                   num_encoder_layers=2, num_decoder_layers=3,
                                   dim_feedforward=64, num_refines=1)
    src = jnp.array(rng.normal(size=(2, 16, d)).astype(np.float32))
    pos = jnp.array(rng.normal(size=(2, 16, d)).astype(np.float32))
    params = model.init(jax.random.PRNGKey(0), src, pos)
    hs_all, ref_all = model.apply(params, src, pos)
    assert len(hs_all) == 2 and len(ref_all) == 2
    assert hs_all[0].shape == (3, 2, 7, d)
    assert ref_all[0].shape == (2, 7, 2)
    assert (np.asarray(ref_all[0]) > 0).all() and (np.asarray(ref_all[0]) < 1).all()
    # refine pass shares the decoder but uses its own query embedding
    assert not np.allclose(np.asarray(hs_all[0]), np.asarray(hs_all[1]))


def test_encoder_padding_mask_blocks_keys(rng):
    """Changing content under padded keys must not change the output."""
    d = 32
    model = ConditionalTransformer(d_model=d, num_heads=4, num_queries=5,
                                   num_encoder_layers=1, num_decoder_layers=1,
                                   dim_feedforward=64, num_refines=0)
    src = rng.normal(size=(1, 16, d)).astype(np.float32)
    pos = jnp.array(rng.normal(size=(1, 16, d)).astype(np.float32))
    mask = np.zeros((1, 16), bool)
    mask[0, 10:] = True
    params = model.init(jax.random.PRNGKey(0), jnp.array(src), pos)
    hs1, _ = model.apply(params, jnp.array(src), pos, key_padding_mask=jnp.array(mask))
    src2 = src.copy()
    src2[0, 10:] = rng.normal(size=(6, d))
    hs2, _ = model.apply(params, jnp.array(src2), pos, key_padding_mask=jnp.array(mask))
    # padded positions themselves change, but queries attend only to valid keys
    np.testing.assert_allclose(np.asarray(hs1[0][-1]), np.asarray(hs2[0][-1]), atol=1e-4)


def test_detector_end_to_end_shapes(rng):
    det = SPEDetector(backbone_cfg=TINY, num_det_classes=6, num_queries=9,
                      num_refines=1, enc_layers=1, dec_layers=2,
                      dim_feedforward=64, nheads=2)
    x = jnp.array(rng.normal(size=(2, 64, 64, 3)).astype(np.float32))
    params = det.init(jax.random.PRNGKey(0), x)
    out = det.apply(params, x)
    for r in (0, 1):
        st = out["stages"][r]
        assert st["pred_logits"].shape == (2, 9, 6)
        assert st["pred_boxes"].shape == (2, 9, 4)
        assert st["aux_pred_logits"].shape == (1, 2, 9, 6)
        b = np.asarray(st["pred_boxes"])
        assert (b >= 0).all() and (b <= 1).all()
    assert out["backbone"]["cams_cls"].shape == (2, 5, 4, 4)
    # focal-prior bias: with zero-ish features, mean sigmoid(logit) ~ 0.01
    probs = 1 / (1 + np.exp(-np.asarray(out["stages"][0]["pred_logits"])))
    assert probs.mean() < 0.1


@pytest.mark.slow
def test_detector_dropout_rngs(rng):
    cfg = CaiTConfig(img_size=64, patch_size=16, embed_dim=32, depth=4, num_heads=2,
                     num_classes=5, layer_to_det=3, depth_token_only=2,
                     drop_rate=0.1, drop_path_rate=0.1, attn_drop_rate=0.1)
    det = SPEDetector(backbone_cfg=cfg, num_det_classes=6, num_queries=9,
                      num_refines=1, enc_layers=1, dec_layers=2,
                      dim_feedforward=64, nheads=2, dropout=0.1)
    x = jnp.array(rng.normal(size=(1, 64, 64, 3)).astype(np.float32))
    params = det.init(jax.random.PRNGKey(0), x)
    o1 = det.apply(params, x, deterministic=False, rngs={"dropout": jax.random.PRNGKey(1)})
    o2 = det.apply(params, x, deterministic=False, rngs={"dropout": jax.random.PRNGKey(2)})
    assert not np.allclose(np.asarray(o1["stages"][0]["pred_logits"]),
                           np.asarray(o2["stages"][0]["pred_logits"]))
    for v in jax.tree_util.tree_leaves(o1):
        assert np.isfinite(np.asarray(v)).all()
