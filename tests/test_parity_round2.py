"""Round-2 parity items: get_sha, print gating, URL resume, eval-loss
logging arrays, flip-TTA x_logits merge, flag validation, pre-norm encoder,
PostProcessPanoptic, non-finite step skipping."""

import io
import zipfile
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np
import pytest


def test_get_sha_stamps_repo():
    from spe_tpu.utils.misc import get_sha

    s = get_sha()
    assert s.startswith("sha: ")
    assert "branch:" in s


def test_setup_for_distributed_gates_print(capsys):
    from spe_tpu.utils.misc import restore_print, setup_for_distributed

    try:
        setup_for_distributed(False)
        print("hidden")
        print("shown", force=True)
        out = capsys.readouterr().out
        assert "hidden" not in out and "shown" in out
        setup_for_distributed(True)
        print("visible")
        assert "visible" in capsys.readouterr().out
    finally:
        restore_print()


def test_resolve_resume_url_zip(tmp_path):
    from spe_tpu.train.checkpoint import resolve_resume

    src = tmp_path / "ckpt"
    src.mkdir()
    (src / "meta.json").write_text("{}")
    zpath = tmp_path / "checkpoint_51.0.zip"
    with zipfile.ZipFile(zpath, "w") as z:
        z.write(src / "meta.json", "meta.json")
    out = resolve_resume(zpath.as_uri(), cache_dir=tmp_path / "cache")
    assert (Path(out) / "meta.json").exists()
    # local paths pass through untouched
    assert resolve_resume(str(src)) == src


def test_resolve_resume_url_zip_wrapped_root(tmp_path):
    """Archives wrapping the checkpoint in one root dir are unwrapped."""
    from spe_tpu.train.checkpoint import resolve_resume

    zpath = tmp_path / "wrapped.zip"
    with zipfile.ZipFile(zpath, "w") as z:
        z.writestr("checkpoint/meta.json", "{}")
    out = resolve_resume(zpath.as_uri(), cache_dir=tmp_path / "cache")
    assert (Path(out) / "meta.json").exists()


def test_collate_gt_arrays():
    from spe_tpu.data.loader import collate

    img = np.zeros((64, 48, 3), np.float32)
    t = {"image_id": 7, "img_label": np.zeros(5, np.float32),
         "orig_size": np.array([64, 48]), "size": np.array([64, 48]),
         "boxes": np.array([[12.0, 16.0, 36.0, 48.0]], np.float32),
         "labels": np.array([3])}
    b = collate([(img, t)], num_classes=5, fixed_size=64, max_gt=4)
    assert b["gt_boxes"].shape == (1, 4, 4)
    # cxcywh normalized by the (h=64, w=48) image size
    np.testing.assert_allclose(b["gt_boxes"][0, 0], [24 / 48, 32 / 64, 24 / 48, 32 / 64])
    assert b["gt_labels"][0, 0] == 3
    assert b["gt_mask"][0].tolist() == [True, False, False, False]
    # no GT fields unless requested
    b2 = collate([(img, t)], num_classes=5, fixed_size=64)
    assert "gt_boxes" not in b2


def test_flip_merge_maxes_image_logits():
    from spe_tpu.train.engine import _flip_merge

    out_n = {"pred_logits": jnp.zeros((1, 2, 3)), "pred_boxes": jnp.zeros((1, 2, 4))}
    out_f = {"pred_logits": jnp.ones((1, 2, 3)),
             "pred_boxes": jnp.full((1, 2, 4), 0.25)}
    bb_n = {"x_logits": jnp.array([[0.1, 0.9]]), "x_cls_logits": jnp.array([[0.5, 0.0]])}
    bb_f = {"x_logits": jnp.array([[0.6, 0.2]]), "x_cls_logits": jnp.array([[0.2, 0.7]])}
    m = _flip_merge(out_n, out_f, bb_n, bb_f)
    assert m["pred_logits"].shape == (1, 4, 3)
    np.testing.assert_allclose(np.asarray(m["x_logits"]), [[0.6, 0.9]])
    np.testing.assert_allclose(np.asarray(m["x_cls_logits"]), [[0.5, 0.7]])
    # flipped boxes get x mirrored back
    np.testing.assert_allclose(np.asarray(m["pred_boxes"][0, 2]),
                               [0.75, 0.25, 0.25, 0.25])


def test_config_rejects_dead_flags():
    from spe_tpu.config import SPEConfig

    for kw in ({"drloc": True}, {"dilation": True}, {"drop_block_rate": 0.1}):
        with pytest.raises(ValueError):
            SPEConfig(**kw).validate()
    SPEConfig().validate()  # defaults pass


def test_pre_norm_encoder_builds_and_differs(rng):
    from spe_tpu.models.transformer import TransformerEncoderLayer

    x = jnp.asarray(rng.normal(size=(2, 10, 16)).astype(np.float32))
    pos = jnp.asarray(rng.normal(size=(2, 10, 16)).astype(np.float32))
    post = TransformerEncoderLayer(2, 32)
    pre = TransformerEncoderLayer(2, 32, normalize_before=True)
    p1 = post.init(jax.random.PRNGKey(0), x, pos)
    p2 = pre.init(jax.random.PRNGKey(0), x, pos)
    y1 = post.apply(p1, x, pos)
    y2 = pre.apply(p2, x, pos)
    assert y1.shape == y2.shape == x.shape
    assert not np.allclose(np.asarray(y1), np.asarray(y2))


def test_pre_norm_final_encoder_norm_exists():
    from spe_tpu.models.transformer import ConditionalTransformer

    tr = ConditionalTransformer(d_model=16, num_heads=2, num_queries=4,
                                num_encoder_layers=1, num_decoder_layers=2,
                                dim_feedforward=32, num_refines=0,
                                normalize_before=True)
    src = jnp.zeros((1, 9, 16))
    params = tr.init(jax.random.PRNGKey(0), src, src)
    assert "encoder_norm" in params["params"]


def test_postprocess_panoptic():
    from spe_tpu.models.segmentation import id2rgb, postprocess_panoptic

    Q, K, h, w = 4, 6, 8, 8
    logits = np.full((Q, K), -5.0, np.float32)
    logits[0, 1] = 10.0   # thing, high confidence
    logits[1, 2] = 10.0   # stuff
    logits[2, 2] = 10.0   # same stuff class -> merged
    logits[3, K - 1] = 10.0  # no-object -> dropped
    masks = np.full((Q, h, w), -10.0, np.float32)
    masks[0, :, :4] = 10.0
    masks[1, :4, 4:] = 10.0
    masks[1, 4:, 4:] = 5.0   # 2nd-strongest in q2's quadrant: after the
    masks[2, 4:, 4:] = 10.0  # duplicate-stuff merge drops q2, q1 wins there
    masks[3] = 5.0
    is_thing = {1: True, 2: False}
    out = postprocess_panoptic(logits, masks, is_thing, (h, w))
    ids = out["id_map"]
    assert ids.shape == (h, w)
    # thing + merged stuff = 2 segments, void nowhere
    assert len(out["segments_info"]) == 2
    assert (ids > 0).all()
    cats = sorted(s["category_id"] for s in out["segments_info"])
    assert cats == [1, 2]
    stuff = [s for s in out["segments_info"] if s["category_id"] == 2][0]
    assert not stuff["isthing"]
    assert stuff["area"] == 32  # both stuff quadrants merged
    # png round-trips to the id map
    from PIL import Image

    rgb = np.asarray(Image.open(io.BytesIO(out["png_string"])))
    decoded = rgb[..., 0].astype(np.int32) + rgb[..., 1].astype(np.int32) * 256 \
        + rgb[..., 2].astype(np.int32) * 256 ** 2
    np.testing.assert_array_equal(decoded, ids)


def test_postprocess_panoptic_small_segment_filtered():
    from spe_tpu.models.segmentation import postprocess_panoptic

    Q, K, h, w = 2, 4, 8, 8
    logits = np.full((Q, K), -5.0, np.float32)
    logits[0, 0] = 10.0
    logits[1, 1] = 10.0
    masks = np.full((Q, h, w), -10.0, np.float32)
    masks[0] = 10.0            # query 0 owns everything...
    masks[1, 0, 0] = 20.0      # ...except 1 pixel (area 1 <= 4 -> filtered)
    out = postprocess_panoptic(logits, masks, {0: True, 1: True}, (h, w))
    assert len(out["segments_info"]) == 1
    assert out["segments_info"][0]["category_id"] == 0
    assert (out["id_map"] == 1).all()


@pytest.mark.slow
def test_train_step_skips_nonfinite_update():
    from spe_tpu.config import SPEConfig
    from spe_tpu.models.cait import CaiTConfig
    from spe_tpu.models.detector import SPEDetector
    from spe_tpu.train.optim import make_optimizer
    from spe_tpu.train.train_step import Gates, TrainState, make_train_step

    cfg = SPEConfig(backbone="TSCAM_cait_XXS24", num_classes=3, layer_to_det=2,
                    num_queries=6, enc_layers=1, dec_layers=2,
                    dim_feedforward=32, nheads=2, num_refines=1,
                    max_gt_boxes=4, max_cam_boxes_per_class=2, cam_cc_size=16,
                    hung_match_ratio=2, compute_dtype="float32",
                    dropout=0.0, drop_path_rate=0.0)
    bb = CaiTConfig(img_size=32, patch_size=16, embed_dim=16, depth=2,
                    num_heads=2, num_classes=3, layer_to_det=2,
                    depth_token_only=1)
    model = SPEDetector(backbone_cfg=bb, num_det_classes=cfg.num_det_classes,
                        num_queries=cfg.num_queries, num_refines=cfg.num_refines,
                        enc_layers=cfg.enc_layers, dec_layers=cfg.dec_layers,
                        dim_feedforward=cfg.dim_feedforward, nheads=cfg.nheads,
                        dropout=0.0)
    imgs = jnp.zeros((2, 32, 32, 3))
    label = jnp.zeros((2, 3)).at[:, 0].set(1.0)
    params = model.init(jax.random.PRNGKey(0), imgs)
    tx = make_optimizer(cfg, steps_per_epoch=5, params=params)
    state = TrainState(jnp.int32(0), params, tx.init(params), jnp.int32(0))
    step = jax.jit(make_train_step(model, cfg, tx))
    gates = Gates.for_epoch(cfg, epoch=20)

    good = {"images": imgs, "img_label": label}
    bad = {"images": jnp.full_like(imgs, jnp.nan), "img_label": label}

    s1, m1 = step(state, good, jax.random.PRNGKey(1), gates)
    assert int(m1["bad_steps"]) == 0 and np.isfinite(float(m1["loss"]))
    s2, m2 = step(s1, bad, jax.random.PRNGKey(2), gates)
    assert int(m2["bad_steps"]) == 1
    # params unchanged by the skipped update
    a = jax.tree_util.tree_leaves(s1.params)[0]
    b = jax.tree_util.tree_leaves(s2.params)[0]
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    assert int(s2.step) == 2
