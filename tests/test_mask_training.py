"""Mask (segmentation) training chain: dataset masks -> loader padding ->
matched-query mask losses -> frozen-detector optimizer
(reference --masks + --frozen_weights path, conditional_detr.py:321-350,
segmentation.py DETRsegm, main.py:218-220)."""

import jax
import jax.numpy as jnp
import numpy as np

from spe_tpu.config import SPEConfig
from spe_tpu.data.loader import DataLoader
from spe_tpu.data.synthetic import SyntheticDetection
from spe_tpu.models.cait import CaiTConfig
from spe_tpu.models.detector import SPEDetector
from spe_tpu.train.optim import make_optimizer
from spe_tpu.train.train_step import Gates, TrainState, make_train_step
import pytest


def _setup(frozen=None):
    cfg = SPEConfig(
        backbone="TSCAM_cait_tiny", num_classes=4, layer_to_det=2,
        num_queries=12, enc_layers=1, dec_layers=2, dim_feedforward=64,
        nheads=2, num_refines=0, max_gt_boxes=6, max_cam_boxes_per_class=2,
        cam_cc_size=16, hung_match_ratio=3, compute_dtype="float32",
        dropout=0.0, drop_path_rate=0.0, masks=True, fixed_size=True,
        max_size=64, dataset_file="synthetic", frozen_weights=frozen)
    bb = CaiTConfig(img_size=64, patch_size=8, embed_dim=32, depth=3,
                    num_heads=2, num_classes=4, layer_to_det=2,
                    depth_token_only=2, init_scale=1.0)
    model = SPEDetector(backbone_cfg=bb, num_det_classes=cfg.num_det_classes,
                        num_queries=cfg.num_queries, num_refines=cfg.num_refines,
                        enc_layers=cfg.enc_layers, dec_layers=cfg.dec_layers,
                        dim_feedforward=cfg.dim_feedforward, nheads=cfg.nheads,
                        dropout=0.0, masks=True)
    ds = SyntheticDetection(num_images=8, num_classes=4, img_size=64, seed=0,
                            return_masks=True)
    loader = DataLoader(ds, 4, 4, fixed_size=64, seed=0, max_gt=6)
    return cfg, model, loader


def test_loader_carries_masks():
    _, _, loader = _setup()
    batch = next(iter(loader.epoch(0)))
    assert batch["gt_masks"].shape == (4, 6, 64, 64)
    # mask pixels match the boxes' area for the synthetic rectangles
    gm, gb, gv = batch["gt_masks"], batch["gt_boxes"], batch["gt_mask"]
    for b in range(4):
        for t in range(6):
            if gv[b, t]:
                area = gm[b, t].sum() / (64 * 64)
                box_area = gb[b, t, 2] * gb[b, t, 3]
                np.testing.assert_allclose(area, box_area, atol=0.05)


@pytest.mark.slow
def test_mask_losses_in_train_step():
    cfg, model, loader = _setup()
    batch = next(iter(loader.epoch(0)))
    b = {k: jnp.asarray(v) for k, v in batch.items()
         if k in ("images", "pad_mask", "img_label", "gt_boxes", "gt_labels",
                  "gt_mask", "gt_masks")}
    params = model.init(jax.random.PRNGKey(0), b["images"][:1])
    tx = make_optimizer(cfg, steps_per_epoch=2, params=params)
    state = TrainState(jnp.int32(0), params, tx.init(params), jnp.int32(0))
    step = jax.jit(make_train_step(model, cfg, tx))
    gates = Gates.for_epoch(cfg, epoch=20)
    state2, metrics = step(state, b, jax.random.PRNGKey(1), gates)
    assert np.isfinite(float(metrics["loss"]))
    assert float(metrics["loss_mask"]) > 0
    assert float(metrics["loss_dice"]) > 0
    assert int(metrics["bad_steps"]) == 0


@pytest.mark.slow
def test_frozen_weights_trains_only_segm_head():
    cfg, model, loader = _setup(frozen="ckpt.ignored")
    batch = next(iter(loader.epoch(0)))
    b = {k: jnp.asarray(v) for k, v in batch.items()
         if k in ("images", "pad_mask", "img_label", "gt_boxes", "gt_labels",
                  "gt_mask", "gt_masks")}
    params = model.init(jax.random.PRNGKey(0), b["images"][:1])
    tx = make_optimizer(cfg, steps_per_epoch=2, params=params)
    state = TrainState(jnp.int32(0), params, tx.init(params), jnp.int32(0))
    step = jax.jit(make_train_step(model, cfg, tx))
    state2, _ = step(state, b, jax.random.PRNGKey(1), Gates.for_epoch(cfg, 20))

    flat0 = jax.tree_util.tree_flatten_with_path(state.params)[0]
    flat1 = dict(jax.tree_util.tree_flatten_with_path(state2.params)[0])
    moved_segm = moved_other = 0
    for path, v0 in flat0:
        v1 = flat1[path]
        changed = bool(np.any(np.asarray(v0) != np.asarray(v1)))
        names = [str(getattr(k, "key", k)) for k in path]
        if "segm_head" in names:
            moved_segm += changed
        else:
            moved_other += changed
    assert moved_segm > 0
    assert moved_other == 0
