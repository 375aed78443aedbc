"""Shared synthetic-convergence recipe: the REAL train step (CAM pseudo-
boxes, auction matching, criterion, AdamW) on the synthetic dataset.

Used two ways:
  * tests/test_convergence.py runs it on the deterministic CPU backend
    (einsum attention) as a seeded regression guard;
  * scripts_dev/convergence_tpu.py runs it on the real chip with
    use_pallas=True — the training-parity run that gates flipping
    use_pallas_attention on in the presets (VERDICT round-1 item 3).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from spe_tpu.config import SPEConfig
from spe_tpu.data.loader import DataLoader
from spe_tpu.data.synthetic import SyntheticDetection
from spe_tpu.models.cait import CaiTConfig
from spe_tpu.models.detector import SPEDetector
from spe_tpu.ops.cam_boxes import cam_pseudo_boxes
from spe_tpu.train import engine
from spe_tpu.train.optim import make_optimizer
from spe_tpu.train.train_step import Gates, TrainState, make_train_step

EPOCHS = 20


def _iou_cxcywh(a, b):
    ax = np.concatenate([a[..., :2] - a[..., 2:] / 2, a[..., :2] + a[..., 2:] / 2], -1)
    bx = np.concatenate([b[..., :2] - b[..., 2:] / 2, b[..., :2] + b[..., 2:] / 2], -1)
    lt = np.maximum(ax[:, None, :2], bx[None, :, :2])
    rb = np.minimum(ax[:, None, 2:], bx[None, :, 2:])
    wh = np.clip(rb - lt, 0, None)
    inter = wh[..., 0] * wh[..., 1]
    aa = (ax[:, 2] - ax[:, 0]) * (ax[:, 3] - ax[:, 1])
    ab = (bx[:, 2] - bx[:, 0]) * (bx[:, 3] - bx[:, 1])
    return inter / np.maximum(aa[:, None] + ab[None] - inter, 1e-9)


def run_convergence(use_pallas: bool = False, dropout: float = 0.0,
                    epochs: int = EPOCHS, num_refines: int = 0,
                    refine_start_epoch: int = 1000,
                    use_fused_block: bool = False,
                    use_fused_layers: bool = False) -> dict:
    """Train the tiny recipe and return the chain milestones:
    {bce, iou_start, iou_end, ap50, bad_steps} (+ ap50_refine when
    num_refines > 0: the self-refinement stage's AP50, exercising the
    PostProcessRefine -> SetCriterionRefine chain end-to-end in training,
    reference engine.py:271-308 + conditional_detr.py:497-589)."""
    cfg = SPEConfig(
        backbone="TSCAM_cait_tiny", num_classes=4, layer_to_det=2,
        num_queries=12, enc_layers=1, dec_layers=2, dim_feedforward=64,
        nheads=2, num_refines=num_refines, max_gt_boxes=6,
        max_cam_boxes_per_class=2,
        cam_cc_size=16, hung_match_ratio=3, compute_dtype="float32",
        dropout=dropout, drop_path_rate=0.0, lr=1e-3, lr_backbone=1e-3,
        lr_cls_head=1e-3, warmup_cls_epochs=2,
        refine_start_epoch=refine_start_epoch,
        cam_thr=0.2, batch_size=8, fixed_size=True, max_size=64,
        dataset_file="synthetic", use_pallas_attention=use_pallas,
        drop_attn_rate=dropout)
    # random-init tiny training needs a real LayerScale (the recipe's 1e-5
    # is tuned for pretrained depth-36 weights and freezes a 3-block model)
    bb = CaiTConfig(img_size=64, patch_size=8, embed_dim=32, depth=3,
                    num_heads=2, num_classes=4, layer_to_det=2,
                    depth_token_only=2, init_scale=1.0,
                    attn_drop_rate=dropout, use_pallas=use_pallas,
                    use_fused_block=use_fused_block)
    model = SPEDetector(backbone_cfg=bb, num_det_classes=cfg.num_det_classes,
                        num_queries=cfg.num_queries, num_refines=cfg.num_refines,
                        enc_layers=cfg.enc_layers, dec_layers=cfg.dec_layers,
                        dim_feedforward=cfg.dim_feedforward, nheads=cfg.nheads,
                        dropout=dropout, use_pallas=use_pallas,
                        use_fused_layers=use_fused_layers)

    # objects >= 1/3 of the image: the 8x8 patch grid quantizes boxes to
    # ~patch size, so smaller objects cap pseudo-box IoU below the AP50 bar
    ds = SyntheticDetection(num_images=64, num_classes=4, img_size=64, seed=0,
                            max_objects=2, min_frac=1 / 3, max_frac=1 / 2)
    loader = DataLoader(ds, cfg.batch_size, cfg.num_classes, fixed_size=64,
                        seed=0)
    loader_eval = DataLoader(ds, cfg.batch_size, cfg.num_classes,
                             fixed_size=64, shuffle=False, drop_last=False,
                             max_gt=6)

    params = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3)))
    tx = make_optimizer(cfg, steps_per_epoch=8, params=params)
    state = TrainState(jnp.int32(0), params, tx.init(params), jnp.int32(0))
    step = jax.jit(make_train_step(model, cfg, tx), donate_argnums=(0,))
    rng = jax.random.PRNGKey(1)

    @jax.jit
    def pseudo(params, images, img_label, cam_thr):
        out = model.apply(params, images, deterministic=True)
        return cam_pseudo_boxes(
            out["backbone"]["cams_cls"], img_label, cam_thr,
            area_ratio=cfg.multi_box_ratio, size=cfg.cam_cc_size,
            k=cfg.max_cam_boxes_per_class, max_boxes=cfg.max_gt_boxes)

    def pseudo_quality(params):
        ious = []
        for batch in loader_eval.epoch(0):
            t = pseudo(params, jnp.asarray(batch["images"]),
                       jnp.asarray(batch["img_label"]), jnp.float32(cfg.cam_thr))
            pb, pm = np.asarray(t["boxes"]), np.asarray(t["mask"])
            for b in range(pb.shape[0]):
                gm = batch["gt_mask"][b]
                if pm[b].any() and gm.any():
                    ious.append(_iou_cxcywh(batch["gt_boxes"][b][gm],
                                            pb[b][pm[b]]).max(1).mean())
                elif gm.any():
                    ious.append(0.0)
        return float(np.mean(ious))

    iou_start = pseudo_quality(state.params)

    metrics = None
    for epoch in range(epochs):
        gates = Gates.for_epoch(cfg, epoch)
        for i, batch in enumerate(loader.epoch(epoch)):
            b = {k: jnp.asarray(v) for k, v in batch.items()
                 if k in ("images", "pad_mask", "img_label")}
            state, metrics = step(state, b,
                                  jax.random.fold_in(rng, epoch * 1000 + i), gates)

    iou_end = pseudo_quality(state.params)
    stats = engine.evaluate_coco(model, state.params, loader_eval, ds.coco_gt(),
                                 cfg, refine_stage=0, use_aux_layer=False)
    out = {
        "bad_steps": int(metrics["bad_steps"]),
        "bce": float(metrics["img_label_logits"]),
        "iou_start": iou_start,
        "iou_end": iou_end,
        "ap50": float(stats["AP50"]),
    }
    if num_refines > 0:
        stats_r = engine.evaluate_coco(model, state.params, loader_eval,
                                       ds.coco_gt(), cfg,
                                       refine_stage=num_refines,
                                       use_aux_layer=False)
        out["ap50_refine"] = float(stats_r["AP50"])
    return out
