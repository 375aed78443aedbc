"""Diagnose: quality of CAM pseudo-boxes vs GT during synthetic training."""
import os
import time

os.environ["JAX_PLATFORMS"] = "cpu"
import jax

jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp
import numpy as np

from spe_tpu.config import SPEConfig
from spe_tpu.data.loader import DataLoader
from spe_tpu.data.synthetic import SyntheticDetection
from spe_tpu.models.cait import CaiTConfig
from spe_tpu.models.detector import SPEDetector
from spe_tpu.ops.cam_boxes import cam_pseudo_boxes
from spe_tpu.train.optim import make_optimizer
from spe_tpu.train.train_step import Gates, TrainState, make_train_step

cfg = SPEConfig(
    backbone="TSCAM_cait_tiny", num_classes=4, layer_to_det=2, num_queries=12,
    enc_layers=1, dec_layers=2, dim_feedforward=64, nheads=2, num_refines=0,
    max_gt_boxes=6, max_cam_boxes_per_class=2, cam_cc_size=16,
    hung_match_ratio=3, compute_dtype="float32", dropout=0.0,
    drop_path_rate=0.0, lr=1e-3, lr_backbone=1e-3, lr_cls_head=1e-3,
    warmup_cls_epochs=2, refine_start_epoch=1000, cam_thr=0.2,
    batch_size=8, fixed_size=True, max_size=64, dataset_file="synthetic")
bb = CaiTConfig(img_size=64, patch_size=8, embed_dim=32, depth=3, num_heads=2,
                num_classes=4, layer_to_det=2, depth_token_only=2,
                init_scale=1.0)
model = SPEDetector(backbone_cfg=bb, num_det_classes=cfg.num_det_classes,
                    num_queries=cfg.num_queries, num_refines=cfg.num_refines,
                    enc_layers=cfg.enc_layers, dec_layers=cfg.dec_layers,
                    dim_feedforward=cfg.dim_feedforward, nheads=cfg.nheads,
                    dropout=0.0)

ds = SyntheticDetection(num_images=64, num_classes=4, img_size=64, seed=0,
                        max_objects=2, min_frac=1/3, max_frac=1/2)
loader = DataLoader(ds, cfg.batch_size, cfg.num_classes, fixed_size=64, seed=0)
le = DataLoader(ds, cfg.batch_size, cfg.num_classes, fixed_size=64,
                shuffle=False, drop_last=False, max_gt=6)

params = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3)))
tx = make_optimizer(cfg, steps_per_epoch=8, params=params)
state = TrainState(jnp.int32(0), params, tx.init(params), jnp.int32(0))
step = jax.jit(make_train_step(model, cfg, tx), donate_argnums=(0,))
rng = jax.random.PRNGKey(1)


@jax.jit
def pseudo(params, images, img_label, cam_thr):
    out = model.apply(params, images, deterministic=True)
    return cam_pseudo_boxes(out["backbone"]["cams_cls"], img_label, cam_thr,
                            area_ratio=cfg.multi_box_ratio, size=cfg.cam_cc_size,
                            k=cfg.max_cam_boxes_per_class, max_boxes=cfg.max_gt_boxes)


def iou_cxcywh(a, b):
    ax = np.concatenate([a[..., :2] - a[..., 2:] / 2, a[..., :2] + a[..., 2:] / 2], -1)
    bx = np.concatenate([b[..., :2] - b[..., 2:] / 2, b[..., :2] + b[..., 2:] / 2], -1)
    lt = np.maximum(ax[:, None, :2], bx[None, :, :2])
    rb = np.minimum(ax[:, None, 2:], bx[None, :, 2:])
    wh = np.clip(rb - lt, 0, None)
    inter = wh[..., 0] * wh[..., 1]
    aa = (ax[:, 2] - ax[:, 0]) * (ax[:, 3] - ax[:, 1])
    ab = (bx[:, 2] - bx[:, 0]) * (bx[:, 3] - bx[:, 1])
    return inter / np.maximum(aa[:, None] + ab[None] - inter, 1e-9)


def pseudo_quality(params, cam_thr):
    ious = []
    for batch in le.epoch(0):
        t = pseudo(params, jnp.asarray(batch["images"]),
                   jnp.asarray(batch["img_label"]), jnp.float32(cam_thr))
        pb = np.asarray(t["boxes"])
        pm = np.asarray(t["mask"])
        gb = batch["gt_boxes"]
        gm = batch["gt_mask"]
        for b in range(pb.shape[0]):
            if pm[b].any() and gm[b].any():
                m = iou_cxcywh(gb[b][gm[b]], pb[b][pm[b]])
                ious.append(m.max(1).mean())  # best pseudo per GT
            elif gm[b].any():
                ious.append(0.0)
    return float(np.mean(ious))


t0 = time.time()
for epoch in range(60):
    gates = Gates.for_epoch(cfg, epoch)
    for i, batch in enumerate(loader.epoch(epoch)):
        b = {k: jnp.asarray(v) for k, v in batch.items()
             if k in ("images", "pad_mask", "img_label")}
        state, _ = step(state, b, jax.random.fold_in(rng, epoch * 1000 + i), gates)
    if epoch % 5 == 4 or epoch == 0:
        q = pseudo_quality(state.params, cfg.cam_thr_at_epoch(epoch))
        print(f"epoch {epoch} pseudoIoU={q:.3f} t={time.time()-t0:.0f}s", flush=True)
