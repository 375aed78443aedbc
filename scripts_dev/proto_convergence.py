"""Prototype: how many fused-train-step iterations until synthetic AP50
rises meaningfully at tiny dims on CPU? Calibrates the committed threshold
for tests/test_convergence.py."""
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
from spe_tpu.train import engine
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
loader_eval = DataLoader(ds, cfg.batch_size, cfg.num_classes, fixed_size=64,
                         shuffle=False, drop_last=False)

params = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3)))
tx = make_optimizer(cfg, steps_per_epoch=8, params=params)
state = TrainState(jnp.int32(0), params, tx.init(params), jnp.int32(0))
step = jax.jit(make_train_step(model, cfg, tx), donate_argnums=(0,))
rng = jax.random.PRNGKey(1)

t0 = time.time()
EPOCHS = 60
for epoch in range(EPOCHS):
    gates = Gates.for_epoch(cfg, epoch)
    for i, batch in enumerate(loader.epoch(epoch)):
        b = {k: jnp.asarray(v) for k, v in batch.items()
             if k in ("images", "pad_mask", "img_label")}
        state, metrics = step(state, b, jax.random.fold_in(rng, epoch * 1000 + i), gates)
    if epoch % 5 == 4 or epoch == 0:
        print(f"epoch {epoch} loss={float(metrics['loss']):.4f} "
              f"ce={float(metrics.get('loss_ce', 0)):.4f} "
              f"img={float(metrics.get('img_label_logits', 0)):.4f} "
              f"t={time.time()-t0:.0f}s", flush=True)
        s = engine.evaluate_coco(model, state.params, loader_eval, ds.coco_gt(),
                                 cfg, refine_stage=0, use_aux_layer=False)
        print(f"  AP={s['AP']:.4f} AP50={s['AP50']:.4f}", flush=True)
print(f"total {time.time()-t0:.0f}s")
