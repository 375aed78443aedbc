"""Ablation-based step-time attribution (fallback when xplane tracing hangs
through the tunnel): time jitted sub-programs of the recipe train step and
difference them.

  fwd                 model.apply, deterministic
  fwd+bwd             grad of sum(model outputs) — backbone+transformer only
  cam                 cam_pseudo_boxes on the CAMs
  criterion           stage-0 + refine criteria incl. auction matchings
  losses_grad         grad of the full loss (everything except optimizer)
  full_step           the shipped train step (adds clip + AdamW + donation)

Usage: PYTHONPATH=.:$PYTHONPATH python scripts_dev/ablate_step.py
"""

from __future__ import annotations

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from spe_tpu.utils.jax_setup import setup

setup()

import jax
import jax.numpy as jnp
import numpy as np

from spe_tpu.config import voc0712_preset
from spe_tpu.models.build import build_model
from spe_tpu.ops.cam_boxes import cam_pseudo_boxes
from spe_tpu.train.optim import make_optimizer
from spe_tpu.train.train_step import (Gates, TrainState, compute_losses,
                                      make_train_step)
from spe_tpu.utils.timing import bench

B, IMG = 8, 512


def main():
    cfg = voc0712_preset(batch_size=B)
    model = build_model(cfg)
    rng = np.random.default_rng(0)
    img_label = (rng.uniform(size=(B, cfg.num_classes)) > 0.85).astype(np.float32)
    img_label[:, 0] = 1.0
    batch = {
        "images": jnp.array(rng.normal(size=(B, IMG, IMG, 3)).astype(np.float32)),
        "img_label": jnp.array(img_label),
    }
    params = jax.jit(lambda: model.init(jax.random.PRNGKey(0), batch["images"][:1]))()
    tx = make_optimizer(cfg, steps_per_epoch=1000, params=params)
    state = TrainState(jnp.int32(0), params, tx.init(params), jnp.int32(0))
    gates = Gates.for_epoch(cfg, epoch=20)
    key = jax.random.PRNGKey(7)

    rows = []

    def add(name, ms):
        rows.append((name, ms))
        print(f"{ms:9.1f} ms  {ms/B:6.1f} ms/img  {name}", flush=True)

    fwd = jax.jit(lambda p, x: model.apply(p, x, deterministic=True))
    add("fwd (deterministic)", bench(fwd, params, batch["images"], iters=8))

    def model_loss(p, x, k):
        out = model.apply(p, x, deterministic=False, rngs={"dropout": k})
        s = 0.0
        for st in out["stages"].values():
            s = s + jnp.sum(st["pred_logits"].astype(jnp.float32) ** 2) \
                  + jnp.sum(st["pred_boxes"].astype(jnp.float32) ** 2)
        # cams_cls is stop_gradiented in the real train step (train_step.py)
        s = s + jnp.sum(jax.lax.stop_gradient(
            out["backbone"]["cams_cls"]).astype(jnp.float32) ** 2)
        s = s + jnp.sum(out["backbone"]["x_logits"].astype(jnp.float32) ** 2)
        return s

    def _scalar_grad(loss):
        # grads reduced to ONE scalar on device: returning the ~500-leaf
        # grad tree through the axon tunnel costs seconds of per-buffer
        # handling and would swamp the compute being measured
        def f(*a):
            g = jax.grad(loss)(*a)
            return sum(jnp.vdot(v, v) for v in jax.tree_util.tree_leaves(g))
        return jax.jit(f)

    add("fwd+bwd (model only)",
        bench(_scalar_grad(model_loss), params, batch["images"], key, iters=8))

    out0 = fwd(params, batch["images"])
    cams = out0["backbone"]["cams_cls"]
    cam_fn = jax.jit(lambda c, il: cam_pseudo_boxes(
        c, il, jnp.float32(0.1), area_ratio=cfg.multi_box_ratio,
        size=cfg.cam_cc_size, k=cfg.max_cam_boxes_per_class,
        max_boxes=cfg.max_gt_boxes, max_pos=cfg.max_pos_classes))
    add("cam->pseudo boxes", bench(cam_fn, cams, batch["img_label"], iters=8))

    loss_fn = jax.jit(lambda p, b, k, g: compute_losses(
        model, p, b, k, cfg, g, num_devices=1)[0])
    add("fwd + pseudo + criteria (no bwd)", bench(loss_fn, params, batch, key, gates, iters=8))

    def full_loss(p, b, k, g):
        return compute_losses(model, p, b, k, cfg, g, num_devices=1)[0]

    grad_fn = jax.jit(lambda p, b, k, g: sum(
        jnp.vdot(v, v) for v in jax.tree_util.tree_leaves(
            jax.grad(full_loss)(p, b, k, g))))
    add("full loss fwd+bwd (no optimizer)", bench(grad_fn, params, batch, key, gates, iters=8))

    step = jax.jit(make_train_step(model, cfg, tx, num_devices=1))
    def run_step(s, b, k, g):
        return step(s, b, k, g)
    add("full train step", bench(run_step, state, batch, key, gates, iters=8))

    # A/B: whole-layer fused encoder/decoder kernels (ops/pallas_encoder.py,
    # ops/pallas_decoder.py)
    cfg_f = voc0712_preset(batch_size=B, use_fused_layers=True)
    model_f = build_model(cfg_f)

    def model_loss_f(p, x, k):
        out = model_f.apply(p, x, deterministic=False, rngs={"dropout": k})
        s = 0.0
        for st in out["stages"].values():
            s = s + jnp.sum(st["pred_logits"].astype(jnp.float32) ** 2) \
                  + jnp.sum(st["pred_boxes"].astype(jnp.float32) ** 2)
        s = s + jnp.sum(jax.lax.stop_gradient(
            out["backbone"]["cams_cls"]).astype(jnp.float32) ** 2)
        s = s + jnp.sum(out["backbone"]["x_logits"].astype(jnp.float32) ** 2)
        return s

    fwd_f = jax.jit(lambda p, x: model_f.apply(p, x, deterministic=True))
    add("fwd (fused enc/dec layers)", bench(fwd_f, params, batch["images"], iters=8))
    add("fwd+bwd (fused enc/dec layers)",
        bench(_scalar_grad(model_loss_f), params, batch["images"], key, iters=8))

    print("\n== ablation attribution (B8 512², stock voc0712 preset) ==")
    for name, ms in rows:
        print(f"{ms:9.1f} ms  {ms/B:6.1f} ms/img  {name}")
    d = dict(rows)
    fwdbwd = d["full loss fwd+bwd (no optimizer)"]
    print("\nderived:")
    print(f"  criteria+pseudo fwd-side ≈ "
          f"{d['fwd + pseudo + criteria (no bwd)'] - d['fwd (deterministic)']:.1f} ms")
    print(f"  model bwd ≈ {d['fwd+bwd (model only)'] - d['fwd (deterministic)']:.1f} ms")
    print(f"  optimizer+clip ≈ {d['full train step'] - fwdbwd:.1f} ms")
    print(f"  loss-graph bwd overhead ≈ "
          f"{fwdbwd - d['fwd+bwd (model only)']:.1f} ms")


if __name__ == "__main__":
    main()
