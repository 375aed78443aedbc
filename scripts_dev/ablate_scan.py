"""Scan-protocol step ablation: each row runs K iterations of a train-step
sub-program inside ONE jit (lax.scan), so the ~25ms/dispatch axon tunnel RPC
cannot pollute rows (see bench_calibrate.py for the protocol notes).

Rows (stock voc0712 preset, B8 512^2):
  full step        scan of the shipped train step, state carried
  loss+grad        value_and_grad(compute_losses), digest carried
  model grad       grad of sum(model outputs) only
  optimizer        clip+AdamW update applied K times to carried state

Usage (real TPU): python scripts_dev/ablate_scan.py
"""

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from spe_tpu.utils.jax_setup import setup

setup()

import jax
import jax.numpy as jnp
import numpy as np

from spe_tpu.config import voc0712_preset
from spe_tpu.models.build import build_model
from spe_tpu.train.optim import make_optimizer
from spe_tpu.train.train_step import (Gates, TrainState, compute_losses,
                                      make_train_step)

B, IMG, K = 8, 512, 8


def timeit(fn, repeats=3):
    float(fn())  # compile + warm
    best = 1e18
    for _ in range(repeats):
        t0 = time.time()
        float(fn())
        best = min(best, time.time() - t0)
    return best / K * 1e3


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
    state0 = TrainState(jnp.int32(0), params, tx.init(params), jnp.int32(0))
    gates = Gates.for_epoch(cfg, epoch=20)
    key = jax.random.PRNGKey(7)
    step_fn = make_train_step(model, cfg, tx, num_devices=1)

    rows = []

    # ---- empty-scan base ----
    @jax.jit
    def base():
        def body(c, i):
            return c + i.astype(jnp.float32) * 1e-30, None
        c, _ = jax.lax.scan(body, jnp.float32(0), jnp.arange(K))
        return c

    base_ms = timeit(base) * K
    print(f"# scan base overhead: {base_ms:.2f} ms total", flush=True)

    # ---- full train step ----
    @jax.jit
    def full(state):
        def body(st, i):
            st, m = step_fn(st, batch, jax.random.fold_in(key, i), gates)
            return st, m["loss"]
        st, losses = jax.lax.scan(body, state, jnp.arange(K))
        return jnp.sum(losses)

    rows.append(("full step", timeit(lambda: full(state0))))

    # ---- loss + grad (no optimizer) ----
    @jax.jit
    def lossgrad():
        def body(c, i):
            (total, _), grads = jax.value_and_grad(
                lambda p: compute_losses(model, p, batch,
                                         jax.random.fold_in(key, i), cfg,
                                         gates), has_aux=True)(params)
            dig = total + sum(jnp.sum(g.astype(jnp.float32)) * 1e-30
                              for g in jax.tree_util.tree_leaves(grads))
            return c + dig, None
        c, _ = jax.lax.scan(body, jnp.float32(0), jnp.arange(K))
        return c

    rows.append(("loss+grad", timeit(lossgrad)))

    # ---- model-only grad ----
    def model_loss(p, i):
        out = model.apply(p, batch["images"], deterministic=False,
                          rngs={"dropout": jax.random.fold_in(key, i)})
        t = jnp.float32(0)
        for r, st in out["stages"].items():
            t += jnp.sum(st["pred_logits"].astype(jnp.float32))
            t += jnp.sum(st["pred_boxes"].astype(jnp.float32))
        t += jnp.sum(out["backbone"]["x_logits"])
        return t

    @jax.jit
    def modelgrad():
        def body(c, i):
            g = jax.grad(model_loss)(params, i)
            dig = sum(jnp.sum(l.astype(jnp.float32)) * 1e-30
                      for l in jax.tree_util.tree_leaves(g))
            return c + dig, None
        c, _ = jax.lax.scan(body, jnp.float32(0), jnp.arange(K))
        return c

    rows.append(("model grad", timeit(modelgrad)))

    # ---- loss forward only (no grad) ----
    @jax.jit
    def lossfwd():
        def body(c, i):
            total, _ = compute_losses(model, params, batch,
                                      jax.random.fold_in(key, i), cfg, gates)
            return c + total, None
        c, _ = jax.lax.scan(body, jnp.float32(0), jnp.arange(K))
        return c

    rows.append(("loss fwd", timeit(lossfwd)))

    # ---- model forward only ----
    @jax.jit
    def modelfwd():
        def body(c, i):
            return c + model_loss(params, i) * 1e-30, None
        c, _ = jax.lax.scan(body, jnp.float32(0), jnp.arange(K))
        return c

    rows.append(("model fwd", timeit(modelfwd)))

    # ---- CAM -> pseudo boxes only ----
    from spe_tpu.ops.cam_boxes import cam_pseudo_boxes

    cams0 = jax.jit(lambda: jax.nn.sigmoid(jax.random.normal(
        jax.random.PRNGKey(1), (B, cfg.num_classes, 32, 32))))()

    @jax.jit
    def camonly():
        def body(c, i):
            t = cam_pseudo_boxes(
                cams0 + i.astype(jnp.float32) * 1e-6, batch["img_label"],
                gates.cam_thr, area_ratio=cfg.multi_box_ratio,
                size=cfg.cam_cc_size, k=cfg.max_cam_boxes_per_class,
                max_boxes=cfg.max_gt_boxes, max_pos=cfg.max_pos_classes)
            dig = sum(jnp.sum(l.astype(jnp.float32)) * 1e-30
                      for l in jax.tree_util.tree_leaves(t))
            return c + dig, None
        c, _ = jax.lax.scan(body, jnp.float32(0), jnp.arange(K))
        return c

    rows.append(("cam->boxes", timeit(camonly)))

    # ---- optimizer only (clip + AdamW on fixed-shape grads) ----
    fake_grads = jax.tree_util.tree_map(
        lambda p: jnp.full_like(p, 1e-4, dtype=jnp.float32), params)

    @jax.jit
    def optonly(state):
        def body(st, i):
            g = jax.tree_util.tree_map(
                lambda a: a + i.astype(a.dtype) * 1e-12, fake_grads)
            updates, opt_state = tx.update(g, st.opt_state, st.params)
            new_params = jax.tree_util.tree_map(
                lambda p, u: p + u.astype(p.dtype), st.params, updates)
            return TrainState(st.step + 1, new_params, opt_state,
                              st.bad_steps), None
        st, _ = jax.lax.scan(body, state, jnp.arange(K))
        return jnp.sum(jax.tree_util.tree_leaves(st.params)[0]
                       .astype(jnp.float32))

    rows.append(("optimizer (clip+AdamW)", timeit(lambda: optonly(state0))))

    print()
    for name, ms in rows:
        ms -= base_ms / K
        print(f"{name:26s} {ms:8.2f} ms  ({ms/B:6.2f} ms/img)", flush=True)


if __name__ == "__main__":
    main()
