"""Criterion-forward breakdown (scan-inside-one-jit protocol, see
bench_calibrate.py): where do the ~18ms of post-model per-step work go?

Rows (stock voc0712 preset, B8: S=2 stages x L=6 layers x B8 = 96
assignment problems of Q=300 x T=120):
  criteria all     everything compute_losses does after model.apply
  match            the single batched auction call (96 problems)
  cost matrices    matcher_cost only, same stack
  layer losses     _layer_losses with fixed rows
  jitter repeat    jitter_repeat_targets for both stages

Usage (real TPU): python scripts_dev/ablate_criterion.py
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
from spe_tpu.ops.cam_boxes import cam_pseudo_boxes
from spe_tpu.ops.postprocess import postprocess_refine
from spe_tpu.train.criterion import (jitter_repeat_targets, match,
                                     matcher_cost, _layer_losses,
                                     repeated_num_boxes, set_criterion_multi)
from spe_tpu.train.train_step import Gates

B, K_ITERS = 8, 8


def timeit(fn, repeats=3):
    float(fn())
    best = 1e18
    for _ in range(repeats):
        t0 = time.time()
        float(fn())
        best = min(best, time.time() - t0)
    return best / K_ITERS * 1e3


def scan_of(body_fn):
    @jax.jit
    def run():
        def body(c, i):
            return c + body_fn(i), None
        c, _ = jax.lax.scan(body, jnp.float32(0), jnp.arange(K_ITERS))
        return c
    return run


def digest(tree):
    return sum(jnp.sum(l.astype(jnp.float32)) * 1e-30
               for l in jax.tree_util.tree_leaves(tree))


def main():
    cfg = voc0712_preset(batch_size=B)
    gates = Gates.for_epoch(cfg, epoch=20)
    rng = np.random.default_rng(0)
    key = jax.random.PRNGKey(7)

    Q, C, L = cfg.num_queries, cfg.num_classes, cfg.dec_layers
    S = 1 + cfg.num_refines
    img_label = (rng.uniform(size=(B, C)) > 0.85).astype(np.float32)
    img_label[:, 0] = 1.0
    img_label = jnp.asarray(img_label)

    # realistic-shape fake stage outputs
    def mk_stage(seed):
        r = np.random.default_rng(seed)
        return {
            "pred_logits": jnp.asarray(r.normal(size=(B, Q, C)) - 2.0,
                                       jnp.float32),
            "pred_boxes": jax.nn.sigmoid(jnp.asarray(
                r.normal(size=(B, Q, 4)), jnp.float32)),
            "aux_pred_logits": jnp.asarray(
                r.normal(size=(L - 1, B, Q, C)) - 2.0, jnp.float32),
            "aux_pred_boxes": jax.nn.sigmoid(jnp.asarray(
                r.normal(size=(L - 1, B, Q, 4)), jnp.float32)),
        }

    stages = [mk_stage(s) for s in range(S)]
    cams = jax.nn.sigmoid(jnp.asarray(rng.normal(size=(B, C, 32, 32)),
                                      jnp.float32))

    crit_kw = dict(hung_match_ratio=cfg.hung_match_ratio,
                   box_jitter=cfg.box_jitter, focal_alpha=cfg.focal_alpha,
                   focal_gamma=cfg.focal_gamma, cost_class=cfg.set_cost_class,
                   cost_bbox=cfg.set_cost_bbox, cost_giou=cfg.set_cost_giou,
                   assignment=cfg.assignment, training=True, aux_loss=True)

    def criteria_all(i):
        cams_i = cams + i.astype(jnp.float32) * 1e-6
        cam_targets = cam_pseudo_boxes(
            cams_i, img_label, gates.cam_thr, area_ratio=cfg.multi_box_ratio,
            size=cfg.cam_cc_size, k=cfg.max_cam_boxes_per_class,
            max_boxes=cfg.max_gt_boxes, max_pos=cfg.max_pos_classes)
        cam_targets["scores"] = jnp.ones_like(cam_targets["labels"],
                                              jnp.float32)
        refine = postprocess_refine(
            stages[0]["pred_logits"] + i.astype(jnp.float32) * 1e-6,
            stages[0]["pred_boxes"], cam_targets["labels"],
            cam_targets["mask"])
        tgt_list = [cam_targets, refine]
        rngs = [jax.random.fold_in(key, i * 2 + s) for s in range(S)]
        nb = [jnp.maximum(repeated_num_boxes(t, cfg.hung_match_ratio), 1.0)
              for t in tgt_list]
        outs = set_criterion_multi(stages, tgt_list, rngs, nb,
                                   [False, True], **crit_kw)
        return digest(outs)

    # fixed targets for the component rows
    cam_t0 = cam_pseudo_boxes(
        cams, img_label, gates.cam_thr, area_ratio=cfg.multi_box_ratio,
        size=cfg.cam_cc_size, k=cfg.max_cam_boxes_per_class,
        max_boxes=cfg.max_gt_boxes, max_pos=cfg.max_pos_classes)
    cam_t0["scores"] = jnp.ones_like(cam_t0["labels"], jnp.float32)
    rep0 = jax.jit(lambda: jitter_repeat_targets(
        cam_t0, key, cfg.hung_match_ratio, cfg.box_jitter))()
    T = rep0["boxes"].shape[1]

    LG = jnp.concatenate(
        [jnp.concatenate([s["aux_pred_logits"], s["pred_logits"][None]],
                         axis=0) for s in stages], axis=0)  # (S*L,B,Q,C)
    BX = jnp.concatenate(
        [jnp.concatenate([s["aux_pred_boxes"], s["pred_boxes"][None]],
                         axis=0) for s in stages], axis=0)
    TG = {k: jnp.broadcast_to(rep0[k][None], (S * L,) + rep0[k].shape)
          for k in ("boxes", "labels", "mask")}
    print(f"# problems: {S*L} layers x {B} imgs, Q={Q}, T={T}", flush=True)

    def match_only(i):
        lg = LG + i.astype(jnp.float32) * 1e-6
        rows, st = jax.vmap(lambda l, bx, lb, tb, m: match(
            l, bx, {"labels": lb, "boxes": tb, "mask": m},
            method=cfg.assignment, cost_class=cfg.set_cost_class,
            cost_bbox=cfg.set_cost_bbox, cost_giou=cfg.set_cost_giou,
            with_stats=True))(lg, BX, TG["labels"], TG["boxes"], TG["mask"])
        return digest((rows, st))

    def cost_only(i):
        lg = LG + i.astype(jnp.float32) * 1e-6
        c = jax.vmap(jax.vmap(lambda l, bx, lb, tb, m: matcher_cost(
            l, bx, lb, tb, m, cfg.set_cost_class, cfg.set_cost_bbox,
            cfg.set_cost_giou)))(
            lg, BX, TG["labels"], TG["boxes"], TG["mask"])
        return digest(c)

    rows0, _ = jax.jit(lambda: jax.vmap(lambda l, bx, lb, tb, m: match(
        l, bx, {"labels": lb, "boxes": tb, "mask": m},
        method=cfg.assignment, cost_class=cfg.set_cost_class,
        cost_bbox=cfg.set_cost_bbox,
        cost_giou=cfg.set_cost_giou, with_stats=True))(
        LG, BX, TG["labels"], TG["boxes"], TG["mask"]))()

    def losses_only(i):
        lg = LG + i.astype(jnp.float32) * 1e-6
        per = jax.vmap(lambda l, bx, row: _layer_losses(
            l, bx, rep0, row, jnp.float32(64.0),
            focal_alpha=cfg.focal_alpha, focal_gamma=cfg.focal_gamma,
            refine_weights=False))(lg, BX, rows0)
        return digest(per)

    def jitter_only(i):
        t = jitter_repeat_targets(cam_t0, jax.random.fold_in(key, i),
                                  cfg.hung_match_ratio, cfg.box_jitter)
        return digest(t)

    # iteration count of the batched solver (solver health)
    _, st = jax.jit(lambda: jax.vmap(lambda l, bx, lb, tb, m: match(
        l, bx, {"labels": lb, "boxes": tb, "mask": m},
        method=cfg.assignment, with_stats=True))(
        LG, BX, TG["labels"], TG["boxes"], TG["mask"]))()
    print(f"# match iters (max over problems): "
          f"{int(np.max(np.asarray(st['iters'])))}", flush=True)

    for name, fn in [("criteria all", criteria_all),
                     ("match", match_only),
                     ("cost matrices", cost_only),
                     ("layer losses", losses_only),
                     ("jitter repeat", jitter_only)]:
        ms = timeit(scan_of(fn))
        print(f"{name:18s} {ms:8.2f} ms  ({ms/B:6.2f} ms/img)", flush=True)


if __name__ == "__main__":
    main()
