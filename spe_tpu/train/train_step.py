"""The fused training step: one jitted program per step.

Reference hot loop (engine.py:93-174 `train_one_epoch_refine`):
  forward -> CAM pseudo boxes (CPU/cv2 in the reference; on-device here) ->
  refinement pseudo labels (PostProcessRefine) -> SetCriterion per stage ->
  epoch-gated loss weighting -> backward/clip/AdamW.

Everything below happens inside ONE jit: no host round-trips. Epoch gates
(engine.py:134-142) arrive as traced scalars in `gates` so epoch boundaries
don't recompile.

num_boxes semantics: the reference all_reduces the per-rank repeated-target
count and divides by world size with a min of 1 (conditional_detr.py:435-440),
then DDP averages gradients across ranks. In a global-batch jit program the
equivalent single normalizer is max(total_repeated_boxes, num_devices) —
derivation in the docstring of spe_tpu/train/criterion.py.
"""

from __future__ import annotations

from typing import Any, Dict, NamedTuple

import jax
import jax.numpy as jnp
import optax

from spe_tpu.config import SPEConfig
from spe_tpu.ops.cam_boxes import cam_pseudo_boxes
from spe_tpu.ops.postprocess import postprocess_refine
from spe_tpu.train.criterion import (image_label_losses, repeated_num_boxes,
                                     set_criterion_multi)


class TrainState(NamedTuple):
    step: jnp.ndarray
    params: Any
    opt_state: Any
    # count of steps whose loss/grads were non-finite (those updates are
    # skipped). The reference aborts per step (engine.py:156-159); on TPU a
    # per-step host sync would stall the pipeline, so the flag rides the
    # donated state for free and the engine aborts at the next log boundary.
    bad_steps: Any = 0


class Gates(NamedTuple):
    """Per-epoch scalars (traced; no recompiles across epochs)."""
    det_weight: jnp.ndarray      # 0.0 while epoch < warmup_cls_epochs
    refine_weight: jnp.ndarray   # 0.0 while epoch < refine_start_epoch
    cam_thr: jnp.ndarray         # 0.2 -> 0.1 at cam_thr_drop_epoch

    @staticmethod
    def for_epoch(cfg: SPEConfig, epoch: int) -> "Gates":
        return Gates(
            det_weight=jnp.float32(0.0 if epoch < cfg.warmup_cls_epochs else 1.0),
            refine_weight=jnp.float32(0.0 if epoch < cfg.refine_start_epoch else 1.0),
            cam_thr=jnp.float32(cfg.cam_thr_at_epoch(epoch)),
        )


def compute_losses(model, params, batch, rng, cfg: SPEConfig, gates: Gates,
                   *, num_devices: int = 1, deterministic: bool = False):
    """Forward + pseudo-labels + all criteria. Returns (total, loss_dict)."""
    rng_dropout, rng_jit0, rng_jitr = jax.random.split(rng, 3)
    out = model.apply(params, batch["images"],
                      pad_mask=batch.get("pad_mask"),
                      deterministic=deterministic,
                      rngs=None if deterministic else {"dropout": rng_dropout})

    backbone_out = out["backbone"]
    stages = out["stages"]

    # ---- stage-0 pseudo GT from CAMs (engine.py:117; grads stopped like
    # the reference's .detach().cpu(), engine.py:383) ----
    cams = jax.lax.stop_gradient(backbone_out["cams_cls"])
    cam_targets = cam_pseudo_boxes(
        cams, batch["img_label"], gates.cam_thr,
        area_ratio=cfg.multi_box_ratio, size=cfg.cam_cc_size,
        k=cfg.max_cam_boxes_per_class, max_boxes=cfg.max_gt_boxes,
        max_pos=cfg.max_pos_classes)
    cam_targets["scores"] = jnp.ones_like(cam_targets["labels"], jnp.float32)

    # ---- refinement pseudo labels: stage k supervises stage k+1
    # (engine.py:271-308; PostProcessRefine per-class argmax) ----
    refine_targets = {}
    for k in range(cfg.num_refines):
        src = stages[k]
        refine_targets[k + 1] = postprocess_refine(
            jax.lax.stop_gradient(src["pred_logits"]),
            jax.lax.stop_gradient(src["pred_boxes"]),
            cam_targets["labels"], cam_targets["mask"])

    # ---- num_boxes normalizer (shared scale for all stages) ----
    losses: Dict[str, jnp.ndarray] = {}
    crit_kw = dict(hung_match_ratio=cfg.hung_match_ratio, box_jitter=cfg.box_jitter,
                   focal_alpha=cfg.focal_alpha, focal_gamma=cfg.focal_gamma,
                   cost_class=cfg.set_cost_class, cost_bbox=cfg.set_cost_bbox,
                   cost_giou=cfg.set_cost_giou, assignment=cfg.assignment,
                   training=not deterministic, aux_loss=cfg.aux_loss,
                   cost_trace=cfg.log_match_cost)

    # all stages' matchings run as ONE batched solver call (identical math
    # to per-stage set_criterion; see set_criterion_multi)
    stage_list = [stages[0]] + [stages[k] for k in refine_targets]
    tgt_list = [cam_targets] + list(refine_targets.values())
    rng_list = [rng_jit0] + [jax.random.fold_in(rng_jitr, k)
                             for k in refine_targets]
    nb_list = [jnp.maximum(repeated_num_boxes(t, cfg.hung_match_ratio),
                           float(num_devices)) for t in tgt_list]
    flags = [False] + [True] * len(refine_targets)
    stage_losses = set_criterion_multi(stage_list, tgt_list, rng_list,
                                       nb_list, flags, **crit_kw)
    losses.update(stage_losses[0])
    losses.update(image_label_losses(backbone_out, batch["img_label"]))
    for (k, _), sl in zip(refine_targets.items(), stage_losses[1:]):
        for name, v in sl.items():
            losses[f"ref_{k}_{name}"] = v

    # ---- instance-mask losses (--masks training on a dataset providing
    # GT masks, e.g. coco_panoptic; reference loss_masks,
    # conditional_detr.py:321-350 — final decoder layer only, :451-452).
    # Deviation (documented): masks are matched against the RAW GT set in an
    # independent matching, while box/class losses above match against the
    # jitter-repeated CAM pseudo-targets — so the query receiving mask
    # supervision can differ from the one receiving box supervision for the
    # same object. The reference shares matcher indices because it trains
    # masks against the same (GT) target set; here the main recipe's box
    # targets are pseudo-boxes, which have no masks. The intended mask
    # workflow (--frozen_weights: detector frozen, segm head only) is
    # unaffected — box losses don't update anything there. ----
    if "pred_masks" in out and "gt_masks" in batch:
        from spe_tpu.train.criterion import mask_losses, match

        gt_t = {"boxes": batch["gt_boxes"],
                "labels": batch["gt_labels"].astype(jnp.int32),
                "mask": batch["gt_mask"]}
        row = match(stages[0]["pred_logits"], stages[0]["pred_boxes"], gt_t,
                    method=cfg.assignment, cost_class=cfg.set_cost_class,
                    cost_bbox=cfg.set_cost_bbox, cost_giou=cfg.set_cost_giou)
        nb_m = jnp.maximum(batch["gt_mask"].astype(jnp.float32).sum(),
                           float(num_devices))
        losses.update(mask_losses(
            out["pred_masks"], batch["gt_masks"], row, batch["gt_mask"], nb_m,
            focal_alpha=cfg.focal_alpha, focal_gamma=cfg.focal_gamma))

    # ---- weighted total with epoch gates (engine.py:134-144) ----
    base_w = {"loss_ce": cfg.cls_loss_coef, "loss_bbox": cfg.bbox_loss_coef,
              "loss_giou": cfg.giou_loss_coef}
    weight = {}
    for name, coef in base_w.items():
        weight[name] = coef
        if cfg.aux_loss:  # --no_aux_loss drops the per-layer aux terms
            for i in range(cfg.dec_layers - 1):
                weight[f"{name}_{i}"] = coef
    weight["img_label_logits"] = cfg.img_label_loss_coef
    weight["img_label_logits_tokens"] = cfg.img_label_tokens_loss_coef
    weight["loss_mask"] = cfg.mask_loss_coef
    weight["loss_dice"] = cfg.dice_loss_coef

    total = jnp.float32(0.0)
    for name, v in losses.items():
        if name.startswith("ref_"):
            short = name.split("_", 2)[2]
            if short in weight:
                # ref losses gate on refine_weight AND det_weight: the
                # reference's warmup filter (engine.py:134-137) keeps ONLY
                # img_label/drloc keys while epoch < warmup, which drops
                # ref_* too — so a config with refine_start_epoch <
                # warmup_cls_epochs still (correctly) has no ref losses
                # until warmup ends, matching the reference
                total = total + gates.refine_weight * gates.det_weight * weight[short] * v
        elif name in weight:
            gate = (jnp.float32(1.0) if name.startswith("img_label")
                    else gates.det_weight)
            total = total + gate * weight[name] * v
    return total, losses


def make_train_step(model, cfg: SPEConfig, tx: optax.GradientTransformation,
                    num_devices: int = 1):
    """Returns train_step(state, batch, rng, gates) -> (state, metrics)."""

    def train_step(state: TrainState, batch, rng, gates: Gates):
        def loss_fn(params):
            return compute_losses(model, params, batch, rng, cfg, gates,
                                  num_devices=num_devices, deterministic=False)

        (total, losses), grads = jax.value_and_grad(loss_fn, has_aux=True)(state.params)

        if hasattr(tx, "flat_update"):
            # fused whole-tail update: norm + sanitize + skip + clip + AdamW
            # + apply in flat-vector form (see optim.flat_update — the
            # per-leaf composition below costs ~7ms of kernel dispatch)
            params, opt_state, grad_norm, finite = tx.flat_update(
                grads, state.opt_state, state.params, jnp.isfinite(total))
            bad_steps = (jnp.asarray(state.bad_steps, jnp.int32) +
                         (1 - finite.astype(jnp.int32)))
            metrics = {"loss": total, "grad_norm": grad_norm,
                       "bad_steps": bad_steps, **losses}
            return (TrainState(state.step + 1, params, opt_state, bad_steps),
                    metrics)

        grad_norm = optax.global_norm(grads)
        finite = jnp.isfinite(total) & jnp.isfinite(grad_norm)

        # non-finite steps keep params/opt_state unchanged. Per-leaf selects
        # instead of lax.cond: the cond's untaken branch still forces XLA to
        # materialize both full state tuples (profiled at ~4ms/step of pure
        # copies); where-selects fuse into the optimizer update for free.
        # Grads are zeroed first so Adam moments can't ingest NaNs.
        zero = (1.0 - finite.astype(jnp.float32))
        safe_grads = jax.tree_util.tree_map(
            lambda g: jnp.nan_to_num(g, nan=0.0, posinf=0.0, neginf=0.0) *
            finite.astype(g.dtype), grads)
        updates, new_opt_state = tx.update(safe_grads, state.opt_state,
                                           state.params)
        params = optax.apply_updates(
            state.params,
            jax.tree_util.tree_map(
                lambda u: u * finite.astype(u.dtype), updates))
        opt_state = jax.tree_util.tree_map(
            lambda new, old: (new * finite.astype(new.dtype) +
                              old * zero.astype(old.dtype))
            if jnp.issubdtype(jnp.asarray(new).dtype, jnp.floating)
            else jnp.where(finite, new, old),
            new_opt_state, state.opt_state)
        bad_steps = jnp.asarray(state.bad_steps, jnp.int32) + (1 - finite.astype(jnp.int32))
        metrics = {"loss": total, "grad_norm": grad_norm,
                   "bad_steps": bad_steps, **losses}
        return TrainState(state.step + 1, params, opt_state, bad_steps), metrics

    return train_step
