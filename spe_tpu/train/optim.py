"""Optimizer: AdamW with the reference's 3 parameter groups + StepLR.

Reference main.py:177-191: body lr (default 1e-4), backbone lr_backbone
(1e-5), backbone `blocks_token_only` (the class-attention head) lr_cls_head;
StepLR multiplies all by 0.1 after `lr_drop` epochs; grad clip by global
norm `clip_max_norm` (engine.py:163-165) happens before the update.
"""

from __future__ import annotations

from typing import Any

import jax
import optax

from spe_tpu.config import SPEConfig


def param_group(path) -> str:
    """Classify a param path tuple like the reference's named_parameters
    string matching ('backbone' in name, 'blocks_token_only' in name)."""
    names = [str(p) for p in path]
    in_backbone = any("backbone" == n for n in names)
    token_only = any(n.startswith("blocks_token_only") for n in names)
    if in_backbone and token_only:
        return "cls_head"
    if in_backbone:
        return "backbone"
    return "body"


def make_optimizer(cfg: SPEConfig, steps_per_epoch: int, params: Any):
    """3-group AdamW with StepLR(gamma=0.1 @ lr_drop epochs) + global clip.

    With cfg.frozen_weights (segmentation-only training, reference
    main.py:218-220 + DETRsegm freeze_detr), every param outside the
    segmentation head is frozen via a zero transform."""

    def steplr(base_lr):
        def sched(step):
            epoch = step // max(steps_per_epoch, 1)
            return base_lr * jax.numpy.where(epoch >= cfg.lr_drop, 0.1, 1.0)
        return sched

    def adamw(base_lr):
        return optax.adamw(learning_rate=steplr(base_lr),
                           weight_decay=cfg.weight_decay,
                           b1=0.9, b2=0.999, eps=1e-8)

    def group(path):
        names = [str(getattr(k, "key", k)) for k in path]
        if cfg.frozen_weights and not any("segm_head" == n for n in names):
            return "frozen"
        return param_group(tuple(getattr(k, "key", k) for k in path))

    labels = jax.tree_util.tree_map_with_path(lambda path, _: group(path), params)
    tx = optax.multi_transform(
        {"body": adamw(cfg.lr), "backbone": adamw(cfg.lr_backbone),
         "cls_head": adamw(cfg.lr_cls_head), "frozen": optax.set_to_zero()},
        labels)
    if cfg.clip_max_norm > 0:
        tx = optax.chain(optax.clip_by_global_norm(cfg.clip_max_norm), tx)
    return tx
