"""Optimizer: AdamW with the reference's 3 parameter groups + StepLR.

Reference main.py:177-191: body lr (default 1e-4), backbone lr_backbone
(1e-5), backbone `blocks_token_only` (the class-attention head) lr_cls_head;
StepLR multiplies all by 0.1 after `lr_drop` epochs; grad clip by global
norm `clip_max_norm` (engine.py:163-165) happens before the update.

Two implementations of identical math:

- `_make_optax_optimizer`: the straightforward optax chain
  (clip_by_global_norm -> multi_transform of 3 adamw instances). Per-leaf:
  with ~500 param leaves the compiled step pays thousands of tiny
  kernel launches (profiled at ~28 ms/step on v5e — 19% of the step).
- the default FUSED path: all leaves are raveled into ONE flat f32 vector;
  clip + Adam moments + bias correction + decoupled weight decay + StepLR
  run as a handful of large fused kernels. The 3 reference param groups
  (+ the frozen group under --frozen_weights) become a per-element
  learning-rate vector baked at init, so group structure costs nothing at
  step time. Numerics match the optax chain to float32 roundoff
  (tests/test_train_step.py::test_fused_optimizer_matches_optax).
"""

from __future__ import annotations

from typing import Any, NamedTuple

import jax
import jax.numpy as jnp
import numpy as np
import optax
from jax.flatten_util import ravel_pytree

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


def _group_of(cfg: SPEConfig, path) -> str:
    names = [str(getattr(k, "key", k)) for k in path]
    if cfg.frozen_weights and not any("segm_head" == n for n in names):
        return "frozen"
    return param_group(tuple(getattr(k, "key", k) for k in path))


def _group_lrs(cfg: SPEConfig) -> dict:
    return {"body": cfg.lr, "backbone": cfg.lr_backbone,
            "cls_head": cfg.lr_cls_head, "frozen": 0.0}


class FusedAdamWState(NamedTuple):
    count: jnp.ndarray  # i32 scalar, number of updates applied so far
    mu: jnp.ndarray     # f32[n] first moment over the flat param vector
    nu: jnp.ndarray     # f32[n] second moment
    # f32[n] per-element learning rate (the 3 reference param groups in flat
    # form). Built ONCE at init as a plain runtime buffer and carried through
    # the state unchanged — never constructed inside the traced step, where
    # the ~500-broadcast concatenate cost XLA's constant folder minutes of
    # compile time (round-3 regression: BENCH/MULTICHIP rc=124).
    lr_vec: jnp.ndarray


def _make_fused_optimizer(cfg: SPEConfig, steps_per_epoch: int, params: Any,
                          b1=0.9, b2=0.999, eps=1e-8):
    """One flat-vector AdamW update for the whole tree (see module doc).

    The 3 reference param groups differ only in learning rate, so the flat
    update computes the UNSCALED AdamW direction once and the per-leaf
    scalar -lr·StepLR multiply happens after unravel — it fuses into each
    leaf's slice kernel, costing nothing and avoiding a params-sized lr
    constant in the program."""
    lrs = _group_lrs(cfg)
    leaf_lr = jax.tree_util.tree_map_with_path(
        lambda path, _: lrs[_group_of(cfg, path)], params)

    spe = max(int(steps_per_epoch), 1)
    wd = float(cfg.weight_decay)
    clip = float(cfg.clip_max_norm)

    def init(params):
        flat, _ = ravel_pytree(params)
        # Per-element lr built host-side from static shapes (numpy, so it is
        # a single literal even if init is traced): ravel_pytree concatenates
        # leaves in tree_leaves order, each raveled, so zipping the two
        # leaf lists reproduces the flat layout exactly.
        lr_leaves = jax.tree_util.tree_leaves(leaf_lr)
        sizes = [int(np.prod(l.shape)) for l in jax.tree_util.tree_leaves(params)]
        lr_vec = (np.concatenate([np.full(s, lr, np.float32)
                                  for lr, s in zip(lr_leaves, sizes)])
                  if sizes else np.zeros((0,), np.float32))
        # mu and nu must be DISTINCT buffers: the train step donates the
        # whole state, and donating one aliased buffer twice is an XLA error
        return FusedAdamWState(jnp.zeros((), jnp.int32),
                               jnp.zeros(flat.shape, jnp.float32),
                               jnp.zeros(flat.shape, jnp.float32),
                               jnp.asarray(lr_vec))

    def update(grads, state, params):
        g, unravel = ravel_pytree(grads)
        p, _ = ravel_pytree(params)
        g = g.astype(jnp.float32)
        if clip > 0:
            gn = jnp.sqrt(jnp.sum(g * g))
            g = g * jnp.where(gn < clip, 1.0, clip / gn)
        c1 = state.count + 1
        mu = b1 * state.mu + (1.0 - b1) * g
        nu = b2 * state.nu + (1.0 - b2) * (g * g)
        cf = c1.astype(jnp.float32)
        mu_hat = mu / (1.0 - jnp.power(b1, cf))
        nu_hat = nu / (1.0 - jnp.power(b2, cf))
        direction = mu_hat / (jnp.sqrt(nu_hat) + eps) + wd * p.astype(jnp.float32)
        # StepLR uses the pre-increment count like optax.scale_by_schedule
        factor = jnp.where(state.count // spe >= cfg.lr_drop, 0.1, 1.0)
        updates = jax.tree_util.tree_map(
            lambda u, lr: (-factor * lr) * u, unravel(direction), leaf_lr)
        return updates, FusedAdamWState(c1, mu, nu, state.lr_vec)

    def flat_update(grads, state, params, loss_finite):
        """Whole train-step tail in flat-vector form: grad norm, non-finite
        sanitize/skip, clip, Adam, per-group lr, param apply — ONE ravel of
        grads/params in, ONE unravel of new params out.

        Semantically identical to the per-leaf composition in
        train_step.make_train_step's generic branch (same decayed-then-
        restored moments on skipped steps); it exists because ~500-leaf
        tree_maps cost thousands of tiny kernel launches per step (profiled
        ~7 ms on v5e — pure dispatch). Returns
        (new_params, new_state, grad_norm, finite)."""
        g, unravel = ravel_pytree(grads)
        p, _ = ravel_pytree(params)
        g = g.astype(jnp.float32)
        grad_norm = jnp.sqrt(jnp.sum(g * g))
        finite = loss_finite & jnp.isfinite(grad_norm)
        fin = finite.astype(jnp.float32)
        g = jnp.nan_to_num(g, nan=0.0, posinf=0.0, neginf=0.0) * fin
        if clip > 0:
            gn = jnp.sqrt(jnp.sum(g * g))
            g = g * jnp.where(gn < clip, 1.0, clip / gn)
        c1 = state.count + 1
        mu = b1 * state.mu + (1.0 - b1) * g
        nu = b2 * state.nu + (1.0 - b2) * (g * g)
        cf = c1.astype(jnp.float32)
        mu_hat = mu / (1.0 - jnp.power(b1, cf))
        nu_hat = nu / (1.0 - jnp.power(b2, cf))
        direction = mu_hat / (jnp.sqrt(nu_hat) + eps) + wd * p
        factor = jnp.where(state.count // spe >= cfg.lr_drop, 0.1, 1.0)
        # per-element lr is a runtime buffer carried in the state (one extra
        # params-sized read per step ~ 0.2 ms, vs ~1500 per-leaf kernels;
        # built at init, NOT in-trace — see FusedAdamWState.lr_vec)
        p_new = p + (-factor * fin) * state.lr_vec * direction
        new_state = FusedAdamWState(
            jnp.where(finite, c1, state.count),
            mu * fin + state.mu * (1.0 - fin),
            nu * fin + state.nu * (1.0 - fin),
            state.lr_vec)
        return unravel(p_new), new_state, grad_norm, finite

    return FusedTx(init, update, flat_update)


class FusedTx(NamedTuple):
    """optax.GradientTransformation plus the fused whole-tail update.

    Duck-types as a GradientTransformation (init/update first) so every
    existing caller works unchanged; train_step picks `flat_update` when
    present."""
    init: Any
    update: Any
    flat_update: Any


def _make_optax_optimizer(cfg: SPEConfig, steps_per_epoch: int, params: Any):
    """Per-leaf optax chain — kept as the numerics oracle and the fallback
    for non-float32 param trees."""

    def steplr(base_lr):
        def sched(step):
            epoch = step // max(steps_per_epoch, 1)
            return base_lr * jax.numpy.where(epoch >= cfg.lr_drop, 0.1, 1.0)
        return sched

    def adamw(base_lr):
        return optax.adamw(learning_rate=steplr(base_lr),
                           weight_decay=cfg.weight_decay,
                           b1=0.9, b2=0.999, eps=1e-8)

    labels = jax.tree_util.tree_map_with_path(
        lambda path, _: _group_of(cfg, path), params)
    tx = optax.multi_transform(
        {"body": adamw(cfg.lr), "backbone": adamw(cfg.lr_backbone),
         "cls_head": adamw(cfg.lr_cls_head), "frozen": optax.set_to_zero()},
        labels)
    if cfg.clip_max_norm > 0:
        tx = optax.chain(optax.clip_by_global_norm(cfg.clip_max_norm), tx)
    return tx


def make_optimizer(cfg: SPEConfig, steps_per_epoch: int, params: Any,
                   fused: bool = True):
    """3-group AdamW with StepLR(gamma=0.1 @ lr_drop epochs) + global clip.

    With cfg.frozen_weights (segmentation-only training, reference
    main.py:218-220 + DETRsegm freeze_detr), every param outside the
    segmentation head gets zero learning rate."""
    # leaves may be concrete arrays OR ShapeDtypeStructs (memory analysis
    # passes eval_shape trees) — read dtype without materializing
    all_f32 = all(getattr(l, "dtype", None) == jnp.float32
                  for l in jax.tree_util.tree_leaves(params))
    if fused and all_f32:
        return _make_fused_optimizer(cfg, steps_per_epoch, params)
    return _make_optax_optimizer(cfg, steps_per_epoch, params)
