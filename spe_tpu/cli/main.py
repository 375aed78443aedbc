"""Unified training/eval driver.

Replaces the reference's duplicated main.py / main_coco.py (~60 argparse
flags each, drifting seeds) and the scripts/run_*.py launch wrappers with
one driver + presets:

  python -m spe_tpu.cli.main --preset voc0712 --coco_path ... --test_path ...
  python -m spe_tpu.cli.main --preset coco17 --coco_path ...
  python -m spe_tpu.cli.main --preset voc0712 --dataset_file synthetic \
      --dataset_eval synthetic --max_size 128 ...   # no-data smoke run

Flag names keep parity with reference main.py:35-147.
"""

from __future__ import annotations

import json
import time
from pathlib import Path

import numpy as np


def main(argv=None):
    from spe_tpu.utils.jax_setup import setup

    setup()
    import jax
    import jax.numpy as jnp

    from spe_tpu.config import config_from_args
    from spe_tpu.data.build import build_dataset
    from spe_tpu.data.loader import DataLoader
    from spe_tpu.models.build import build_model
    from spe_tpu.parallel.mesh import (init_distributed, make_mesh,
                                       replicated, warmup_collectives)
    from spe_tpu.train import engine
    from spe_tpu.train.checkpoint import restore_checkpoint, save_checkpoint
    from spe_tpu.train.optim import make_optimizer
    from spe_tpu.train.train_step import Gates, TrainState, make_train_step
    from spe_tpu.utils.misc import get_sha, setup_for_distributed

    # config first (pure python), then the process group BEFORE any other
    # JAX backend use (reference calls init_distributed_mode first thing,
    # main.py:151 / util/misc.py:414-436)
    cfg = config_from_args(argv)
    init_distributed(cfg.world_size, cfg.dist_url)
    setup_for_distributed(jax.process_index() == 0)  # util/misc.py:370-382
    print(f"git:\n  {get_sha()}\n")  # reference main.py:152
    print(cfg)

    rng = jax.random.PRNGKey(cfg.seed + jax.process_index())
    np.random.seed(cfg.seed + jax.process_index())

    # mesh before model: with --tp_attention the fused-MHA kernels are
    # head-sharded via shard_map and need the concrete mesh at trace time
    mesh = make_mesh(num_model=cfg.model_axis)
    if cfg.model_axis > 1:
        from spe_tpu.parallel.sharding_rules import check_tp_fused_compat

        check_tp_fused_compat(cfg, mesh)  # refuses TP x whole-block/layer
    model = build_model(cfg, tp_mesh=mesh if cfg.tp_attention else None)
    n_dev = len(jax.devices())
    dp_dev = n_dev // cfg.model_axis  # data-parallel width under TP
    warmup_collectives()  # form gloo/ICI cliques while ranks are aligned

    ds_train = build_dataset("train", cfg.dataset_file, cfg)
    ds_val = build_dataset("val", cfg.dataset_eval, cfg)
    fixed = cfg.max_size if cfg.fixed_size else None
    # reference --batch_size is PER DEVICE (scripts/run_voc0712.py launches
    # 8 processes x batch 1); one host process here drives all its local
    # devices, so the process-local batch is batch_size x local devices
    local_bs = cfg.batch_size * max(
        jax.local_device_count() // cfg.model_axis, 1)
    loader_train = DataLoader(ds_train, local_bs, cfg.num_classes,
                              fixed_size=fixed, seed=cfg.seed,
                              process_index=jax.process_index(),
                              process_count=jax.process_count(),
                              use_native=cfg.use_native_loader,
                              num_threads=cfg.num_workers,
                              bucket_quantum=0 if cfg.fixed_size else cfg.bucket_quantum)
    # COCO eval runs on ALL processes over a process-sharded val set and
    # merges collectively (reference DistributedSampler + CocoEvaluator
    # sync, engine.py:617-724); VOC eval runs whole on process 0 only
    # (reference main.py:255-257), so its loader must NOT be sharded.
    voc_eval = cfg.dataset_eval == "voc_voc"
    loader_val = DataLoader(ds_val, local_bs, cfg.num_classes,
                            fixed_size=fixed, shuffle=False, drop_last=False,
                            process_index=0 if voc_eval else jax.process_index(),
                            process_count=1 if voc_eval else jax.process_count(),
                            use_native=cfg.use_native_loader, train=False,
                            num_threads=cfg.num_workers,
                            max_gt=cfg.max_gt_boxes,
                            bucket_quantum=0 if cfg.fixed_size else cfg.bucket_quantum)
    if loader_train.use_native:
        print("data: native C++ decode path enabled")

    sample = jnp.zeros((1, cfg.max_size if cfg.fixed_size else 512,
                        cfg.max_size if cfg.fixed_size else 512, 3), jnp.float32)
    params = jax.jit(lambda: model.init(jax.random.PRNGKey(cfg.seed), sample))()
    n_params = sum(p.size for p in jax.tree_util.tree_leaves(params))
    print(f"number of params: {n_params}")

    if cfg.backbone_weights:
        # pretrained backbone init (reference timm pretrained=True +
        # finetune_det, cait.py:1676-1700/728-742)
        from spe_tpu.models.convert import (convert_backbone,
                                            load_torch_checkpoint,
                                            merge_pretrained_backbone,
                                            resolve_backbone_weights)
        from spe_tpu.train.checkpoint import resolve_resume

        # --backbone_weights auto -> the published fbaipublicfiles URL for
        # this backbone (reference cait.py timm factories, :1676-1700)
        src = resolve_backbone_weights(cfg.backbone_weights, cfg.backbone)
        sd = load_torch_checkpoint(resolve_resume(src))
        bb_cfg = model.backbone_cfg
        converted = convert_backbone(sd, depth=bb_cfg.depth,
                                     layer_to_det=bb_cfg.layer_to_det,
                                     depth_token_only=bb_cfg.depth_token_only,
                                     two_branch=bb_cfg.two_branch)
        params = dict(params)
        params["params"] = dict(params["params"])
        params["params"]["backbone"] = merge_pretrained_backbone(
            params["params"]["backbone"], converted)
        params = jax.device_put(params)
        print(f"initialized backbone from {cfg.backbone_weights}")

    steps_per_epoch = max(loader_train.steps_per_epoch(), 1)
    tx = make_optimizer(cfg, steps_per_epoch, params)
    state = TrainState(jnp.int32(0), params, tx.init(params), jnp.int32(0))

    if cfg.frozen_weights:
        # load detector weights for segmentation-only training (reference
        # main.py:218-220). The frozen checkpoint predates the segm head, so
        # merge its params into ours by key instead of strict restore.
        assert cfg.masks, "Frozen training is meant for segmentation only"
        from spe_tpu.train.checkpoint import load_params_lenient

        merged = load_params_lenient(cfg.frozen_weights, state.params)
        # _replace keeps the strongly-typed jnp.int32 bad_steps — rebuilding
        # with the python-int class default changes the aval and silently
        # recompiles the donated train step on its second call
        state = state._replace(params=merged)
        print(f"loaded frozen detector weights from {cfg.frozen_weights}")

    start_epoch = cfg.start_epoch
    if cfg.resume:
        state, last_epoch = restore_checkpoint(cfg.resume, state)
        if not cfg.eval:
            start_epoch = last_epoch + 1
        print(f"resumed from {cfg.resume} (epoch {last_epoch})")

    rep = replicated(mesh)
    if cfg.model_axis > 1:
        # TP: Megatron-rule param shardings over the model axis; the loss
        # normalization divides by the DATA-parallel width only
        from spe_tpu.parallel.sharding_rules import tp_param_shardings

        st_sh = tp_param_shardings(state, mesh, cfg)
        state = jax.device_put(state, st_sh)
        step_fn = jax.jit(make_train_step(model, cfg, tx, num_devices=dp_dev),
                          out_shardings=(st_sh, rep), donate_argnums=(0,))
    else:
        state = jax.device_put(state, rep)
        step_fn = jax.jit(make_train_step(model, cfg, tx, num_devices=n_dev),
                          out_shardings=(rep, rep), donate_argnums=(0,))

    def run_eval(params, epoch: int = 0):
        """COCO path: COLLECTIVE — every process must enter (the detection
        merge all-gathers across processes, engine.merge_across_processes).
        VOC path: process 0 only, whole val set (reference main.py:255-257)."""
        if voc_eval:
            if jax.process_index() != 0:
                return {}
            res_dir = (Path(cfg.output_dir) / "voc_results"
                       if cfg.write_voc_results and cfg.output_dir else None)
            stats = engine.evaluate_voc(model, params, loader_val, ds_val, cfg,
                                        with_flip=cfg.eval,
                                        results_dir=res_dir)
            print(f"VOC mAP: {stats['mAP']:.4f}  CorLoc: {stats['CorLoc']:.4f}")
        else:
            # main_coco.py:360-368 evaluates every refine head per epoch
            gt = (ds_val.coco_gt() if hasattr(ds_val, "coco_gt") else ds_val.raw)
            # eval artifacts like reference main_coco.py:398-407 (eval/*.pth)
            eval_dir = None
            if cfg.output_dir:
                eval_dir = Path(cfg.output_dir) / "eval"
                eval_dir.mkdir(parents=True, exist_ok=True)
            stats = {}
            for stage in range(cfg.num_refines + 1):
                save = (eval_dir / f"stage{stage}_{epoch:03d}.npz"
                        if eval_dir else None)
                s = engine.evaluate_coco(model, params, loader_val, gt, cfg,
                                         refine_stage=stage, eval_save_path=save)
                print(f"COCO eval (stage {stage}):",
                      {k: round(v, 4) for k, v in s.items()})
                if stage == 0:
                    stats.update(s)
                stats.update({f"stage{stage}_{k}": v for k, v in s.items()})
        return stats

    def sync_end():
        # align process exits: otherwise fast ranks sit in the 5-minute
        # jax.distributed shutdown barrier while rank 0 writes checkpoints,
        # and the barrier can expire (observed in the 2-process test)
        if jax.process_count() > 1:
            from jax.experimental import multihost_utils

            multihost_utils.sync_global_devices("spe:end_of_run")

    if cfg.eval:
        stats = run_eval(state.params)
        sync_end()
        return stats

    output_dir = Path(cfg.output_dir) if cfg.output_dir else None
    if output_dir:
        output_dir.mkdir(parents=True, exist_ok=True)

    print("Start training")
    if jax.process_count() > 1 and cfg.fixed_size:
        # pre-compile the train step on EVERY rank, then align via the
        # coordination service before the first execution: the first
        # post-compile collective must find all ranks within the (short)
        # rendezvous window, and compile times can differ per rank (e.g.
        # unequal persistent-cache hits — observed minutes of skew)
        from spe_tpu.parallel.mesh import coordination_barrier, shard_batch

        S = cfg.max_size
        local_bs = loader_train.batch_size
        dummy = shard_batch(mesh, {
            "images": np.zeros((local_bs, S, S, 3), np.float32),
            "pad_mask": np.zeros((local_bs, S, S), bool),
            "img_label": np.ones((local_bs, cfg.num_classes), np.float32),
        })
        step_fn.lower(state, dummy, jax.random.PRNGKey(0),
                      Gates.for_epoch(cfg, 0)).compile()
        coordination_barrier("spe:train_step_compiled")
    best_key, best_val = None, -1.0
    t_start = time.time()
    for epoch in range(start_epoch, cfg.epochs):
        gates = Gates.for_epoch(cfg, epoch)
        state, train_stats = engine.train_one_epoch(
            step_fn, state, loader_train, epoch, cfg, gates,
            jax.random.fold_in(rng, epoch), mesh=mesh)

        # run_eval is collective on the COCO path — every process enters.
        # Checkpoint saves are COLLECTIVE too (orbax syncs processes
        # internally); the best-metric decision is broadcast from process 0
        # on the VOC path (where only rank 0 evaluated). Only process 0
        # writes the JSON log.
        eval_stats = run_eval(state.params, epoch)
        key = "mAP" if voc_eval else "AP50"
        val = float(eval_stats.get(key, -1.0))
        if jax.process_count() > 1:
            from jax.experimental import multihost_utils

            val = float(multihost_utils.broadcast_one_to_all(
                np.float32(val)))
        if output_dir:
            save_checkpoint(output_dir / "checkpoint", state, epoch, cfg)
            save_checkpoint(output_dir / f"checkpoint{epoch:04d}", state, epoch, cfg)
            if val > best_val:
                best_val = val
                save_checkpoint(output_dir / "checkpoint_best", state, epoch, cfg)
            if jax.process_index() == 0:
                log = {**{f"train_{k}": v for k, v in train_stats.items()},
                       **{f"test_{k}": v for k, v in eval_stats.items()
                          if isinstance(v, (int, float))},
                       "epoch": epoch, "n_parameters": int(n_params)}
                with (output_dir / "log.txt").open("a") as f:
                    f.write(json.dumps(log) + "\n")
    print(f"Training time {time.time() - t_start:.0f}s")
    sync_end()
    return state


if __name__ == "__main__":
    main()
