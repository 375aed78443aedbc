"""Headline benchmark: training throughput (images/sec/chip) of the fused
train step on the flagship VOC recipe (TSCAM_cait_XXS36_Two_Branch, 512x512,
1 refinement stage — reference scripts/run_voc0712.py).

Prints one JSON line:
  {"metric": "train_images_per_sec_per_chip", "value": N, "unit": "img/s",
   "vs_baseline": N / REF_ESTIMATE}

The reference publishes no throughput numbers (BASELINE.md), so the
baseline is an ESTIMATE with stated bounds rather than an assertion:

  * FLOPs ceiling: the recipe model is ~400 GFLOP fwd+bwd per 512x512
    image (36+12 CaiT blocks @ N=1024/D=192, 3 enc + 12 dec layers). The
    reference trains fp32 (no amp anywhere in main.py) on V100-class GPUs
    (~16 fp32 TFLOP/s): even at 100% MFU that is ~25 img/s/GPU.
  * Serial host work per image (measured on this box): 12 scipy Hungarian
    solves of (300 x ~125) ~ 8.2ms (matcher re-run per decoder layer per
    stage, conditional_detr.py:447-449) + cv2 CAM->boxes ~ 1ms
    (engine.py:383, per positive class) ~ 10ms/img that overlaps nothing
    (it sits between forward and loss on the same thread).
  * batch_size=1 per GPU (scripts/run_voc0712.py) leaves the step
    latency-bound: python loop + launch overhead at fp32 MFU 30-50%.

Central estimate 8 img/s/GPU, plausible range [4, 16] (the 2x band). The
>=3x north star (BASELINE.json) holds at >=24 img/s against the central
estimate and the reported JSON carries the range so the claim stays
bounded: vs_baseline uses 8, vs_baseline_range divides by [16, 4].
"""

from __future__ import annotations

import json
import os
import time

REF_ESTIMATE_IMG_PER_SEC = 8.0
REF_RANGE_IMG_PER_SEC = (4.0, 16.0)
BATCH = int(os.environ.get("SPE_BENCH_BATCH", "8"))
IMG = 512
WARM_STEPS = 2
MEASURE_STEPS = 8
# median-of-N repeat groups: the axon tunnel is ±10% noisy, a single group
# cannot rank optimization-ladder rows (VERDICT r2) — the JSON carries the
# per-group rates so the spread is visible
REPEAT_GROUPS = int(os.environ.get("SPE_BENCH_REPEATS", "3"))
EVAL_BATCH = int(os.environ.get("SPE_BENCH_EVAL_BATCH", "8"))


def main():
    from spe_tpu.utils.jax_setup import setup

    setup()
    import jax
    import jax.numpy as jnp
    import numpy as np

    from spe_tpu.config import voc0712_preset
    from spe_tpu.models.build import build_model
    from spe_tpu.parallel.mesh import make_mesh, replicated, shard_batch
    from spe_tpu.train.optim import make_optimizer
    from spe_tpu.train.train_step import Gates, TrainState, make_train_step

    # the stock preset: fused Pallas attention (all four flavors, in-kernel
    # dropout) is the shipped default — the benched config IS the config a
    # --preset voc0712 user trains with (batch size aside).
    # SPE_BENCH_FUSED_BLOCK=0 disables the whole-block fused kernel
    # (ops/pallas_block.py, the preset default) and SPE_BENCH_PALLAS_ATTN=0
    # the per-flavor attention kernels, for A/B ladders.
    overrides = {}
    if os.environ.get("SPE_BENCH_FUSED_BLOCK") == "0":
        overrides["use_fused_block"] = False
    if os.environ.get("SPE_BENCH_PALLAS_ATTN") == "0":
        overrides["use_pallas_attention"] = False
    # whole-LAYER fused encoder/decoder kernels (ops/pallas_encoder.py):
    # opt-in for the A/B ladder until promoted into the preset default
    if os.environ.get("SPE_BENCH_FUSED_LAYERS") == "1":
        overrides["use_fused_layers"] = True
    cfg = voc0712_preset(batch_size=BATCH, **overrides)
    model = build_model(cfg)
    n_dev = len(jax.devices())
    mesh = make_mesh()

    rng = np.random.default_rng(0)
    img_label = (rng.uniform(size=(BATCH, cfg.num_classes)) > 0.85).astype(np.float32)
    img_label[:, 0] = 1.0  # ensure every image has a positive class
    batch = {
        "images": jnp.array(rng.normal(size=(BATCH, IMG, IMG, 3)).astype(np.float32)),
        "img_label": jnp.array(img_label),
    }

    params = jax.jit(lambda: model.init(jax.random.PRNGKey(0), batch["images"][:1]))()
    tx = make_optimizer(cfg, steps_per_epoch=1000, params=params)
    state = TrainState(jnp.int32(0), params, tx.init(params))

    rep = replicated(mesh)
    state = jax.device_put(state, rep)
    batch = shard_batch(mesh, batch)
    step = jax.jit(make_train_step(model, cfg, tx, num_devices=n_dev),
                   out_shardings=(rep, rep), donate_argnums=(0,))
    gates = Gates.for_epoch(cfg, epoch=20)

    key = jax.random.PRNGKey(0)
    for i in range(WARM_STEPS):
        state, metrics = step(state, batch, jax.random.fold_in(key, i), gates)
    # force full sync (block_until_ready does not wait through the tunnel)
    _ = float(metrics["loss"])

    rates = []
    for g in range(REPEAT_GROUPS):
        t0 = time.time()
        for i in range(MEASURE_STEPS):
            state, metrics = step(state, batch,
                                  jax.random.fold_in(key, 100 + g * 1000 + i),
                                  gates)
        loss = float(metrics["loss"])  # sync
        dt = (time.time() - t0) / MEASURE_STEPS
        assert jnp.isfinite(loss), f"non-finite loss {loss}"
        rates.append(BATCH / dt / n_dev)
    imgs_per_sec_per_chip = float(np.median(rates))

    eval_rate = bench_eval(cfg, model, state.params, n_dev)

    lo, hi = REF_RANGE_IMG_PER_SEC
    print(json.dumps({
        "metric": "train_images_per_sec_per_chip",
        "value": round(imgs_per_sec_per_chip, 3),
        "unit": "img/s",
        "vs_baseline": round(imgs_per_sec_per_chip / REF_ESTIMATE_IMG_PER_SEC, 3),
        # bounds of the baseline estimate (see module docstring)
        "vs_baseline_range": [round(imgs_per_sec_per_chip / hi, 3),
                              round(imgs_per_sec_per_chip / lo, 3)],
        # per-group spread (median-of-N protocol; tunnel noise is visible)
        "repeat_rates": [round(r, 3) for r in rates],
        # secondary metric: the VOC flip-TTA eval path (forward + top-300
        # postprocess + NMS), images/sec/chip
        "eval_images_per_sec_per_chip": round(eval_rate, 3),
    }))


def bench_eval(cfg, model, params, n_dev):
    """Eval-path throughput: flip-TTA forward + top-300 postprocess + NMS
    (the reference evaluate_det_voc pipeline, engine_loc.py:127-201)."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from spe_tpu.ops.nms import batched_nms
    from spe_tpu.ops.postprocess import postprocess_topk
    from spe_tpu.train.engine import _eval_outputs, _flip_merge

    B = EVAL_BATCH

    @jax.jit
    def infer(params, images, pad_mask, sizes):
        cat = {"images": jnp.concatenate([images, images[:, :, ::-1, :]], 0),
               "pad_mask": jnp.concatenate([pad_mask, pad_mask[:, :, ::-1]], 0)}
        outs2, full2 = _eval_outputs(model, params, cat, refine_stage=0,
                                     use_aux_layer=False)
        outs = _flip_merge({k: v[:B] for k, v in outs2.items()},
                           {k: v[B:] for k, v in outs2.items()},
                           {k: v[:B] for k, v in full2["backbone"].items()},
                           {k: v[B:] for k, v in full2["backbone"].items()})
        res = postprocess_topk(outs["pred_logits"], outs["pred_boxes"],
                               sizes.astype(jnp.float32), keep_queries=300)
        keep = batched_nms(res["boxes"], res["scores"], res["labels"],
                           jnp.ones_like(res["scores"], bool), 0.5)
        return res["scores"], keep

    rng = np.random.default_rng(1)
    images = jnp.array(rng.normal(size=(B, IMG, IMG, 3)).astype(np.float32))
    pad_mask = jnp.zeros((B, IMG, IMG), bool)
    sizes = jnp.full((B, 2), IMG, jnp.int32)

    scores, keep = infer(params, images, pad_mask, sizes)
    _ = np.asarray(scores)  # sync after compile
    rates = []
    for _ in range(max(REPEAT_GROUPS, 2)):
        t0 = time.time()
        for _ in range(4):
            scores, keep = infer(params, images, pad_mask, sizes)
        _ = np.asarray(scores), np.asarray(keep)
        rates.append(B * 4 / (time.time() - t0) / n_dev)
    return float(np.median(rates))


if __name__ == "__main__":
    main()
