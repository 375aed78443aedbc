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
    # preset default since r3; =0 disables for the A/B ladder
    if os.environ.get("SPE_BENCH_FUSED_LAYERS") == "1":
        overrides["use_fused_layers"] = True
    if os.environ.get("SPE_BENCH_FUSED_LAYERS") == "0":
        overrides["use_fused_layers"] = False
    # fused class-attention token blocks (the CAM source): =0/=1 force the
    # A/B ladder arms; unset follows use_fused_block (config 'auto')
    if os.environ.get("SPE_BENCH_FUSED_CA") == "0":
        overrides["use_fused_ca_block"] = "off"
    if os.environ.get("SPE_BENCH_FUSED_CA") == "1":
        overrides["use_fused_ca_block"] = "on"
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
    state = TrainState(jnp.int32(0), params, tx.init(params), jnp.int32(0))

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

    eval_rate, nms_load = bench_eval(cfg, model, state.params, n_dev)
    multiscale = (bench_multiscale(model, n_dev)
                  if os.environ.get("SPE_BENCH_MULTISCALE", "1") != "0"
                  else None)

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
        # NMS under a realistic clustered-detection load (VERDICT r4 #7):
        # fixpoint sweep count + NMS-only rate
        "nms_load": nms_load,
        # multi-scale bucketed-padding train row (VERDICT r3 #7): the
        # reference's DEFAULT transform chain is multi-scale
        # (datasets/coco.py:271-300); this row proves the bucketed loader
        # path trains at a bounded compile count and reports its rate
        "multiscale": multiscale,
    }))


def bench_multiscale(model, n_dev):
    """Multi-scale (non-fixed-size) training via bucketed padding
    (VERDICT r3 #7; reference default transform chain datasets/coco.py:271-300).

    A synthetic size ladder is collated with fixed_size=False and
    bucket_quantum=128 (data/loader.collate rounds padded H/W UP to the
    quantum), so the ladder's 3 raw sizes land in 2 distinct padded shapes.
    Asserts the jitted train step compiled AT MOST once per bucket (the
    whole point of bucketing: bounded recompilation), then reports the
    steady-state rate over the bucket rotation.

    (The compile-count assertion has already caught one real leak: a
    weak-typed python-int bad_steps in the initial TrainState recompiled
    every program on its second call — fixed r4 by constructing the field
    as jnp.int32.)
    """
    import jax
    import jax.numpy as jnp
    import numpy as np

    from spe_tpu.config import voc0712_preset
    from spe_tpu.data.loader import collate
    from spe_tpu.parallel.mesh import make_mesh, replicated, shard_batch
    from spe_tpu.train.optim import make_optimizer
    from spe_tpu.train.train_step import Gates, TrainState, make_train_step

    cfg = voc0712_preset(batch_size=BATCH, fixed_size=False)
    mscale_model = model  # same architecture; pos-embed interp is per-shape

    # raw (H, W) ladder; with quantum 128 these pad into 2 buckets —
    # (512, 512) and (512, 640) — and the 3rd size REUSES the (512, 640)
    # bucket, proving no per-size recompile. (2 buckets, not more: each
    # bucket costs one recipe-sized train-step compile through the slow
    # remote-compile tunnel, and the driver's bench run is time-budgeted.)
    ladder = [(500, 500), (480, 600), (460, 580)]
    rng = np.random.default_rng(2)
    batches = []
    for (h, w) in ladder:
        samples = []
        for b in range(BATCH):
            hh, ww = h - (b % 3), w - (b % 5)
            img = rng.normal(size=(hh, ww, 3)).astype(np.float32)
            lab = np.zeros(cfg.num_classes, np.float32)
            lab[(b + 1) % cfg.num_classes] = 1.0
            samples.append((img, {"img_label": lab, "image_id": b,
                                  "orig_size": np.array([hh, ww]),
                                  "size": np.array([hh, ww]),
                                  "boxes": np.zeros((0, 4), np.float32),
                                  "labels": np.zeros((0,), np.int64)}))
        c = collate(samples, cfg.num_classes, fixed_size=None,
                    bucket_quantum=cfg.bucket_quantum)
        batches.append({"images": jnp.asarray(c["images"]),
                        "pad_mask": jnp.asarray(c["pad_mask"]),
                        "img_label": jnp.asarray(c["img_label"])})
    buckets = sorted({tuple(b["images"].shape[1:3]) for b in batches})

    params = jax.jit(lambda: mscale_model.init(
        jax.random.PRNGKey(0), batches[0]["images"][:1],
        pad_mask=batches[0]["pad_mask"][:1]))()
    tx = make_optimizer(cfg, steps_per_epoch=1000, params=params)
    mesh = make_mesh()
    rep = replicated(mesh)
    state = jax.device_put(TrainState(jnp.int32(0), params, tx.init(params), jnp.int32(0)),
                           rep)
    step = jax.jit(make_train_step(mscale_model, cfg, tx, num_devices=n_dev),
                   out_shardings=(rep, rep), donate_argnums=(0,))
    gates = Gates.for_epoch(cfg, epoch=20)
    key = jax.random.PRNGKey(3)

    batches = [shard_batch(mesh, b) for b in batches]
    # warm TWICE per batch: round 1 compiles once per BUCKET; round 2 pays
    # each program's one-time first-execution stall (measured up to ~37s
    # through the axon tunnel on one program, r4) OUTSIDE the timed window
    for g in range(2):
        for i, b in enumerate(batches):
            state, metrics = step(state, b,
                                  jax.random.fold_in(key, g * 10 + i), gates)
        _ = float(metrics["loss"])
    n_compiles = int(step._cache_size())
    assert n_compiles <= len(buckets), (
        f"bucketed padding leaked compiles: {n_compiles} programs for "
        f"{len(buckets)} buckets {buckets}")

    t0 = time.time()
    steps = 0
    for g in range(2):
        for i, b in enumerate(batches):
            state, metrics = step(state, b,
                                  jax.random.fold_in(key, 100 + g * 10 + i),
                                  gates)
            steps += 1
    loss = float(metrics["loss"])
    assert jnp.isfinite(loss), f"non-finite multiscale loss {loss}"
    rate = BATCH * steps / (time.time() - t0) / n_dev
    return {"images_per_sec_per_chip": round(float(rate), 3),
            "buckets": [list(b) for b in buckets],
            "ladder": [list(s) for s in ladder],
            "compiled_programs": n_compiles}


def bench_eval(cfg, model, params, n_dev):
    """Eval-path throughput: flip-TTA forward + top-300 postprocess + NMS
    (the reference evaluate_det_voc pipeline, engine_loc.py:127-201).

    Caveat (VERDICT r3 weak #7): inputs are synthetic noise images and
    `params` comes from the bench state (a few steps from random init), so
    detections are near-uniform junk and the NMS workload under-exercises
    long suppression chains. The number is a THROUGHPUT figure for the
    fixed-shape eval program (whose cost is shape-, not content-dependent,
    except for NMS's data-dependent fixpoint iteration count); it is not
    evidence about NMS latency on realistic box distributions — see
    tests/test_nms.py for correctness on structured cases."""
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
    return float(np.median(rates)), bench_nms_load(n_dev)


def bench_nms_load(n_dev, B=8, N=300, n_clusters=8):
    """NMS under a REALISTIC detection load (VERDICT r4 #7): clustered
    overlapping boxes like a trained detector emits — n_clusters object
    centers, ~N/n_clusters near-duplicate boxes each (jittered scale/shift,
    descending scores), a few classes. Reports the fixpoint sweep count
    (the <6-typical claim in ops/nms.py) and the NMS-only rate."""
    import jax.numpy as jnp
    import numpy as np

    from spe_tpu.ops.nms import batched_nms_stats

    rng = np.random.default_rng(7)
    boxes = np.zeros((B, N, 4), np.float32)
    scores = rng.uniform(0.3, 1.0, (B, N)).astype(np.float32)
    labels = np.zeros((B, N), np.int32)
    for b in range(B):
        per = N // n_clusters
        for c in range(n_clusters):
            cx, cy = rng.uniform(100, 412, 2)
            w, h = rng.uniform(40, 160, 2)
            sl = slice(c * per, (c + 1) * per)
            jit = rng.normal(0, 8, (per, 4))
            base = np.array([cx - w / 2, cy - h / 2, cx + w / 2, cy + h / 2])
            boxes[b, sl] = base[None, :] + jit
            labels[b, sl] = c % 4  # overlapping clusters share classes
        rest = slice(n_clusters * per, N)
        k = N - n_clusters * per
        if k:
            boxes[b, rest] = rng.uniform(0, 512, (k, 4))
            boxes[b, rest, 2:] = boxes[b, rest, :2] + rng.uniform(20, 100, (k, 2))
            labels[b, rest] = rng.integers(0, 4, k)
    valid = jnp.ones((B, N), bool)
    bj, sj, lj = jnp.asarray(boxes), jnp.asarray(scores), jnp.asarray(labels)

    keep, sweeps = batched_nms_stats(bj, sj, lj, valid, 0.5)
    sweeps_np = np.asarray(sweeps)
    t0 = time.time()
    for _ in range(8):
        keep, sweeps = batched_nms_stats(bj, sj, lj, valid, 0.5)
    _ = np.asarray(keep)
    rate = B * 8 / (time.time() - t0) / n_dev
    return {"sweeps_max": int(sweeps_np.max()),
            "sweeps_mean": round(float(sweeps_np.mean()), 2),
            "kept_mean": round(float(np.asarray(keep).sum(1).mean()), 1),
            "nms_images_per_sec_per_chip": round(float(rate), 1)}


if __name__ == "__main__":
    main()
