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
    # --preset voc0712 user trains with (batch size aside)
    cfg = voc0712_preset(batch_size=BATCH)
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

    t0 = time.time()
    for i in range(MEASURE_STEPS):
        state, metrics = step(state, batch, jax.random.fold_in(key, 100 + i), gates)
    loss = float(metrics["loss"])  # sync
    dt = (time.time() - t0) / MEASURE_STEPS

    assert jnp.isfinite(loss), f"non-finite loss {loss}"
    imgs_per_sec_per_chip = BATCH / dt / n_dev
    lo, hi = REF_RANGE_IMG_PER_SEC
    print(json.dumps({
        "metric": "train_images_per_sec_per_chip",
        "value": round(imgs_per_sec_per_chip, 3),
        "unit": "img/s",
        "vs_baseline": round(imgs_per_sec_per_chip / REF_ESTIMATE_IMG_PER_SEC, 3),
        # bounds of the baseline estimate (see module docstring)
        "vs_baseline_range": [round(imgs_per_sec_per_chip / hi, 3),
                              round(imgs_per_sec_per_chip / lo, 3)],
    }))


if __name__ == "__main__":
    main()
