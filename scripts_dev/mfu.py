"""Compute MFU for the recipe train step (VERDICT r3 #3).

FLOPs come from XLA's own cost analysis of the COMPILED step (not a paper
estimate), so rematerialization and the fused-kernel bodies are counted as
executed. MFU = (flops/step) / step_time / peak, peak = 197 TFLOP/s bf16
on TPU v5e (one chip).

Caveat: cost_analysis counts Pallas custom-call bodies only if XLA sees
through them; for the fused kernels it reports the custom call's declared
cost (we also print the analytic model-FLOPs estimate for cross-checking).

Usage: python scripts_dev/mfu.py [step_ms]
  step_ms: measured step time in ms (e.g. from bench.py); if omitted, the
  step is timed here (median of 3 groups of 8, pipelined, host-synced).
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from spe_tpu.utils.jax_setup import setup

setup()

import jax
import jax.numpy as jnp
import numpy as np

BATCH = 8
IMG = 512
PEAK_BF16 = 197e12  # TPU v5e per-chip dense bf16


def analytic_model_flops(B=BATCH, N=1024, D=192, depth=48, dec_layers=6,
                         Q=300, enc_layers=3, ffn=2048, n_cls=21):
    """fwd+bwd matmul FLOPs of the recipe model (2*M*N*K per matmul; bwd =
    2x fwd). Talking-heads CaiT blocks + class-attn + enc/dec + heads."""
    blk = (3 * 2 * N * D * D      # qkv
           + 2 * 2 * N * D * D    # proj + (approx) head-mixing pair
           + 2 * 2 * N * N * D    # scores + weighted sum
           + 2 * 2 * N * D * 4 * D)  # mlp (ratio 4)
    enc = (4 * 2 * N * D * D + 2 * 2 * N * N * D + 2 * 2 * N * D * ffn)
    dec = (8 * 2 * Q * D * D               # self/cross projections
           + 2 * 2 * Q * N * (2 * D)      # cross-attn at 2*d_model
           + 2 * 2 * Q * D * ffn)
    ca = 2 * (4 * 2 * (N + n_cls) * D * D + 2 * 2 * n_cls * (N + n_cls) * D)
    fwd = B * (depth * blk + ca + enc_layers * enc + 2 * dec_layers * dec)
    return 3 * fwd  # fwd + ~2x for bwd


def main():
    from spe_tpu.config import voc0712_preset
    from spe_tpu.models.build import build_model
    from spe_tpu.parallel.mesh import make_mesh, replicated, shard_batch
    from spe_tpu.train.optim import make_optimizer
    from spe_tpu.train.train_step import Gates, TrainState, make_train_step

    cfg = voc0712_preset(batch_size=BATCH)
    model = build_model(cfg)
    mesh = make_mesh()
    rng = np.random.default_rng(0)
    img_label = (rng.uniform(size=(BATCH, cfg.num_classes)) > 0.85).astype(np.float32)
    img_label[:, 0] = 1.0
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
    step = jax.jit(make_train_step(model, cfg, tx, num_devices=1),
                   out_shardings=(rep, rep), donate_argnums=(0,))
    gates = Gates.for_epoch(cfg, epoch=20)

    compiled = step.lower(state, batch, jax.random.PRNGKey(1), gates).compile()
    ca = compiled.cost_analysis()
    ca = ca[0] if isinstance(ca, (list, tuple)) else ca
    xla_flops = float(ca.get("flops", float("nan")))

    if len(sys.argv) > 1:
        step_ms = float(sys.argv[1])
    else:
        key = jax.random.PRNGKey(0)
        for i in range(2):
            state, m = compiled(state, batch, jax.random.fold_in(key, i), gates)
        _ = float(m["loss"])
        rates = []
        for g in range(3):
            t0 = time.time()
            for i in range(8):
                state, m = compiled(state, batch,
                                    jax.random.fold_in(key, 100 + g * 100 + i),
                                    gates)
            _ = float(m["loss"])
            rates.append((time.time() - t0) / 8)
        step_ms = float(np.median(rates)) * 1e3

    est = analytic_model_flops()
    print(f"step_ms            : {step_ms:.1f}")
    print(f"img/s/chip         : {BATCH / (step_ms / 1e3):.1f}")
    print(f"XLA cost_analysis  : {xla_flops/1e12:.3f} TFLOP/step "
          f"({xla_flops/BATCH/1e9:.0f} GFLOP/img)")
    print(f"analytic model est : {est/1e12:.3f} TFLOP/step "
          f"({est/BATCH/1e9:.0f} GFLOP/img; fwd+bwd matmuls only)")
    for name, fl in (("xla", xla_flops), ("analytic", est)):
        mfu = fl / (step_ms / 1e3) / PEAK_BF16
        print(f"MFU ({name:8s})     : {100*mfu:.1f}%  "
              f"({fl/(step_ms/1e3)/1e12:.1f} TFLOP/s of {PEAK_BF16/1e12:.0f} peak)")


if __name__ == "__main__":
    main()
