"""Memory ladder: XLA-estimated peak memory for large-config training under
{remat} x {DP / TP(model) shardings} on an 8-device virtual mesh.

The environment has ONE real chip, so large multi-chip configs can't be
executed — but XLA's compile-time memory analysis on a virtual 8-device CPU
mesh reports the per-device buffer budget the real pod would need
(arguments + temps + output), which is what decides whether a config fits
the 16GB v5e HBM. Results are recorded in PERF.md (max-config table).

Usage:
  python scripts_dev/memory_ladder.py [--config M48] [--img 448] [--batch 1]
"""

import argparse
import os
import re
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

N_DEV = 8
flags = os.environ.get("XLA_FLAGS", "")
if "host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + f" --xla_force_host_platform_device_count={N_DEV}").strip()
os.environ["JAX_PLATFORMS"] = "cpu"

import jax

jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp
import numpy as np
from jax.sharding import NamedSharding, PartitionSpec as P

from spe_tpu.config import SPEConfig
from spe_tpu.models.cait import CaiTConfig
from spe_tpu.models.detector import SPEDetector
from spe_tpu.parallel.mesh import make_mesh
from spe_tpu.parallel.sharding_rules import tp_param_shardings
from spe_tpu.train.optim import make_optimizer
from spe_tpu.train.train_step import Gates, TrainState, make_train_step

CONFIGS = {
    # name -> (embed, depth, heads, layer_to_det, init_scale-ish ignored)
    "M48": dict(embed_dim=768, depth=48, num_heads=16, layer_to_det=36),
    "M36": dict(embed_dim=768, depth=36, num_heads=16, layer_to_det=24),
    "XXS36": dict(embed_dim=192, depth=36, num_heads=4, layer_to_det=24),
    # depth-reduced stand-ins when full-depth compile is too slow for CI
    "M48d12": dict(embed_dim=768, depth=12, num_heads=16, layer_to_det=9),
}


def build(name, img, remat, num_classes=20):
    c = CONFIGS[name]
    cfg = SPEConfig(num_classes=num_classes, layer_to_det=c["layer_to_det"],
                    num_queries=300, enc_layers=3, dec_layers=6,
                    dim_feedforward=2048, nheads=8, num_refines=1,
                    max_gt_boxes=24, hung_match_ratio=5,
                    compute_dtype="bfloat16", dropout=0.0, max_size=img)
    bb = CaiTConfig(img_size=img, patch_size=16, embed_dim=c["embed_dim"],
                    depth=c["depth"], num_heads=c["num_heads"],
                    num_classes=num_classes, layer_to_det=c["layer_to_det"],
                    depth_token_only=2, remat=remat)
    model = SPEDetector(backbone_cfg=bb, num_det_classes=cfg.num_det_classes,
                        num_queries=300, num_refines=1, enc_layers=3,
                        dec_layers=6, dim_feedforward=2048, nheads=8,
                        dropout=0.0, dtype=jnp.bfloat16)
    return cfg, model


def analyze(name, img, batch_per_dev, remat, tp):
    cfg, model = build(name, img, remat)
    mesh = (make_mesh(num_data=N_DEV // tp, num_model=tp)
            if tp > 1 else make_mesh())
    B = batch_per_dev * (N_DEV // tp)
    imgs = jax.ShapeDtypeStruct((B, img, img, 3), jnp.float32)
    labels = jax.ShapeDtypeStruct((B, cfg.num_classes), jnp.float32)

    params = jax.eval_shape(
        lambda: model.init(jax.random.PRNGKey(0),
                           jnp.zeros((1, img, img, 3), jnp.float32)))
    # make_optimizer only walks the tree structure — struct leaves suffice
    tx = make_optimizer(cfg, steps_per_epoch=10, params=params)
    state_shape = jax.eval_shape(
        lambda p: TrainState(jnp.int32(0), p, tx.init(p), jnp.int32(0)), params)

    rules = tp_param_shardings(state_shape, mesh, cfg)
    b_sh = {"images": NamedSharding(mesh, P("data")),
            "img_label": NamedSharding(mesh, P("data"))}
    rep = NamedSharding(mesh, P())
    step = make_train_step(model, cfg, tx, num_devices=N_DEV // tp)

    t0 = time.time()
    lowered = jax.jit(step, in_shardings=(rules,  b_sh, rep, rep)).lower(
        state_shape, {"images": imgs, "img_label": labels},
        jax.ShapeDtypeStruct((2,), jnp.uint32),
        Gates(jnp.float32(1), jnp.float32(1), jnp.float32(0.2)))
    compiled = lowered.compile()
    dt = time.time() - t0
    ma = compiled.memory_analysis()
    GB = 1024**3
    try:
        args_b = ma.argument_size_in_bytes / GB
        temp_b = ma.temp_size_in_bytes / GB
        out_b = ma.output_size_in_bytes / GB
        peak = args_b + temp_b
    except AttributeError:
        print(ma)
        return
    print(f"{name}@{img} B{batch_per_dev}/dev remat={int(remat)} tp={tp}: "
          f"args {args_b:.2f} GB + temps {temp_b:.2f} GB "
          f"(out {out_b:.2f}) -> ~{peak:.2f} GB/dev  "
          f"[fits v5e-16GB: {'YES' if peak < 14.5 else 'NO'}]  "
          f"(compile {dt:.0f}s)", flush=True)


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--config", default="M48d12")
    p.add_argument("--img", type=int, default=448)
    p.add_argument("--batch", type=int, default=1)
    p.add_argument("--tp", type=int, default=None, help="run only this tp")
    p.add_argument("--remat", type=int, default=None, help="0/1: only this")
    args = p.parse_args()

    combos = []
    for remat in ((False, True) if args.remat is None else (bool(args.remat),)):
        for tp in ((1, 4) if args.tp is None else (args.tp,)):
            combos.append((remat, tp))
    for remat, tp in combos:
        try:
            analyze(args.config, args.img, args.batch, remat, tp)
        except Exception as e:
            print(f"{args.config} remat={remat} tp={tp}: FAILED {type(e).__name__}: {e}",
                  flush=True)


if __name__ == "__main__":
    main()
