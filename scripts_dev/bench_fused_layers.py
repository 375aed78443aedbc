"""Focused chip A/B for the whole-layer fused encoder/decoder kernels and
the training-mode dropout cost. Scalar-output grads only (returning grad
trees through the axon tunnel costs seconds of per-buffer overhead)."""

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from spe_tpu.utils.jax_setup import setup

setup()

import jax
import jax.numpy as jnp
import numpy as np

from spe_tpu.config import voc0712_preset
from spe_tpu.models.build import build_model
from spe_tpu.utils.timing import bench

B, IMG = 8, 512


def scalar_grad(loss):
    def f(*a):
        g = jax.grad(loss)(*a)
        return sum(jnp.vdot(v, v) for v in jax.tree_util.tree_leaves(g))
    return jax.jit(f)


def model_loss(model, train):
    def loss(p, x, k):
        out = model.apply(p, x, deterministic=not train,
                          rngs={"dropout": k} if train else None)
        s = 0.0
        for st in out["stages"].values():
            s = s + jnp.sum(st["pred_logits"].astype(jnp.float32) ** 2) \
                  + jnp.sum(st["pred_boxes"].astype(jnp.float32) ** 2)
        s = s + jnp.sum(jax.lax.stop_gradient(
            out["backbone"]["cams_cls"]).astype(jnp.float32) ** 2)
        s = s + jnp.sum(out["backbone"]["x_logits"].astype(jnp.float32) ** 2)
        return s
    return loss


def main():
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(B, IMG, IMG, 3)).astype(np.float32))
    key = jax.random.PRNGKey(7)

    base = build_model(voc0712_preset(batch_size=B))
    params = jax.jit(lambda: base.init(jax.random.PRNGKey(0), x[:1]))()

    variants = [
        ("stock", voc0712_preset(batch_size=B)),
        ("fused enc/dec", voc0712_preset(batch_size=B, use_fused_layers=True)),
    ]
    for name, cfg in variants:
        m = build_model(cfg)
        try:
            g = scalar_grad(model_loss(m, train=True))
            ms = bench(g, params, x, key, iters=8)
            print(f"f+b   {name:34s} {ms:8.1f} ms  ({ms/B:5.2f} ms/img)", flush=True)
        except Exception as e:
            print(f"f+b   {name:34s} FAILED: {str(e)[:200]}", flush=True)


if __name__ == "__main__":
    main()
