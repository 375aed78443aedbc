"""Model-part timing at the recipe shape on the REAL chip (idle host!):
backbone-only vs full model, fwd and fwd+bwd — locates the residual time
after the whole-block fusion (patch stack vs encoder/decoder/heads)."""

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from spe_tpu.utils.jax_setup import setup

setup()

import jax
import jax.numpy as jnp
import numpy as np

from spe_tpu.config import voc0712_preset
from spe_tpu.models.build import build_model
from spe_tpu.models.cait import CaiTTwoBranch

B, IMG = 8, 512


def timed(fn, *args, iters=12, repeats=3):
    out = fn(*args)
    jax.tree_util.tree_map(lambda x: np.asarray(x), out)
    best = 1e9
    for _ in range(repeats):
        t0 = time.time()
        for _ in range(iters):
            out = fn(*args)
        jax.tree_util.tree_map(lambda x: np.asarray(x), out)
        best = min(best, (time.time() - t0) / iters)
    return best * 1e3


def main():
    cfg = voc0712_preset(batch_size=B)
    model = build_model(cfg)
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(B, IMG, IMG, 3)).astype(np.float32))
    params = jax.jit(lambda: model.init(jax.random.PRNGKey(0), x[:1]))()

    bb = CaiTTwoBranch(model.backbone_cfg, dtype=jnp.bfloat16)
    bb_params = {"params": params["params"]["backbone"]}

    rows = []
    f_bb = jax.jit(lambda p, x: bb.apply(p, x.astype(jnp.bfloat16)))
    rows.append(("backbone fwd", timed(f_bb, bb_params, x)))

    # Mirror the train step's gradient structure: cams_cls is consumed
    # under stop_gradient there (train_step.py:74), so the CAM/rollout
    # backward never runs in training and must not be timed here.
    def bb_loss(p, x):
        o = bb.apply(p, x.astype(jnp.bfloat16))
        return (jnp.sum(o["x_logits"]) + jnp.sum(o["x_cls_logits"])
                + jnp.sum(o["x_patch"].astype(jnp.float32)))

    g_bb = jax.jit(jax.grad(bb_loss))
    rows.append(("backbone fwd+bwd", timed(g_bb, bb_params, x)))

    # Same gradient, but only a SCALAR leaves the device: through the axon
    # tunnel, returning the full ~500-leaf grad tree costs per-buffer
    # dispatch/transfer overhead that the donated train step never pays.
    # If this row is fast while the row above is slow, the kernels are fine
    # and the tree-output rows measure tunnel overhead, not compute.
    def g_bb_norm(p, x):
        g = jax.grad(bb_loss)(p, x)
        return sum(jnp.vdot(v, v) for v in jax.tree_util.tree_leaves(g))

    rows.append(("backbone fwd+bwd (scalar out)",
                 timed(jax.jit(g_bb_norm), bb_params, x)))

    # The pathological variant (grad THROUGH cams_cls) for reference: it
    # measured 262 ms/img on chip — backward through the first class-attn
    # block's returned attention map is catastrophically slow and must
    # stay stop-gradiented in any real loss.
    if False:
        g_cam = jax.jit(jax.grad(lambda p, x: jnp.sum(
            bb.apply(p, x.astype(jnp.bfloat16))["cams_cls"])))
        rows.append(("backbone cam bwd", timed(g_cam, bb_params, x)))

    f_all = jax.jit(lambda p, x: model.apply(p, x))
    rows.append(("full model fwd", timed(f_all, params, x)))

    def loss_all(p, x):
        o = model.apply(p, x)
        t = jnp.float32(0)
        for r, st in o["stages"].items():
            t += jnp.sum(st["pred_logits"].astype(jnp.float32))
            t += jnp.sum(st["pred_boxes"].astype(jnp.float32))
            t += jnp.sum(st["aux_pred_logits"].astype(jnp.float32))
        t += jnp.sum(o["backbone"]["x_logits"])
        t += jnp.sum(jax.lax.stop_gradient(o["backbone"]["cams_cls"]))
        return t

    g_all = jax.jit(jax.grad(loss_all))
    rows.append(("full model fwd+bwd", timed(g_all, params, x)))

    def g_all_norm(p, x):
        g = jax.grad(loss_all)(p, x)
        return sum(jnp.vdot(v, v) for v in jax.tree_util.tree_leaves(g))

    rows.append(("full model fwd+bwd (scalar out)",
                 timed(jax.jit(g_all_norm), params, x)))

    for name, ms in rows:
        print(f"{name:22s} {ms:8.2f} ms  ({ms/B:6.2f} ms/img)", flush=True)
    d = dict(rows)
    print(f"transformer+heads fwd+bwd ≈ "
          f"{d['full model fwd+bwd'] - d['backbone fwd+bwd']:.1f} ms")


if __name__ == "__main__":
    main()
