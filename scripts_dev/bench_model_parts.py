"""Model-part attribution with the scan-inside-one-jit protocol
(bench_calibrate.py): each row runs K iterations of the part inside ONE
dispatch, so the ~25ms/dispatch axon tunnel RPC cannot pollute rows.

Rows (recipe shape, stock voc0712 preset dims, B8 512^2):
  backbone fwd / fwd+bwd          48 fused CaiT blocks + class-attn + CAM
  transformer fwd / fwd+bwd       enc3 + dec6 x 2 query sets (batched)
  model fwd / fwd+bwd             the whole SPEDetector
  pieces: class-attn blocks, encoder stack, decoder stack

Usage (real TPU): python scripts_dev/bench_model_parts.py
"""

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from spe_tpu.utils.jax_setup import setup

setup()

import jax
import jax.numpy as jnp
import numpy as np

B = 8
IMG = 512


def timed_scan(op, args, iters=8, repeats=3):
    @jax.jit
    def run(args):
        def body(c, i):
            out = op(*jax.tree_util.tree_map(
                lambda a: (a + (i.astype(a.dtype) * 1e-6)
                           if jnp.issubdtype(a.dtype, jnp.inexact) else a),
                args))
            dig = sum(jnp.sum(l.astype(jnp.float32)) * 1e-30
                      for l in jax.tree_util.tree_leaves(out))
            return c + dig, None

        c, _ = jax.lax.scan(body, jnp.float32(0), jnp.arange(iters))
        return c

    float(run(args))
    best = 1e18
    for _ in range(repeats):
        t0 = time.time()
        float(run(args))
        best = min(best, time.time() - t0)
    return best / iters * 1e3


def main():
    from spe_tpu.config import voc0712_preset
    from spe_tpu.models.build import build_model

    cfg = voc0712_preset(batch_size=B)
    model = build_model(cfg)
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(B, IMG, IMG, 3)), jnp.float32)
    params = jax.jit(lambda: model.init(jax.random.PRNGKey(0), x))()

    rows = []

    # ---- full model ----
    rows.append(("model fwd", timed_scan(
        lambda xx: model.apply(params, xx), (x,))))

    def loss_all(xx):
        o = model.apply(params, xx)
        t = jnp.float32(0)
        for r, st in o["stages"].items():
            t += jnp.sum(st["pred_logits"].astype(jnp.float32))
            t += jnp.sum(st["pred_boxes"].astype(jnp.float32))
            t += jnp.sum(st["aux_pred_logits"].astype(jnp.float32))
        t += jnp.sum(o["backbone"]["x_logits"])
        return t

    rows.append(("model fwd+bwd(x)", timed_scan(
        jax.grad(loss_all), (x,), iters=6)))

    # ---- backbone only ----
    from spe_tpu.models.cait import CaiTTwoBranch, build_cait_config

    bbcfg = build_cait_config(cfg.backbone, num_classes=cfg.num_classes,
                             layer_to_det=cfg.layer_to_det,
                             use_fused_block=True)
    bb = CaiTTwoBranch(bbcfg, dtype=jnp.bfloat16)
    xb = x.astype(jnp.bfloat16)
    bparams = jax.jit(lambda: bb.init(jax.random.PRNGKey(0), xb))()
    rows.append(("backbone fwd", timed_scan(
        lambda xx: bb.apply(bparams, xx), (xb,))))

    def bb_loss(xx):
        o = bb.apply(bparams, xx)
        return (jnp.sum(o["x_patch"].astype(jnp.float32)) +
                jnp.sum(o["x_logits"]) + jnp.sum(o["x_cls_logits"]) +
                jnp.sum(jax.lax.stop_gradient(o["cams_cls"])))

    rows.append(("backbone fwd+bwd(x)", timed_scan(
        jax.grad(bb_loss), (xb,), iters=6)))

    # patch-stack only: 48 fused blocks, no class-attn / CAM / patch-embed
    from spe_tpu.models.cait import LayerScaleBlock
    import flax.linen as nn

    class PatchStack(nn.Module):
        n: int

        @nn.compact
        def __call__(self, x):
            for i in range(self.n):
                x = LayerScaleBlock(num_heads=4, use_fused=True,
                                    dtype=jnp.bfloat16, name=f"b{i}")(x, True)
            return x

    xt = jnp.asarray(rng.normal(size=(B, 1024, 192)), jnp.bfloat16)
    st = PatchStack(48)
    sparams = jax.jit(lambda: st.init(jax.random.PRNGKey(0), xt))()
    rows.append(("48 fused blocks fwd", timed_scan(
        lambda xx: st.apply(sparams, xx), (xt,))))
    rows.append(("48 fused blocks fwd+bwd(x)", timed_scan(
        jax.grad(lambda xx: jnp.sum(
            st.apply(sparams, xx).astype(jnp.float32))), (xt,), iters=6)))
    rows.append(("48 fused blocks fwd+bwd(p,x)", timed_scan(
        lambda xx: jax.grad(
            lambda p, z: jnp.sum(st.apply(p, z).astype(jnp.float32)),
            argnums=(0, 1))(sparams, xx), (xt,), iters=6)))

    # ---- transformer only (enc3 + dec6 over 2 query sets) ----
    from spe_tpu.models.transformer import ConditionalTransformer

    tr = ConditionalTransformer(
        d_model=192, num_heads=cfg.nheads, num_encoder_layers=cfg.enc_layers,
        num_decoder_layers=cfg.dec_layers, dim_feedforward=cfg.dim_feedforward,
        dropout=0.0, num_queries=cfg.num_queries, num_refines=cfg.num_refines,
        use_pallas=True, use_fused_layers=True, dtype=jnp.bfloat16)
    src = jnp.asarray(rng.normal(size=(B, 1024, 192)), jnp.bfloat16)
    pos = jnp.asarray(rng.normal(size=(B, 1024, 192)), jnp.bfloat16)
    tparams = jax.jit(lambda: tr.init(jax.random.PRNGKey(0), src, pos))()
    rows.append(("transformer fwd", timed_scan(
        lambda s, p: tr.apply(tparams, s, p), (src, pos))))

    def tr_loss(s, p):
        out = tr.apply(tparams, s, p)
        return sum(jnp.sum(l.astype(jnp.float32))
                   for l in jax.tree_util.tree_leaves(out))

    rows.append(("transformer fwd+bwd(x)", timed_scan(
        jax.grad(tr_loss, argnums=(0, 1)), (src, pos), iters=6)))
    rows.append(("transformer fwd+bwd(p,x)", timed_scan(
        lambda s, p: jax.grad(
            lambda tp, ss, pp: sum(
                jnp.sum(l.astype(jnp.float32)) for l in
                jax.tree_util.tree_leaves(tr.apply(tp, ss, pp))),
            argnums=(0, 1, 2))(tparams, s, p), (src, pos), iters=6)))

    for name, ms in rows:
        print(f"{name:32s} {ms:8.2f} ms  ({ms/B:6.2f} ms/img)", flush=True)


if __name__ == "__main__":
    main()
