"""Micro-bench: where does a CaiT LayerScaleBlock's time go on the chip?

Times (fwd and fwd+bwd) at recipe shape B8 x N1024 x D192/H4:
  - full block (pallas attention)
  - full block (einsum attention)
  - attention kernel alone (pre-split heads)
  - qkv+proj matmuls alone
  - MLP alone
  - LN+LayerScale+residual elementwise alone
Prints a table; run on the real TPU (no platform override).
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

from spe_tpu.models.cait import LayerScaleBlock

B, N, D, H = 8, 1024, 192, 4
DT = jnp.bfloat16


def timed(fn, *args, repeats=3, iters=20):
    out = fn(*args)
    jax.tree_util.tree_map(lambda x: np.asarray(x), out)  # sync
    best = 1e9
    for _ in range(repeats):
        t0 = time.time()
        for _ in range(iters):
            out = fn(*args)
        jax.tree_util.tree_map(lambda x: np.asarray(jnp.sum(x) if hasattr(x, 'dtype') else x), out)
        best = min(best, (time.time() - t0) / iters)
    return best * 1e3  # ms


def main():
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(B, N, D)), DT)

    rows = []
    for use_pallas in (True, False):
        blk = LayerScaleBlock(num_heads=H, use_pallas=use_pallas, dtype=DT)
        params = blk.init(jax.random.PRNGKey(0), x)

        fwd = jax.jit(lambda p, x: blk.apply(p, x))
        rows.append((f"block fwd ({'pallas' if use_pallas else 'einsum'})",
                     timed(fwd, params, x)))

        loss = jax.jit(jax.grad(
            lambda p, x: jnp.sum(blk.apply(p, x).astype(jnp.float32))))
        rows.append((f"block fwd+bwd ({'pallas' if use_pallas else 'einsum'})",
                     timed(loss, params, x)))

    # attention kernel alone
    from spe_tpu.ops.pallas_attention_bwd import fused_talking_heads

    qh = jnp.asarray(rng.normal(size=(B, H, N, D // H)), DT)
    wl = jnp.asarray(rng.normal(size=(H, H)), jnp.float32)
    bl = jnp.zeros((H,), jnp.float32)

    attn = jax.jit(lambda q, k, v: fused_talking_heads(
        q, k, v, wl, bl, wl, bl, None, 512, False, 0.0))
    rows.append(("attn kernel fwd", timed(attn, qh, qh, qh)))
    attn_g = jax.jit(jax.grad(lambda q: jnp.sum(fused_talking_heads(
        q, qh, qh, wl, bl, wl, bl, None, 512, False, 0.0).astype(jnp.float32))))
    rows.append(("attn kernel fwd+bwd(dq)", timed(attn_g, qh)))

    # dense parts alone
    w_qkv = jnp.asarray(rng.normal(size=(D, 3 * D)), DT)
    w_proj = jnp.asarray(rng.normal(size=(D, D)), DT)
    w1 = jnp.asarray(rng.normal(size=(D, 4 * D)), DT)
    w2 = jnp.asarray(rng.normal(size=(4 * D, D)), DT)

    dense = jax.jit(lambda x: (x @ w_qkv)[..., :D] @ w_proj)
    rows.append(("qkv+proj matmuls fwd", timed(dense, x)))
    mlp = jax.jit(lambda x: jax.nn.gelu(x @ w1) @ w2)
    rows.append(("mlp fwd", timed(mlp, x)))

    g1 = jnp.ones((D,), jnp.float32)
    elw = jax.jit(lambda x: x + g1 * jax.nn.standardize(x.astype(jnp.float32),
                                                        axis=-1).astype(DT))
    rows.append(("LN+scale+residual fwd", timed(elw, x)))

    for name, ms in rows:
        print(f"{name:36s} {ms:8.3f} ms  ({ms/B:6.3f} ms/img)")


if __name__ == "__main__":
    main()
