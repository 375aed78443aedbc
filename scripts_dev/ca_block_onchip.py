"""On-chip parity for the fused class-attention token block (VERDICT r4 #2).

Runs the fused CA block (ops/pallas_ca_block.py) against the flax
LayerScaleBlockClassAttn at the STOCK recipe dims (D=192, H=4, T=21,
P=1024, B=8) on the real TPU — forward (cls tokens AND the attention map,
i.e. the CAM source) and the full VJP including a cotangent through the
attention output. Same tolerances as tests/test_pallas_block.py's on-chip
variants (3e-4).

Usage: python scripts_dev/ca_block_onchip.py
"""

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from spe_tpu.utils.jax_setup import setup

setup()

import flax
import jax
import jax.numpy as jnp
import numpy as np

from spe_tpu.models.cait import LayerScaleBlockClassAttn

B, T, P, D, H = 8, 21, 1024, 192, 4


def main():
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(B, P, D)).astype(np.float32))
    cls = jnp.asarray(rng.normal(size=(B, T, D)).astype(np.float32))
    blk = LayerScaleBlockClassAttn(num_heads=H, num_tokens=T, init_scale=0.5)
    blk_f = LayerScaleBlockClassAttn(num_heads=H, num_tokens=T,
                                     init_scale=0.5, use_fused=True)
    p = blk.init(jax.random.PRNGKey(0), x, cls)

    @jax.jit
    def fwd_ref(p, x, cls):
        return blk.apply(p, x, cls, deterministic=True)

    @jax.jit
    def fwd_fused(p, x, cls):
        return blk_f.apply(p, x, cls, deterministic=True)

    ro, ra = fwd_ref(p, x, cls)
    fo, fa = fwd_fused(p, x, cls)
    np.testing.assert_allclose(np.asarray(fo), np.asarray(ro),
                               rtol=3e-4, atol=3e-4, err_msg="cls")
    np.testing.assert_allclose(np.asarray(fa), np.asarray(ra),
                               rtol=3e-4, atol=3e-4, err_msg="attn")
    print(f"FWD PARITY OK  max|dcls|={np.abs(np.asarray(fo - ro)).max():.2e} "
          f"max|dattn|={np.abs(np.asarray(fa - ra)).max():.2e}")

    def loss(layer, p, x, cls):
        out, attn = layer.apply(p, x, cls, deterministic=True)
        return (jnp.sum(jnp.sin(out.astype(jnp.float32)))
                + 0.1 * jnp.sum(jnp.sin(attn.astype(jnp.float32) * 3.0)))

    g_ref = jax.jit(jax.grad(lambda p, x, c: loss(blk, p, x, c),
                             argnums=(0, 1, 2)))(p, x, cls)
    g_fus = jax.jit(jax.grad(lambda p, x, c: loss(blk_f, p, x, c),
                             argnums=(0, 1, 2)))(p, x, cls)
    np.testing.assert_allclose(np.asarray(g_fus[1]), np.asarray(g_ref[1]),
                               rtol=3e-4, atol=3e-4, err_msg="dx")
    np.testing.assert_allclose(np.asarray(g_fus[2]), np.asarray(g_ref[2]),
                               rtol=3e-4, atol=3e-4, err_msg="dcls")
    fr = flax.traverse_util.flatten_dict(g_ref[0]["params"], sep="/")
    ff = flax.traverse_util.flatten_dict(g_fus[0]["params"], sep="/")
    assert set(fr) == set(ff)
    # tensor-scale relative tolerance: at B8 x 1024 tokens the f32-accum
    # reduction ORDER differs between the fused kernel (tile-loop partial
    # sums) and XLA's grads, so per-element rtol is ill-posed for
    # near-zero elements; what parity means is max|dev| small vs the
    # tensor's own scale (3e-4, same bar as the block kernel's tests)
    failures = []
    for k in sorted(fr):
        a, b = np.asarray(ff[k], np.float64), np.asarray(fr[k], np.float64)
        rel = np.abs(a - b).max() / max(np.abs(b).max(), 1e-9)
        print(f"  {k}: max|d|={np.abs(a - b).max():.2e} "
              f"ref_absmax={np.abs(b).max():.2e} tensor_rel={rel:.2e}")
        if rel > 3e-4:
            failures.append((k, rel))
    assert not failures, failures
    print("VJP PARITY OK (all param grads within 3e-4 tensor-scale rel)")
    print("CA BLOCK ON-CHIP PARITY OK (B8, T21, P1024, D192, H4)")


if __name__ == "__main__":
    main()
