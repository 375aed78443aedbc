"""Micro-bench: fused talking-heads fwd+bwd vs einsum at recipe dims."""
import sys

from spe_tpu.utils.jax_setup import setup

setup()
import jax
import jax.numpy as jnp
import numpy as np

from spe_tpu.ops.pallas_attention import talking_heads_reference
from spe_tpu.ops.pallas_attention_bwd import fused_talking_heads
from spe_tpu.utils.timing import bench

H, N, dh = 4, 1024, 48
rng = np.random.default_rng(0)


def inputs(B):
    mk = lambda *s: jnp.array(rng.normal(size=s).astype(np.float32))
    return (mk(B, H, N, dh), mk(B, H, N, dh), mk(B, H, N, dh),
            mk(H, H) * 0.3, mk(H) * 0.1, mk(H, H) * 0.3, mk(H) * 0.1)


def run(B, q_tile, rate):
    args = inputs(B)
    seed = jnp.ones((1,), jnp.float32)

    @jax.jit
    def fb(*a):
        def loss(*aa):
            return jnp.sum(fused_talking_heads(*aa, seed, q_tile, False, rate) ** 2)
        return jax.value_and_grad(loss, argnums=(0, 1, 2, 3))(*a)

    try:
        ms = bench(fb, *args, iters=10)
        print(f"fused  B={B:3d} q_tile={q_tile:4d} rate={rate}: {ms:7.2f} ms")
    except Exception as e:
        print(f"fused  B={B:3d} q_tile={q_tile:4d} rate={rate}: FAIL "
              f"{type(e).__name__}: {str(e)[:180]}")


def run_einsum(B):
    args = inputs(B)

    @jax.jit
    def fb(*a):
        def loss(*aa):
            return jnp.sum(talking_heads_reference(*aa) ** 2)
        return jax.value_and_grad(loss, argnums=(0, 1, 2, 3))(*a)

    ms = bench(fb, *args, iters=10)
    print(f"einsum B={B:3d}: {ms:7.2f} ms")


if __name__ == "__main__":
    for B in (8, 16):
        run_einsum(B)
        for q_tile in (128, 256, 512):
            for rate in (0.0, 0.05):
                run(B, q_tile, rate)
