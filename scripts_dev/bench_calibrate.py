"""MXU calibration at recipe shapes: what TFLOP/s can THIS chip actually
reach on the matmuls the CaiT block is made of, and how far from that is
the fused block kernel?

Measurement protocol for the axon tunnel (measured 2026-08): EVERY dispatch
pays a ~25ms RPC, and dispatch RPCs do not overlap — so anything under
~25ms/call cannot be timed by pipelining calls. Instead each row runs the
op K times inside ONE jit via lax.scan (carry = f32 digest of the output,
input perturbed per-iteration to defeat CSE) and subtracts the cost of an
empty scan of the same length.

Usage (real TPU): python scripts_dev/bench_calibrate.py
"""

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from spe_tpu.utils.jax_setup import setup

setup()

import functools
import time

import jax
import jax.numpy as jnp
import numpy as np

B, N, D, H = 8, 1024, 192, 4
dh = D // H
DT = jnp.bfloat16
K_ITERS = 32


def timed_scan(op, args, iters=K_ITERS, repeats=3):
    """ms per op call: run `op(*args)` `iters` times inside one jit."""

    @jax.jit
    def run(args):
        def body(c, i):
            out = op(*jax.tree_util.tree_map(
                lambda a: (a + (i.astype(a.dtype) * 1e-6
                                if jnp.issubdtype(a.dtype, jnp.inexact) else 0)),
                args))
            dig = sum(jnp.sum(l.astype(jnp.float32)) * 1e-30
                      for l in jax.tree_util.tree_leaves(out))
            return c + dig, None

        c, _ = jax.lax.scan(body, jnp.float32(0), jnp.arange(iters))
        return c

    float(run(args))  # compile + warm
    best = 1e18
    for _ in range(repeats):
        t0 = time.time()
        float(run(args))
        best = min(best, time.time() - t0)
    return best / iters * 1e3


_BASE = None


def base_overhead():
    global _BASE
    if _BASE is None:
        z = jnp.zeros((8, 128), DT)
        _BASE = timed_scan(lambda a: a * 1.0, (z,)) * K_ITERS
    return _BASE


def row(name, ms_raw, flops):
    ms = ms_raw - base_overhead() / K_ITERS
    print(f"{name:28s} {ms:8.3f} ms   {flops / max(ms, 1e-9) * 1e-9:7.1f} TFLOP/s")


def main():
    rng = np.random.default_rng(0)

    def mk(*shape):
        return jnp.asarray(rng.normal(size=shape), DT)

    print(f"# dispatch+scan base overhead: {base_overhead():.2f} ms "
          f"(subtracted /iter)")

    def mm(a, b):
        return jax.lax.dot_general(
            a, b, (((a.ndim - 1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32).astype(DT)

    a, b = mk(4096, 4096), mk(4096, 4096)
    row("peak 4096^3", timed_scan(mm, (a, b), iters=16), 2 * 4096**3)

    M = B * N
    for name, (ka, kb) in {
        "qkv (Mx192x576)": ((M, D), (D, 3 * D)),
        "mlp1 (Mx192x768)": ((M, D), (D, 4 * D)),
        "mlp2 (Mx768x192)": ((M, 4 * D), (4 * D, D)),
        "proj (Mx192x192)": ((M, D), (D, D)),
    }.items():
        row(name, timed_scan(mm, (mk(*ka), mk(*kb))), 2 * ka[0] * ka[1] * kb[1])

    q, k, v = mk(B, H, N, dh), mk(B, H, N, dh), mk(B, H, N, dh)
    row("head_qk (K=48)",
        timed_scan(lambda q, k: jnp.einsum(
            "bhqd,bhkd->bhqk", q, k,
            preferred_element_type=jnp.float32).astype(DT), (q, k)),
        2 * B * H * N * N * dh)
    p = mk(B, H, N, N)
    row("head_av (out=48)",
        timed_scan(lambda p, v: jnp.einsum(
            "bhqk,bhkd->bhqd", p, v,
            preferred_element_type=jnp.float32).astype(DT), (p, v)),
        2 * B * H * N * N * dh)

    def attn(q, k, v):
        s = jnp.einsum("bhqd,bhkd->bhqk", q, k,
                       preferred_element_type=jnp.float32) * (dh ** -0.5)
        pr = jax.nn.softmax(s, axis=-1)
        return jnp.einsum("bhqk,bhkd->bhqd", pr.astype(DT), v,
                          preferred_element_type=jnp.float32).astype(DT)

    row("attn_full (xla)", timed_scan(attn, (q, k, v)), 4 * B * H * N * N * dh)

    # ---- whole blocks ----
    from spe_tpu.models.cait import LayerScaleBlock

    x = mk(B, N, D)
    gflop = 2.38e9 * B
    for use_fused, tag in ((True, "fused"), (False, "xla")):
        blk = LayerScaleBlock(num_heads=H, use_fused=use_fused, dtype=DT)
        params = blk.init(jax.random.PRNGKey(0), x)
        row(f"block_fwd ({tag})",
            timed_scan(lambda xx: blk.apply(params, xx), (x,)), gflop)

        def fwd_bwd(xx):
            return jax.grad(lambda z: jnp.sum(
                blk.apply(params, z).astype(jnp.float32)))(xx)

        row(f"block_fwd+bwd ({tag})", timed_scan(fwd_bwd, (x,), iters=16),
            3 * gflop)


if __name__ == "__main__":
    main()
