"""Fused talking-heads attention (Pallas TPU kernel).

The CaiT patch blocks' attention (reference models/cait.py:344-393) is
logits -> head-mix (proj_l) -> softmax -> head-mix (proj_w) -> @V. The
XLA path materializes two (B, H, N, N) tensors to HBM per block (67MB each
at the published B8/N1024/bf16) — the dominant HBM traffic of the backbone.

This kernel keeps everything in VMEM: grid over (batch, q_tile); per tile
it loads a (H, Tq, dh) query block plus the full K/V (N=1024, dh=48 ->
~1.6MB), computes all-head logits for the tile, mixes heads (H x H einsum —
head mixing needs all heads simultaneously, which is why the grid cannot
split heads), applies a full-row softmax (no online rescaling needed since
the whole key axis is resident), mixes again, and multiplies by V.

v1 is forward/deterministic (no attention dropout) and is used on the
inference/eval path behind `use_pallas_attention`; the training path keeps
the einsum implementation until the backward kernel lands.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _kernel(q_ref, k_ref, v_ref, wl_ref, bl_ref, ww_ref, bw_ref, seed_ref,
            o_ref, *, dropout_rate: float = 0.0):
    # q_ref: (1, H, Tq, dh); k_ref/v_ref: (1, H, N, dh); wl/ww: (H, H); bl/bw: (H, 1)
    # MXU discipline: dot operands stay in the INPUT dtype (bf16 under the
    # recipe's compute_dtype -> native MXU rate) with f32 accumulation via
    # preferred_element_type; softmax/mixing run f32 on the VPU.
    q = q_ref[0]
    k = k_ref[0]
    v = v_ref[0]
    dh = q.shape[-1]
    scale = dh ** -0.5

    H = q.shape[0]
    # per-head QK^T (python loop over the tiny static head dim: Mosaic
    # cannot lower batched/head-contracting dot_generals in one op)
    logits = [jax.lax.dot_general(
        q[h], k[h],
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32) * scale for h in range(H)]  # H x (Tq, N)

    def mix(parts, w_ref, b_ref):
        # out_g = sum_h parts[h] * w[h, g] + b[g], unrolled scalar-weighted sums
        out = []
        for g in range(H):
            s = parts[0] * w_ref[0, g]
            for h in range(1, H):
                s = s + parts[h] * w_ref[h, g]
            out.append(s + b_ref[g, 0])
        return out

    mixed = mix(logits, wl_ref, bl_ref)
    probs = []
    for g in range(H):
        m = jnp.max(mixed[g], axis=-1, keepdims=True)
        p = jnp.exp(mixed[g] - m)
        probs.append(p / jnp.sum(p, axis=-1, keepdims=True))

    p2 = mix(probs, ww_ref, bw_ref)
    if dropout_rate > 0.0:
        # attention dropout AFTER the second mixing (reference cait.py:387);
        # seed is deterministic per (batch, q_tile) so the backward kernel
        # regenerates the identical mask
        b = pl.program_id(0)
        t = pl.program_id(1)
        pltpu.prng_seed(seed_ref[0].astype(jnp.int32) + b * 65536 + t)
        p2 = _apply_dropout(p2, dropout_rate)
    for j in range(H):
        out = jax.lax.dot_general(
            p2[j].astype(v.dtype), v[j],
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)    # (Tq, dh)
        o_ref[0, j] = out.astype(o_ref.dtype)


def _dropout_masks(shape, n: int, rate: float):
    """n keep-masks of `shape` from ceil(n/4) uint32 draws: each mask uses a
    distinct byte plane (8-bit threshold => keep_prob quantized to 1/256,
    e.g. rate 0.05 -> 0.0508). 4x less PRNG traffic than per-mask draws.
    Call pltpu.prng_seed first; generation order is part of the fwd/bwd
    mask-identity contract."""
    thresh_i = int((1.0 - rate) * 255.0)
    thresh = jnp.uint32(thresh_i)
    # exact quantized keep probability: P(byte <= thresh) = (thresh+1)/256;
    # scaling by it keeps the estimator unbiased (measured on-device)
    keep_prob = (thresh_i + 1) / 256.0
    masks = []
    for i in range(0, n, 4):
        bits = pltpu.bitcast(pltpu.prng_random_bits(shape), jnp.uint32)
        for b in range(min(4, n - i)):
            plane = (bits >> jnp.uint32(8 * b)) & jnp.uint32(0xFF)
            masks.append(plane <= thresh)
    return masks, keep_prob


def _apply_dropout(parts, rate: float):
    """Inverted dropout on a list of (Tq, N) tiles using the TPU PRNG
    (call pltpu.prng_seed first)."""
    masks, keep_prob = _dropout_masks(parts[0].shape, len(parts), rate)
    return [jnp.where(m, p / keep_prob, 0.0) for p, m in zip(parts, masks)]


@functools.partial(jax.jit, static_argnames=("q_tile", "interpret", "dropout_rate"))
def talking_heads_attention(q, k, v, wl, bl, ww, bw, seed=None, *,
                            q_tile: int = 256, interpret: bool = False,
                            dropout_rate: float = 0.0):
    """q/k/v: (B, H, N, dh); wl/ww: (H, H) mixing matrices (our layout:
    out_g = sum_h x_h * w[h, g]); bl/bw: (H,). Returns (B, H, N, dh).

    Matches TalkingHeadsAttention's einsum path (pre-proj output).
    `dropout_rate` > 0 applies attention dropout in-kernel via the TPU PRNG
    seeded from `seed` (int32 scalar array).
    """
    B, H, N, dh = q.shape
    q_tile = min(q_tile, N)
    grid = (B, N // q_tile)
    bl2 = bl.reshape(H, 1)
    bw2 = bw.reshape(H, 1)
    if seed is None:
        seed = jnp.zeros((1,), jnp.float32)
    # float carrier so custom_vjp can hand back an ordinary zero cotangent
    seed = jnp.asarray(seed, jnp.float32).reshape(1)

    return pl.pallas_call(
        functools.partial(_kernel, dropout_rate=dropout_rate),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, H, q_tile, dh), lambda b, i: (b, 0, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, H, N, dh), lambda b, i: (b, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, H, N, dh), lambda b, i: (b, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((H, H), lambda b, i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((H, 1), lambda b, i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((H, H), lambda b, i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((H, 1), lambda b, i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ],
        out_specs=pl.BlockSpec((1, H, q_tile, dh), lambda b, i: (b, 0, i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, H, N, dh), q.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel"),
            vmem_limit_bytes=100 * 1024 * 1024),
        # bool -> TPU-semantics interpreter (emulates pltpu primitives on CPU)
        interpret=pltpu.InterpretParams() if interpret else False,
    )(q, k, v, wl, bl2, ww, bw2, seed)


def talking_heads_reference(q, k, v, wl, bl, ww, bw):
    """The einsum path (mirrors models/attention.py TalkingHeadsAttention)."""
    dh = q.shape[-1]
    qf = q.astype(jnp.float32) * dh ** -0.5
    logits = jnp.einsum("bhqd,bhkd->bhqk", qf, k.astype(jnp.float32))
    logits = jnp.einsum("bhqk,hg->bgqk", logits, wl.astype(jnp.float32))
    logits = logits + bl.astype(jnp.float32)[None, :, None, None]
    attn = jax.nn.softmax(logits, axis=-1)
    attn = jnp.einsum("bhqk,hg->bgqk", attn, ww.astype(jnp.float32))
    attn = attn + bw.astype(jnp.float32)[None, :, None, None]
    return jnp.einsum("bhqk,bhkd->bhqd", attn, v.astype(jnp.float32)).astype(q.dtype)
