"""Backward kernel for the fused talking-heads attention + custom_vjp wiring.

Forward math (spe_tpu/ops/pallas_attention.py):
  L_h   = scale * Q_h K_h^T
  M_g   = sum_h Wl[h,g] L_h + bl[g]
  P_g   = softmax_k(M_g)
  P2_j  = sum_g Ww[g,j] P_g + bw[j]
  Y_j   = P2_j V_j

Backward (derived by hand, verified against jax.grad of the einsum path):
  dV_j  = P2_j^T dY_j
  dP2_j = dY_j V_j^T
  dP_g  = sum_j Ww[g,j] dP2_j ;  dWw[g,j] = <P_g, dP2_j> ;  dbw[j] = sum dP2_j
  dM_g  = P_g * (dP_g - rowsum(dP_g * P_g))
  dL_h  = sum_g Wl[h,g] dM_g ;  dWl[h,g] = <L_h, dM_g> ;  dbl[g] = sum dM_g
  dQ_h  = scale * dL_h K_h ;  dK_h = scale * dL_h^T Q_h

Kernel layout: grid over (batch, q_tile) — the q-tile axis is innermost, so
dK/dV (VMEM) and the mixing-matrix grads (SMEM) map to the same output block
across all tiles of a batch element and accumulate in place (TPU grids run
sequentially; blocks are revisited, not re-fetched). Per grid step only a
(H, Tq, dh) slice of Q/dY is resident plus the full K/V rows, and the
recompute of L/P per tile is flash-style — nothing N^2 ever reaches HBM.
VMEM is therefore independent of batch size (the round-1 layout gridded
over batch only and tripped scoped-VMEM at B=16).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from spe_tpu.ops.pallas_attention import talking_heads_attention


def _bwd_kernel(q_ref, k_ref, v_ref, wl_ref, bl_ref, ww_ref, bw_ref, seed_ref,
                dy_ref, dq_ref, dk_ref, dv_ref, dwl_ref, dbl_ref, dww_ref,
                dbw_ref, *, q_tile: int, dropout_rate: float = 0.0):
    H = q_ref.shape[1]
    dh = q_ref.shape[3]
    scale = dh ** -0.5
    t = pl.program_id(1)

    # dot operands keep the input dtype (bf16 -> native MXU rate) with f32
    # accumulation; VPU math (softmax, mixing, dropout) stays f32
    k = [k_ref[0, h] for h in range(H)]
    v = [v_ref[0, h] for h in range(H)]

    # zero accumulators on the first q-tile of each batch element (the
    # accumulator blocks are revisited across the inner tile axis; scalar
    # grads live in SMEM: scalar stores only)
    @pl.when(t == 0)
    def _init():
        dk_ref[...] = jnp.zeros_like(dk_ref)
        dv_ref[...] = jnp.zeros_like(dv_ref)
        for a in range(H):
            dbl_ref[0, a, 0] = jnp.float32(0)
            dbw_ref[0, a, 0] = jnp.float32(0)
            for b in range(H):
                dwl_ref[0, a, b] = jnp.float32(0)
                dww_ref[0, a, b] = jnp.float32(0)

    def dot(a, b, ta=False, tb=False):
        dims = (((0,) if ta else (1,), (1,) if tb else (0,)), ((), ()))
        return jax.lax.dot_general(a, b, dimension_numbers=dims,
                                   preferred_element_type=jnp.float32)

    q = [q_ref[0, h] for h in range(H)]
    dy = [dy_ref[0, h] for h in range(H)]
    in_dt = q_ref.dtype

    # --- recompute forward for this tile ---
    L = [dot(q[h], k[h], tb=True) * scale for h in range(H)]  # (Tq, N) f32
    P = []
    for g in range(H):
        m = L[0] * wl_ref[0, g]
        for h in range(1, H):
            m = m + L[h] * wl_ref[h, g]
        m = m + bl_ref[g, 0]
        mx = jnp.max(m, axis=-1, keepdims=True)
        e = jnp.exp(m - mx)
        P.append(e / jnp.sum(e, axis=-1, keepdims=True))

    # --- regenerate the forward's dropout masks (same seed order) ---
    if dropout_rate > 0.0:
        from spe_tpu.ops.pallas_attention import _dropout_masks

        b_id = pl.program_id(0)
        pltpu.prng_seed(seed_ref[0].astype(jnp.int32) + b_id * 65536 + t)
        keeps, keep_prob = _dropout_masks((q_tile, k_ref.shape[2]), H,
                                          dropout_rate)

    # --- Z = dropout(P2) (for dV) and dP2 through the dropout ---
    for j in range(H):
        p2 = P[0] * ww_ref[0, j]
        for g in range(1, H):
            p2 = p2 + P[g] * ww_ref[g, j]
        p2 = p2 + bw_ref[j, 0]
        if dropout_rate > 0.0:
            p2 = jnp.where(keeps[j], p2 / keep_prob, 0.0)
        dv_ref[0, j] += dot(p2.astype(in_dt), dy[j], ta=True).astype(dv_ref.dtype)

    dP2 = [dot(dy[j], v[j], tb=True) for j in range(H)]      # (Tq, N)
    if dropout_rate > 0.0:
        dP2 = [jnp.where(keeps[j], dP2[j] / keep_prob, 0.0) for j in range(H)]
    for j in range(H):
        dbw_ref[0, j, 0] += jnp.sum(dP2[j])
        for g in range(H):
            dww_ref[0, g, j] += jnp.sum(P[g] * dP2[j])

    dM = []
    for g in range(H):
        dp = dP2[0] * ww_ref[g, 0]
        for j in range(1, H):
            dp = dp + dP2[j] * ww_ref[g, j]
        dm = P[g] * (dp - jnp.sum(dp * P[g], axis=-1, keepdims=True))
        dM.append(dm)
        dbl_ref[0, g, 0] += jnp.sum(dm)
        for h in range(H):
            dwl_ref[0, h, g] += jnp.sum(L[h] * dM[g])

    for h in range(H):
        dl = dM[0] * wl_ref[h, 0]
        for g in range(1, H):
            dl = dl + dM[g] * wl_ref[h, g]
        dl = dl.astype(in_dt)
        dq_ref[0, h] = (dot(dl, k[h]) * scale).astype(dq_ref.dtype)
        dk_ref[0, h] += (dot(dl, q[h], ta=True) * scale).astype(dk_ref.dtype)


@functools.partial(jax.jit, static_argnames=("q_tile", "interpret", "dropout_rate"))
def _bwd_call(q, k, v, wl, bl, ww, bw, seed, dy, *, q_tile: int = 128,
              interpret: bool = False, dropout_rate: float = 0.0):
    B, H, N, dh = q.shape
    q_tile = min(q_tile, N)
    bl2 = bl.reshape(H, 1)
    bw2 = bw.reshape(H, 1)
    seed = jnp.asarray(seed, jnp.float32).reshape(1)
    # inner grid axis = q tiles; accumulator outputs map every tile to the
    # same block (per batch element) so they stay VMEM/SMEM-resident and
    # accumulate across the sequential TPU grid
    tiled = lambda: pl.BlockSpec((1, H, q_tile, dh), lambda b, t: (b, 0, t, 0),
                                 memory_space=pltpu.VMEM)
    full = lambda: pl.BlockSpec((1, H, N, dh), lambda b, t: (b, 0, 0, 0),
                                memory_space=pltpu.VMEM)
    small = lambda r, c: pl.BlockSpec((r, c), lambda b, t: (0, 0),
                                      memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        functools.partial(_bwd_kernel, q_tile=q_tile, dropout_rate=dropout_rate),
        grid=(B, N // q_tile),
        in_specs=[tiled(), full(), full(), small(H, H), small(H, 1),
                  small(H, H), small(H, 1),
                  pl.BlockSpec(memory_space=pltpu.SMEM), tiled()],
        out_specs=(tiled(), full(), full(),
                   # small mixing-matrix grads accumulate SCALARS: SMEM
                   # (Mosaic rejects scalar stores to VMEM)
                   pl.BlockSpec((1, H, H), lambda b, t: (b, 0, 0), memory_space=pltpu.SMEM),
                   pl.BlockSpec((1, H, 1), lambda b, t: (b, 0, 0), memory_space=pltpu.SMEM),
                   pl.BlockSpec((1, H, H), lambda b, t: (b, 0, 0), memory_space=pltpu.SMEM),
                   pl.BlockSpec((1, H, 1), lambda b, t: (b, 0, 0), memory_space=pltpu.SMEM)),
        out_shape=(
            jax.ShapeDtypeStruct((B, H, N, dh), jnp.float32),
            jax.ShapeDtypeStruct((B, H, N, dh), jnp.float32),
            jax.ShapeDtypeStruct((B, H, N, dh), jnp.float32),
            jax.ShapeDtypeStruct((B, H, H), jnp.float32),
            jax.ShapeDtypeStruct((B, H, 1), jnp.float32),
            jax.ShapeDtypeStruct((B, H, H), jnp.float32),
            jax.ShapeDtypeStruct((B, H, 1), jnp.float32),
        ),
        # the default 16MB scoped-VMEM budget is too tight for the resident
        # K/V + accumulators + per-tile recompute; v5e has 128MB physical
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=pltpu.InterpretParams() if interpret else False,
    )(q, k, v, wl, bl2, ww, bw2, seed, dy)
    dq, dk, dv, dwl, dbl, dww, dbw = out
    return (dq.astype(q.dtype), dk.astype(k.dtype), dv.astype(v.dtype),
            dwl.sum(0), dbl.sum(0)[:, 0], dww.sum(0), dbw.sum(0)[:, 0])


# ---------------------------------------------------------------------------
# custom_vjp wrapper: training-ready fused attention
# ---------------------------------------------------------------------------

@functools.partial(jax.custom_vjp, nondiff_argnums=(8, 9, 10))
def fused_talking_heads(q, k, v, wl, bl, ww, bw, seed=None,
                        q_tile: int = 256, interpret: bool = False,
                        dropout_rate: float = 0.0):
    if seed is None:
        seed = jnp.zeros((1,), jnp.float32)
    return talking_heads_attention(q, k, v, wl, bl, ww, bw, seed,
                                   q_tile=q_tile, interpret=interpret,
                                   dropout_rate=dropout_rate)


def _fwd(q, k, v, wl, bl, ww, bw, seed, q_tile, interpret, dropout_rate):
    if seed is None:
        seed = jnp.zeros((1,), jnp.float32)
    y = talking_heads_attention(q, k, v, wl, bl, ww, bw, seed, q_tile=q_tile,
                                interpret=interpret, dropout_rate=dropout_rate)
    return y, (q, k, v, wl, bl, ww, bw, seed)


def _bwd(q_tile, interpret, dropout_rate, res, dy):
    q, k, v, wl, bl, ww, bw, seed = res
    # forward tiles with q_tile; backward regenerates masks per forward tile
    # index, so the SAME tiling must be used (dropout determinism)
    grads = _bwd_call(q, k, v, wl, bl, ww, bw, seed, dy,
                      q_tile=q_tile, interpret=interpret,
                      dropout_rate=dropout_rate)
    return grads + (jnp.zeros_like(jnp.asarray(seed, jnp.float32).reshape(1)),)


fused_talking_heads.defvjp(_fwd, _bwd)
