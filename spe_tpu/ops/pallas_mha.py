"""Generic fused multi-head attention (Pallas TPU) for the three remaining
attention flavors the talking-heads kernel doesn't cover:

  * encoder self-attention over the patch sequence (reference
    transformer.py:253-310; N=1024 at the published recipe — the einsum
    path materializes (B, H, N, N) logits + probs to HBM per layer),
  * conditional cross-attention at 2*d_model q/k vs d_model v
    (transformer.py:386-419; q/k head dim differs from v head dim),
  * class-attention with the attention map as a SECOND OUTPUT — the CAM
    signal (cait.py:91-139: Multi_Class_Attention keeps its attn map).

One kernel serves all three because none of them mix heads: per (batch,
q-tile) grid step the full K/V rows stay VMEM-resident, logits/softmax
never touch HBM, and an optional additive key bias implements the padding
mask. Attention dropout runs in-kernel via the TPU PRNG with the same
seed-per-(batch, tile) contract as pallas_attention.py, so the hand-derived
backward regenerates identical masks.

Backward math (standard attention; verified against jax.grad of einsum):
  P  = softmax(scale*QK^T + bias);  Z = drop(P)/kp;  Y = Z V
  dV = Z^T dY
  dZ = dY V^T;  dP = keep ? dZ/kp : 0
  dL = P * (dP - rowsum(dP * P))
  dQ = scale * dL K;  dK = scale * dL^T Q

Wrapper-level shape discipline: Nq is padded to a multiple of 8 and Nk to a
multiple of 128 (padded keys get bias -1e9, i.e. zero weight), so callers
can pass the natural 300-query / 1045-key shapes of the recipe.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from spe_tpu.ops.pallas_attention import _dropout_masks

_NEG = -1e9


def _fwd_kernel(q_ref, k_ref, v_ref, bias_ref, seed_ref, o_ref, attn_ref=None,
                *, dropout_rate: float = 0.0):
    # q_ref: (1, H, Tq, dqh); k_ref: (1, H, Nk, dqh); v_ref: (1, H, Nk, dvh)
    # bias_ref: (1, 1, Nk) additive logit bias (0 / -1e9 padding mask); the
    # singleton sublane dim keeps the block legal on real TPUs (sublane must
    # be a multiple of 8 or equal the full array dim)
    H = q_ref.shape[1]
    dqh = q_ref.shape[3]
    scale = dqh ** -0.5
    bias = bias_ref[0, 0].astype(jnp.float32)  # (Nk,)

    if dropout_rate > 0.0:
        b = pl.program_id(0)
        t = pl.program_id(1)
        pltpu.prng_seed(seed_ref[0].astype(jnp.int32) + b * 65536 + t)
        keeps, kp = _dropout_masks((q_ref.shape[2], k_ref.shape[2]), H,
                                   dropout_rate)

    for h in range(H):
        # dot operands keep the input dtype (bf16 -> native MXU rate) with
        # f32 accumulation; softmax runs f32 on the VPU
        q = q_ref[0, h]
        k = k_ref[0, h]
        v = v_ref[0, h]
        logits = jax.lax.dot_general(
            q, k, dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32) * scale      # (Tq, Nk)
        logits = logits + bias[None, :]
        m = jnp.max(logits, axis=-1, keepdims=True)
        e = jnp.exp(logits - m)
        p = e / jnp.sum(e, axis=-1, keepdims=True)
        if attn_ref is not None:
            attn_ref[0, h] = p.astype(attn_ref.dtype)
        if dropout_rate > 0.0:
            p = jnp.where(keeps[h], p / kp, 0.0)
        o_ref[0, h] = jax.lax.dot_general(
            p.astype(v.dtype), v,
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32).astype(o_ref.dtype)


def _bwd_kernel(q_ref, k_ref, v_ref, bias_ref, seed_ref, dy_ref,
                dq_ref, dk_ref, dv_ref, *, q_tile: int,
                dropout_rate: float = 0.0):
    # grid (batch, q_tile): dK/dV accumulate across the inner (sequential)
    # tile axis via block revisiting, so VMEM stays independent of batch
    # size and query length
    H = q_ref.shape[1]
    dqh = q_ref.shape[3]
    scale = dqh ** -0.5
    t = pl.program_id(1)
    bias = bias_ref[0, 0].astype(jnp.float32)

    @pl.when(t == 0)
    def _init():
        dk_ref[...] = jnp.zeros_like(dk_ref)
        dv_ref[...] = jnp.zeros_like(dv_ref)

    def dot(a, b, ta=False, tb=False):
        dims = (((0,) if ta else (1,), (1,) if tb else (0,)), ((), ()))
        return jax.lax.dot_general(a, b, dimension_numbers=dims,
                                   preferred_element_type=jnp.float32)

    if dropout_rate > 0.0:
        b_id = pl.program_id(0)
        pltpu.prng_seed(seed_ref[0].astype(jnp.int32) + b_id * 65536 + t)
        keeps, kp = _dropout_masks((q_tile, k_ref.shape[2]), H, dropout_rate)
    in_dt = q_ref.dtype
    for h in range(H):
        q = q_ref[0, h]
        k = k_ref[0, h]
        v = v_ref[0, h]
        dy = dy_ref[0, h]

        logits = dot(q, k, tb=True) * scale + bias[None, :]
        m = jnp.max(logits, axis=-1, keepdims=True)
        e = jnp.exp(logits - m)
        p = e / jnp.sum(e, axis=-1, keepdims=True)     # (Tq, Nk)

        if dropout_rate > 0.0:
            z = jnp.where(keeps[h], p / kp, 0.0)
        else:
            z = p
        dv_ref[0, h] += dot(z.astype(in_dt), dy, ta=True).astype(dv_ref.dtype)

        dz = dot(dy, v, tb=True)                        # (Tq, Nk)
        if dropout_rate > 0.0:
            dp = jnp.where(keeps[h], dz / kp, 0.0)
        else:
            dp = dz
        dl = (p * (dp - jnp.sum(dp * p, axis=-1, keepdims=True))).astype(in_dt)
        dq_ref[0, h] = (dot(dl, k) * scale).astype(dq_ref.dtype)
        dk_ref[0, h] += (dot(dl, q, ta=True) * scale).astype(dk_ref.dtype)


def _pad_to(x, axis, mult):
    n = x.shape[axis]
    pad = (-n) % mult
    if pad == 0:
        return x
    widths = [(0, 0)] * x.ndim
    widths[axis] = (0, pad)
    return jnp.pad(x, widths)


@functools.partial(jax.jit, static_argnames=("q_tile", "interpret",
                                             "dropout_rate", "return_attn"))
def _fwd_call(q, k, v, bias, seed, *, q_tile: int, interpret: bool,
              dropout_rate: float, return_attn: bool):
    B, H, Nq, dqh = q.shape
    Nk, dvh = k.shape[2], v.shape[3]
    grid = (B, Nq // q_tile)
    outs = [jax.ShapeDtypeStruct((B, H, Nq, dvh), q.dtype)]
    out_specs = [pl.BlockSpec((1, H, q_tile, dvh), lambda b, i: (b, 0, i, 0),
                              memory_space=pltpu.VMEM)]
    if return_attn:
        outs.append(jax.ShapeDtypeStruct((B, H, Nq, Nk), jnp.float32))
        out_specs.append(pl.BlockSpec((1, H, q_tile, Nk),
                                      lambda b, i: (b, 0, i, 0),
                                      memory_space=pltpu.VMEM))
    res = pl.pallas_call(
        functools.partial(_fwd_kernel, dropout_rate=dropout_rate),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, H, q_tile, dqh), lambda b, i: (b, 0, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, H, Nk, dqh), lambda b, i: (b, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, H, Nk, dvh), lambda b, i: (b, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, Nk), lambda b, i: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ],
        out_specs=tuple(out_specs) if return_attn else out_specs[0],
        out_shape=tuple(outs) if return_attn else outs[0],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel"),
            vmem_limit_bytes=100 * 1024 * 1024),
        # the threaded Mosaic interpreter is only needed for the TPU
        # PRNG (in-kernel dropout); without it the simple JAX
        # interpreter is used — its barrier-free execution is safe
        # when virtual devices run the kernel concurrently (shard_map
        # TP tests deadlocked the Mosaic interpreter's _barrier)
        interpret=(pltpu.InterpretParams()
                   if interpret and dropout_rate > 0.0
                   else bool(interpret)),
    )(q, k, v, bias, seed)
    return res if return_attn else (res,)


@functools.partial(jax.jit, static_argnames=("q_tile", "interpret", "dropout_rate"))
def _bwd_call(q, k, v, bias, seed, dy, *, q_tile: int, interpret: bool,
              dropout_rate: float):
    B, H, Nq, dqh = q.shape
    Nk, dvh = k.shape[2], v.shape[3]
    return pl.pallas_call(
        functools.partial(_bwd_kernel, q_tile=q_tile, dropout_rate=dropout_rate),
        grid=(B, Nq // q_tile),
        in_specs=[
            pl.BlockSpec((1, H, q_tile, dqh), lambda b, t: (b, 0, t, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, H, Nk, dqh), lambda b, t: (b, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, H, Nk, dvh), lambda b, t: (b, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, Nk), lambda b, t: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((1, H, q_tile, dvh), lambda b, t: (b, 0, t, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((1, H, q_tile, dqh), lambda b, t: (b, 0, t, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, H, Nk, dqh), lambda b, t: (b, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, H, Nk, dvh), lambda b, t: (b, 0, 0, 0),
                         memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((B, H, Nq, dqh), jnp.float32),
            jax.ShapeDtypeStruct((B, H, Nk, dqh), jnp.float32),
            jax.ShapeDtypeStruct((B, H, Nk, dvh), jnp.float32),
        ),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
            vmem_limit_bytes=100 * 1024 * 1024),
        # the threaded Mosaic interpreter is only needed for the TPU
        # PRNG (in-kernel dropout); without it the simple JAX
        # interpreter is used — its barrier-free execution is safe
        # when virtual devices run the kernel concurrently (shard_map
        # TP tests deadlocked the Mosaic interpreter's _barrier)
        interpret=(pltpu.InterpretParams()
                   if interpret and dropout_rate > 0.0
                   else bool(interpret)),
    )(q, k, v, bias, seed, dy)


@functools.partial(jax.custom_vjp, nondiff_argnums=(5, 6, 7, 8))
def _fused_mha_core(q, k, v, bias, seed, q_tile, interpret, dropout_rate,
                    return_attn):
    out = _fwd_call(q, k, v, bias, seed, q_tile=q_tile, interpret=interpret,
                    dropout_rate=dropout_rate, return_attn=return_attn)
    return out if return_attn else out[0]


def _core_fwd(q, k, v, bias, seed, q_tile, interpret, dropout_rate, return_attn):
    out = _fused_mha_core(q, k, v, bias, seed, q_tile, interpret,
                          dropout_rate, return_attn)
    return out, (q, k, v, bias, seed)


def _core_bwd(q_tile, interpret, dropout_rate, return_attn, res, dy):
    q, k, v, bias, seed = res
    if return_attn:
        # the attn-map output exists for the CAM path, which is read under
        # stop_gradient (train_step.py) — its cotangent is dropped.
        dy = dy[0]
    dq, dk, dv = _bwd_call(q, k, v, bias, seed, dy, q_tile=q_tile,
                           interpret=interpret, dropout_rate=dropout_rate)
    return (dq.astype(q.dtype), dk.astype(k.dtype), dv.astype(v.dtype),
            jnp.zeros_like(bias), jnp.zeros_like(seed))


_fused_mha_core.defvjp(_core_fwd, _core_bwd)


def fused_mha(q, k, v, *, key_padding_mask=None, seed=None,
              q_tile: int = 256, interpret: bool = False,
              dropout_rate: float = 0.0, return_attn: bool = False,
              tp_mesh=None, tp_axis: str = "model"):
    """q: (B, H, Nq, dqh); k: (B, H, Nk, dqh); v: (B, H, Nk, dvh);
    key_padding_mask: (B, Nk) bool, True = padded key.

    Returns (B, H, Nq, dvh), or (out, attn (B, H, Nq, Nk) f32 pre-dropout)
    when return_attn. Scaling (dqh^-0.5) happens in-kernel. Nq/Nk are padded
    internally to TPU tile multiples; padded keys contribute zero weight.

    tp_mesh + tp_axis: tensor parallelism. When the mesh's `tp_axis` size is
    > 1, the kernel runs under shard_map with the HEAD dim split over that
    axis — per-head attention needs no cross-head communication, so each
    shard runs the unmodified kernel on its H/n heads (the Megatron layout:
    column-parallel q/k/v projections already leave the head dim sharded,
    and the row-parallel out-projection psums after the merge). This is
    what makes the fused-MHA kernel family GSPMD-compatible: the shard_map
    states the partitioning the opaque pallas_call cannot express. Dropout
    seeds are offset per shard (mask streams must differ across head
    shards); sharded and unsharded training therefore draw different
    attention masks, like any topology change.
    """
    B, H, Nq, dqh = q.shape
    Nk = k.shape[2]
    qp = _pad_to(q, 2, 8)
    kp_ = _pad_to(k, 2, 128)
    vp = _pad_to(v, 2, 128)
    Nk_p = kp_.shape[2]
    if key_padding_mask is None:
        bias = jnp.zeros((B, Nk), jnp.float32)
    else:
        bias = jnp.where(key_padding_mask, _NEG, 0.0).astype(jnp.float32)
    bias = jnp.pad(bias, ((0, 0), (0, Nk_p - Nk)), constant_values=_NEG)
    bias = bias[:, None, :]  # (B, 1, Nk_p): legal TPU block shape

    Nq_p = qp.shape[2]
    tile = min(q_tile, Nq_p)
    if Nq_p % tile:
        tile = Nq_p
    if seed is None:
        seed = jnp.zeros((1,), jnp.float32)
    seed = jnp.asarray(seed, jnp.float32).reshape(1)

    n_shard = tp_mesh.shape[tp_axis] if tp_mesh is not None else 1
    if n_shard > 1:
        if H % n_shard:
            raise ValueError(
                f"fused_mha head sharding needs num_heads ({H}) divisible "
                f"by the '{tp_axis}' mesh axis ({n_shard})")
        from jax.sharding import PartitionSpec as P

        # batch stays sharded over the mesh's OTHER (data) axis — specs
        # that replicate the batch dim would make GSPMD all-gather the
        # data-sharded activations into every shard (measured: a deadlock-
        # prone cross-module all-gather on the CPU backend, and pure waste
        # on ICI)
        dp_axes = tuple(a for a in tp_mesh.axis_names if a != tp_axis)
        dp_total = 1
        for a in dp_axes:
            dp_total *= tp_mesh.shape[a]
        if B % dp_total:
            # batch not divisible by the data axis (param init runs on a
            # size-1 sample; eval remainder batches): replicate the batch
            # dim instead — correct, just not data-parallel for this call
            dp_axes = ()
        dp = dp_axes if dp_axes else None

        def _sharded(qs, ks, vs, bias_s, seed_s):
            # per-shard dropout streams: distinct masks per head AND data
            # shard (the kernel seeds from the LOCAL batch index)
            off = jax.lax.axis_index(tp_axis).astype(seed_s.dtype) * 1048573.0
            for i, a in enumerate(dp_axes):
                off = off + jax.lax.axis_index(a).astype(
                    seed_s.dtype) * (2097143.0 * (i + 1))
            return _fused_mha_core(qs, ks, vs, bias_s, seed_s + off, tile,
                                   interpret, float(dropout_rate),
                                   return_attn)

        hspec = P(dp, tp_axis, None, None)
        out = jax.shard_map(
            _sharded, mesh=tp_mesh,
            in_specs=(hspec, hspec, hspec, P(dp, None, None), P(None)),
            out_specs=(hspec, hspec) if return_attn else hspec,
            # pallas_call's out_shape carries no varying-mesh-axes (vma)
            # annotation; the kernel is purely shard-local, so the check
            # adds nothing here
            check_vma=False,
        )(qp, kp_, vp, bias, seed)
    else:
        out = _fused_mha_core(qp, kp_, vp, bias, seed, tile, interpret,
                              float(dropout_rate), return_attn)
    if return_attn:
        y, attn = out
        return y[:, :, :Nq, :], attn[:, :, :Nq, :Nk]
    return out[:, :, :Nq, :]
