"""Fully-fused DETR encoder layer (Pallas TPU): ONE kernel per direction for

    src = LN2( s + drop(FFN(s)) ),  s = LN1( x + drop(out_proj(MHA(x+pos, x))) )

i.e. the post-norm TransformerEncoderLayer (reference transformer.py:253-276,
normalize_before=False — the recipe default) with additive positional q/k and
a key-padding bias.

Why: after the whole-block fusion of the 48 CaiT patch blocks
(ops/pallas_block.py) the encoder/decoder stack dominates the residual model
time — each of the 3 encoder layers costs ~10 XLA kernels + 1 attention
kernel per direction, every elementwise stage (residual, LN, ReLU, dropout)
a separate HBM round trip over the (B, 1024, 192) activations plus a tunnel
dispatch. Here the whole layer reads x/pos once and writes the layer output
once; qkv, per-head attention maps and the (N, 2048) FFN hidden live in VMEM.

Attention runs per head inside a lax.fori_loop over HEAD-MAJOR (H, N, dh)
scratch buffers: one loop body instance means the (N, N) logits/probs/mask
temporaries are allocated ONCE, not once per unrolled head — with 8 heads at
N=1024 an unrolled loop's per-head temporaries blow the 128MB VMEM budget in
the backward (measured: 149MB of register-spill slots).

Backward is remat-style like the block kernel: recompute the forward from
the saved layer INPUTS (x, pos — nothing else is stashed to HBM) and
hand-backprop the chain, accumulating parameter grads across the sequential
batch grid axis.

Dropout contract: all four recipe dropout sites (attention probs, attn
output, FFN hidden, FFN output — all rate `dropout`, reference
transformer.py:262-276) run in-kernel via the TPU PRNG; the backward kernel
regenerates identical masks (same per-site seed tags; attention masks are
seeded per (batch, head), residual sites per (batch, tag)).

Numerics: matmul operands keep the input dtype (bf16 on the recipe) with f32
accumulation via preferred_element_type; LN statistics (eps 1e-5, like
torch nn.LayerNorm default), softmax and gradient accumulators are f32.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from spe_tpu.ops.pallas_attention import _dropout_masks
from spe_tpu.ops.pallas_block import _dot, _ln_bwd, _ln_fwd

_EPS = 1e-5


def _seed_for(seed_ref, b, tag):
    return seed_ref[0].astype(jnp.int32) + b * 65536 + tag


def _drop(x, seed_ref, b, tag, rate):
    """Inverted dropout on a single f32 array (regenerable by tag)."""
    pltpu.prng_seed(_seed_for(seed_ref, b, tag))
    (keep,), kp = _dropout_masks(x.shape, 1, rate)
    return jnp.where(keep, x / kp, 0.0), keep, kp


def _split_to(ref, x, H, dh):
    """Write (N, H*dh) -> head-major scratch ref (H, N, dh) (static writes)."""
    for h in range(H):
        ref[h] = x[:, h * dh:(h + 1) * dh].astype(ref.dtype)


def _concat_from(ref, H):
    """Head-major scratch ref (H, N, dh) -> (N, H*dh)."""
    return jnp.concatenate([ref[h] for h in range(H)], axis=1)


def _attn_fwd_loop(q3, k3, v3, o3, bias, seed_ref, b, H, dh, drop_rate):
    """o3[h] = drop(softmax(scale q_h k_h^T + bias)) v_h per head, one
    fori_loop body instance (temporaries allocated once, not per head)."""
    scale = dh ** -0.5

    def body(h, carry):
        qh = q3[h]
        logits = _dot(qh, k3[h], tb=True) * scale + bias[None, :]
        m = jnp.max(logits, axis=-1, keepdims=True)
        e = jnp.exp(logits - m)
        p = e / jnp.sum(e, axis=-1, keepdims=True)
        if drop_rate > 0.0:
            pltpu.prng_seed(_seed_for(seed_ref, b, 0) + h)
            (keep,), kp = _dropout_masks(logits.shape, 1, drop_rate)
            p = jnp.where(keep, p / kp, 0.0)
        o3[h] = _dot(p.astype(q3.dtype), v3[h]).astype(o3.dtype)
        return carry

    jax.lax.fori_loop(0, H, body, 0)


def _attn_bwd_loop(q3, k3, v3, do3, dq3, dk3, dv3, bias, seed_ref, b, H, dh,
                   drop_rate):
    """Standard-attention backward per head, one fori_loop body instance.
    Regenerates the forward's dropout masks by the same (b, h) seeds."""
    scale = dh ** -0.5

    def body(h, carry):
        qh = q3[h]
        kh = k3[h]
        doh = do3[h]
        logits = _dot(qh, kh, tb=True) * scale + bias[None, :]
        m = jnp.max(logits, axis=-1, keepdims=True)
        e = jnp.exp(logits - m)
        p = e / jnp.sum(e, axis=-1, keepdims=True)
        dzd = _dot(doh, v3[h], tb=True)
        if drop_rate > 0.0:
            pltpu.prng_seed(_seed_for(seed_ref, b, 0) + h)
            (keep,), kp = _dropout_masks(logits.shape, 1, drop_rate)
            zd = jnp.where(keep, p / kp, 0.0)
            dp = jnp.where(keep, dzd / kp, 0.0)
        else:
            zd, dp = p, dzd
        dv3[h] = _dot(zd.astype(q3.dtype), doh, ta=True).astype(dv3.dtype)
        dl = p * (dp - jnp.sum(dp * p, axis=-1, keepdims=True))
        dlc = dl.astype(q3.dtype)
        dq3[h] = (scale * _dot(dlc, kh)).astype(dq3.dtype)
        dk3[h] = (scale * _dot(dlc, qh, ta=True)).astype(dk3.dtype)
        return carry

    jax.lax.fori_loop(0, H, body, 0)


def _enc_fwd_kernel(x_ref, pos_ref, bias_ref, wq_ref, bq_ref, wk_ref, bk_ref,
                    wv_ref, bv_ref, wo_ref, bo_ref, g1_ref, b1_ref, w1_ref,
                    bb1_ref, w2_ref, bb2_ref, g2_ref, b2_ref, seed_ref,
                    o_ref, *rest, H: int, drop_rate: float,
                    save_residuals: bool = False):
    # rest = ([osave_ref, h2save_ref,] q3, k3, v3, o3). With save_residuals
    # the differentiated forward stashes the attention output o (input
    # dtype) and the post-dropout FFN output h2 (f32) so the backward skips
    # the whole attention forward recompute (logits+softmax+attn@V — it
    # otherwise runs TWICE in the backward: once for o, once for the grads)
    # and the fc2 matmul. Same math to f32 ulp.
    if save_residuals:
        osave_ref, h2save_ref = rest[0], rest[1]
        rest = rest[2:]
    q3, k3, v3, o3 = rest
    b = pl.program_id(0)
    x = x_ref[0]                                   # (N, D)
    pos = pos_ref[0]
    N, D = x.shape
    dh = D // H
    in_dt = x.dtype

    qk_in = (x.astype(jnp.float32) + pos.astype(jnp.float32)).astype(in_dt)
    _split_to(q3, _dot(qk_in, wq_ref[...]) + bq_ref[0][None, :], H, dh)
    _split_to(k3, _dot(qk_in, wk_ref[...]) + bk_ref[0][None, :], H, dh)
    _split_to(v3, _dot(x, wv_ref[...]) + bv_ref[0][None, :], H, dh)
    bias = bias_ref[0, 0].astype(jnp.float32)      # (N,)

    _attn_fwd_loop(q3, k3, v3, o3, bias, seed_ref, b, H, dh, drop_rate)
    o = _concat_from(o3, H)                        # (N, D) in_dt
    ao = _dot(o, wo_ref[...]) + bo_ref[0][None, :]                   # f32
    if drop_rate > 0.0:
        ao, _, _ = _drop(ao, seed_ref, b, 5000, drop_rate)
    y1 = x.astype(jnp.float32) + ao
    s1, _, _ = _ln_fwd(y1, g1_ref[0], b1_ref[0], eps=_EPS)
    s1c = s1.astype(in_dt)

    u = _dot(s1c, w1_ref[...]) + bb1_ref[0][None, :]                 # (N, F)
    ur = jnp.maximum(u, 0.0)
    if drop_rate > 0.0:
        ur, _, _ = _drop(ur, seed_ref, b, 6000, drop_rate)
    h2 = _dot(ur.astype(in_dt), w2_ref[...]) + bb2_ref[0][None, :]   # (N, D)
    if drop_rate > 0.0:
        h2, _, _ = _drop(h2, seed_ref, b, 7000, drop_rate)
    y2 = s1 + h2
    out, _, _ = _ln_fwd(y2, g2_ref[0], b2_ref[0], eps=_EPS)
    o_ref[0] = out.astype(o_ref.dtype)
    if save_residuals:
        osave_ref[0] = o
        h2save_ref[0] = h2


def _enc_bwd_kernel(x_ref, pos_ref, bias_ref, wq_ref, bq_ref, wk_ref, bk_ref,
                    wv_ref, bv_ref, wo_ref, bo_ref, g1_ref, b1_ref, w1_ref,
                    bb1_ref, w2_ref, bb2_ref, g2_ref, b2_ref, seed_ref,
                    dy_ref, *rest, H: int, drop_rate: float,
                    use_saved: bool = False):
    # rest = ([osave_ref, h2save_ref,] dx_ref, ..., db2_ref,
    #         q3, k3, v3, o3, do3, dq3, dk3, dv3)
    if use_saved:
        osave_ref, h2save_ref = rest[0], rest[1]
        rest = rest[2:]
    (dx_ref, dpos_ref, dwq_ref, dbq_ref, dwk_ref, dbk_ref,
     dwv_ref, dbv_ref, dwo_ref, dbo_ref, dg1_ref, db1_ref,
     dw1_ref, dbb1_ref, dw2_ref, dbb2_ref, dg2_ref, db2_ref,
     q3, k3, v3, o3, do3, dq3, dk3, dv3) = rest
    b = pl.program_id(0)
    x = x_ref[0]
    pos = pos_ref[0]
    N, D = x.shape
    dh = D // H
    in_dt = x.dtype

    @pl.when(b == 0)
    def _init():
        for r in (dwq_ref, dbq_ref, dwk_ref, dbk_ref, dwv_ref, dbv_ref,
                  dwo_ref, dbo_ref, dg1_ref, db1_ref, dw1_ref, dbb1_ref,
                  dw2_ref, dbb2_ref, dg2_ref, db2_ref):
            r[...] = jnp.zeros_like(r)

    # ---- recompute forward ----
    qk_in = (x.astype(jnp.float32) + pos.astype(jnp.float32)).astype(in_dt)
    _split_to(q3, _dot(qk_in, wq_ref[...]) + bq_ref[0][None, :], H, dh)
    _split_to(k3, _dot(qk_in, wk_ref[...]) + bk_ref[0][None, :], H, dh)
    _split_to(v3, _dot(x, wv_ref[...]) + bv_ref[0][None, :], H, dh)
    bias = bias_ref[0, 0].astype(jnp.float32)

    if use_saved:
        o = osave_ref[0]
    else:
        _attn_fwd_loop(q3, k3, v3, o3, bias, seed_ref, b, H, dh, drop_rate)
        o = _concat_from(o3, H)
    ao = _dot(o, wo_ref[...]) + bo_ref[0][None, :]
    if drop_rate > 0.0:
        ao, keep_ao, kp_ao = _drop(ao, seed_ref, b, 5000, drop_rate)
    y1 = x.astype(jnp.float32) + ao
    s1, xhat1, inv1 = _ln_fwd(y1, g1_ref[0], b1_ref[0], eps=_EPS)
    s1c = s1.astype(in_dt)

    u = _dot(s1c, w1_ref[...]) + bb1_ref[0][None, :]
    ur = jnp.maximum(u, 0.0)
    if drop_rate > 0.0:
        urd, keep_u, kp_u = _drop(ur, seed_ref, b, 6000, drop_rate)
    else:
        urd = ur
    if use_saved:
        # fc2 recompute skipped; regenerate only the dropout mask
        if drop_rate > 0.0:
            pltpu.prng_seed(_seed_for(seed_ref, b, 7000))
            (keep_h2,), kp_h2 = _dropout_masks((N, D), 1, drop_rate)
        h2d = h2save_ref[0]
    else:
        h2 = _dot(urd.astype(in_dt), w2_ref[...]) + bb2_ref[0][None, :]
        if drop_rate > 0.0:
            h2d, keep_h2, kp_h2 = _drop(h2, seed_ref, b, 7000, drop_rate)
        else:
            h2d = h2
    y2 = s1 + h2d

    _, xhat2, inv2 = _ln_fwd(y2, g2_ref[0], b2_ref[0], eps=_EPS)

    # ---- backward ----
    dy = dy_ref[0].astype(jnp.float32)
    dy2, dg2, db2 = _ln_bwd(dy, xhat2, inv2, g2_ref[0])
    dg2_ref[0] += dg2
    db2_ref[0] += db2

    # FFN branch: y2 = s1 + drop(fc2(drop(relu(fc1(s1)))))
    dh2 = (jnp.where(keep_h2, dy2 / kp_h2, 0.0) if drop_rate > 0.0 else dy2)
    dw2_ref[...] += _dot(urd.astype(in_dt), dh2.astype(in_dt), ta=True)
    dbb2_ref[0] += jnp.sum(dh2, axis=0)
    durd = _dot(dh2.astype(in_dt), w2_ref[...], tb=True)
    dur = (jnp.where(keep_u, durd / kp_u, 0.0) if drop_rate > 0.0 else durd)
    du = jnp.where(u > 0.0, dur, 0.0)
    dw1_ref[...] += _dot(s1c, du.astype(in_dt), ta=True)
    dbb1_ref[0] += jnp.sum(du, axis=0)
    ds1 = dy2 + _dot(du.astype(in_dt), w1_ref[...], tb=True)

    dy1, dg1, db1 = _ln_bwd(ds1, xhat1, inv1, g1_ref[0])
    dg1_ref[0] += dg1
    db1_ref[0] += db1

    # attention branch: y1 = x + drop(out_proj(o))
    dao = (jnp.where(keep_ao, dy1 / kp_ao, 0.0) if drop_rate > 0.0 else dy1)
    dwo_ref[...] += _dot(o, dao.astype(in_dt), ta=True)
    dbo_ref[0] += jnp.sum(dao, axis=0)
    do = _dot(dao.astype(in_dt), wo_ref[...], tb=True)    # (N, D) f32
    _split_to(do3, do, H, dh)

    _attn_bwd_loop(q3, k3, v3, do3, dq3, dk3, dv3, bias, seed_ref, b, H, dh,
                   drop_rate)
    dq = _concat_from(dq3, H).astype(jnp.float32)         # (N, D) f32
    dk = _concat_from(dk3, H).astype(jnp.float32)
    dv = _concat_from(dv3, H).astype(jnp.float32)

    dwq_ref[...] += _dot(qk_in, dq.astype(in_dt), ta=True)
    dbq_ref[0] += jnp.sum(dq, axis=0)
    dwk_ref[...] += _dot(qk_in, dk.astype(in_dt), ta=True)
    dbk_ref[0] += jnp.sum(dk, axis=0)
    dwv_ref[...] += _dot(x, dv.astype(in_dt), ta=True)
    dbv_ref[0] += jnp.sum(dv, axis=0)

    dqk_in = (_dot(dq.astype(in_dt), wq_ref[...], tb=True)
              + _dot(dk.astype(in_dt), wk_ref[...], tb=True))
    dx_v = _dot(dv.astype(in_dt), wv_ref[...], tb=True)

    dx_ref[0] = (dy1 + dqk_in + dx_v).astype(dx_ref.dtype)
    dpos_ref[0] = dqk_in.astype(dpos_ref.dtype)


def _specs(N, D, F, params):
    def rep(shape):
        return pl.BlockSpec(shape, lambda b: tuple(0 for _ in shape),
                            memory_space=pltpu.VMEM)

    x_spec = pl.BlockSpec((1, N, D), lambda b: (b, 0, 0),
                          memory_space=pltpu.VMEM)
    bias_spec = pl.BlockSpec((1, 1, N), lambda b: (b, 0, 0),
                             memory_space=pltpu.VMEM)
    p_specs = [rep(p.shape) for p in params]
    return x_spec, bias_spec, p_specs, rep


@functools.partial(jax.jit, static_argnames=("H", "interpret", "drop_rate",
                                             "save_residuals"))
def _fwd_call(x, pos, bias, params, seed, *, H, interpret, drop_rate,
              save_residuals=False):
    B, N, D = x.shape
    F = params[10].shape[1]
    dh = D // H
    x_spec, bias_spec, p_specs, _ = _specs(N, D, F, params)
    out_specs = x_spec
    out_shape = jax.ShapeDtypeStruct((B, N, D), x.dtype)
    if save_residuals:
        out_specs = (x_spec, x_spec, x_spec)
        out_shape = (out_shape,
                     jax.ShapeDtypeStruct((B, N, D), x.dtype),      # o
                     jax.ShapeDtypeStruct((B, N, D), jnp.float32))  # h2
    return pl.pallas_call(
        functools.partial(_enc_fwd_kernel, H=H, drop_rate=drop_rate,
                          save_residuals=save_residuals),
        grid=(B,),
        in_specs=[x_spec, x_spec, bias_spec] + p_specs
        + [pl.BlockSpec(memory_space=pltpu.SMEM)],
        out_specs=out_specs,
        out_shape=out_shape,
        scratch_shapes=[pltpu.VMEM((H, N, dh), x.dtype)] * 4,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel",),
            vmem_limit_bytes=110 * 1024 * 1024),
        interpret=pltpu.InterpretParams() if interpret else False,
    )(x, pos, bias, *params, seed)


@functools.partial(jax.jit, static_argnames=("H", "interpret", "drop_rate"))
def _bwd_call(x, pos, bias, params, seed, dy, osave=None, h2save=None, *, H,
              interpret, drop_rate):
    B, N, D = x.shape
    F = params[10].shape[1]
    dh = D // H
    x_spec, bias_spec, p_specs, rep = _specs(N, D, F, params)
    grad_shapes = ([jax.ShapeDtypeStruct((B, N, D), jnp.float32)] * 2
                   + [jax.ShapeDtypeStruct(p.shape, jnp.float32)
                      for p in params])
    grad_specs = [x_spec, x_spec] + [rep(p.shape) for p in params]
    use_saved = osave is not None
    extra_in = [osave, h2save] if use_saved else []
    extra_specs = [x_spec, x_spec] if use_saved else []
    return pl.pallas_call(
        functools.partial(_enc_bwd_kernel, H=H, drop_rate=drop_rate,
                          use_saved=use_saved),
        grid=(B,),
        in_specs=[x_spec, x_spec, bias_spec] + p_specs
        + [pl.BlockSpec(memory_space=pltpu.SMEM), x_spec] + extra_specs,
        out_specs=tuple(grad_specs),
        out_shape=tuple(grad_shapes),
        scratch_shapes=[pltpu.VMEM((H, N, dh), x.dtype)] * 5
        + [pltpu.VMEM((H, N, dh), jnp.float32)] * 3,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),    # param grads accumulate
            vmem_limit_bytes=110 * 1024 * 1024),
        interpret=pltpu.InterpretParams() if interpret else False,
    )(x, pos, bias, *params, seed, dy, *extra_in)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5))
def fused_encoder_layer(x, pos, params, num_heads, interpret, drop_rate):
    """x/pos: (B, N, D); params: 18-tuple in kernel order
    (w_q (D,D), b_q (1,D), w_k, b_k, w_v, b_v, w_o, b_o,
     ln1_g (1,D), ln1_b, w1 (D,F), b1 (1,F), w2 (F,D), b2 (1,D),
     ln2_g, ln2_b, bias (B,1,N) f32 key-padding logit bias,
     seed (1,) f32). Returns the layer output (B, N, D) in x.dtype.
    The key-padding bias and seed get zero gradients."""
    *ps, bias, seed = params
    return _fwd_call(x, pos, bias, tuple(ps), seed, H=num_heads,
                     interpret=interpret, drop_rate=drop_rate)


def _fused_fwd(x, pos, params, num_heads, interpret, drop_rate):
    from spe_tpu.ops.pallas_block import _save_residuals_enabled

    if not _save_residuals_enabled():
        y = fused_encoder_layer(x, pos, params, num_heads, interpret,
                                drop_rate)
        return y, (x, pos, params, None, None)
    *ps, bias, seed = params
    y, osave, h2save = _fwd_call(x, pos, bias, tuple(ps), seed, H=num_heads,
                                 interpret=interpret, drop_rate=drop_rate,
                                 save_residuals=True)
    return y, (x, pos, params, osave, h2save)


def _fused_bwd(num_heads, interpret, drop_rate, res, dy):
    x, pos, params, osave, h2save = res
    *ps, bias, seed = params
    grads = _bwd_call(x, pos, bias, tuple(ps), seed, dy, osave, h2save,
                      H=num_heads, interpret=interpret, drop_rate=drop_rate)
    dx = grads[0].astype(x.dtype)
    dpos = grads[1].astype(pos.dtype)
    dparams = tuple(g.astype(p.dtype) for g, p in zip(grads[2:], ps))
    return dx, dpos, dparams + (jnp.zeros_like(bias), jnp.zeros_like(seed))


fused_encoder_layer.defvjp(_fused_fwd, _fused_bwd)
