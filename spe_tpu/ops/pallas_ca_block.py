"""Fully-fused CaiT class-attention token block (Pallas TPU): ONE kernel per
direction for the whole LayerScaleBlockClassAttn (reference
LayerScale_Block_CA_MultiClass + Multi_Class_Attention, cait.py:91-139,
311-328):

    u  = LN1([cls ++ x])
    h  = proj( multi_class_attention(q(u[:t]), k(u), v(u)) )
    c1 = cls + gamma1 * h
    c2 = c1 + gamma2 * mlp(LN2(c1))
    returns (c2, attn)   with attn (H, t, N) = the softmax probabilities
                         (block 0's attn is the CAM source)

Why: the two token-only blocks were the last unfused model piece — ~10 XLA
ops + 1 attention kernel per block per direction, each an HBM round trip
over the (B, 1+C+P, D) concat stream plus a tunnel dispatch. The recipe
passes NO dropout through these blocks (LayerScaleBlockClassAttn forwards
no rates), so the kernel needs no PRNG.

Backward: the attention probabilities are already a forward OUTPUT (the
CAM), so the backward consumes them instead of recomputing logits+softmax;
the tiny (t, D) attention/MLP outputs are saved as residuals like
ops/pallas_block.py. Only the linear projections over the full sequence are
recomputed. d(attn) cotangents are honored (they join the softmax backward)
even though the training recipe stop-gradients the CAM (engine.py:383).

Numerics: matmul operands keep the input dtype with f32 accumulation; LN
statistics (eps 1e-6, like the flax blocks), softmax, GELU and gradient
accumulators are f32.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from spe_tpu.ops.pallas_block import _dot, _gelu, _gelu_grad, _ln_bwd, _ln_fwd


def _proj_heads(un_q, un_kv, P, H, dh):
    """q from the first t rows, k/v from the whole sequence."""
    q = _dot(un_q, P["wq"][...]) + P["bq"][0][None, :]
    k = _dot(un_kv, P["wk"][...]) + P["bk"][0][None, :]
    v = _dot(un_kv, P["wv"][...]) + P["bv"][0][None, :]
    return q, k, v


def _unpack(ps):
    names = ["g1", "b1", "wq", "bq", "wk", "bk", "wv", "bv", "wp", "bp",
             "gamma1", "g2", "b2", "w1", "bb1", "w2", "bb2", "gamma2"]
    assert len(ps) == len(names), (len(ps), len(names))
    return dict(zip(names, ps))


def _ca_fwd_kernel(cls_ref, x_ref, *refs, H: int, save_residuals: bool):
    P = _unpack(refs[:18])
    out_refs = refs[18:]
    o_ref, attn_ref = out_refs[0], out_refs[1]
    if save_residuals:
        osave_ref, msave_ref = out_refs[2], out_refs[3]

    cls = cls_ref[0]                       # (t, D)
    x = x_ref[0]                           # (Np, D)
    t, D = cls.shape
    dh = D // H
    scale = dh ** -0.5
    in_dt = cls.dtype

    u = jnp.concatenate([cls, x], axis=0)  # (N, D)
    un, _, _ = _ln_fwd(u, P["g1"][0], P["b1"][0])
    un_c = un.astype(in_dt)
    q, k, v = _proj_heads(un_c[:t], un_c, P, H, dh)
    q = q.astype(in_dt)
    k = k.astype(in_dt)
    v = v.astype(in_dt)

    outs = []
    for h in range(H):
        cs = slice(h * dh, (h + 1) * dh)
        logits = _dot(q[:, cs] * scale, k[:, cs], tb=True)     # (t, N) f32
        m = jnp.max(logits, axis=-1, keepdims=True)
        e = jnp.exp(logits - m)
        p = e / jnp.sum(e, axis=-1, keepdims=True)
        attn_ref[0, h] = p.astype(attn_ref.dtype)
        outs.append(_dot(p.astype(in_dt), v[:, cs]))           # (t, dh) f32
    o = jnp.concatenate(outs, axis=1).astype(in_dt)            # (t, D)
    ao = _dot(o, P["wp"][...]) + P["bp"][0][None, :]           # (t, D) f32
    c1 = cls.astype(jnp.float32) + P["gamma1"][0][None, :] * ao

    h2n, _, _ = _ln_fwd(c1, P["g2"][0], P["b2"][0])
    u2 = _dot(h2n.astype(in_dt), P["w1"][...]) + P["bb1"][0][None, :]
    ug = _gelu(u2)
    mm = _dot(ug.astype(in_dt), P["w2"][...]) + P["bb2"][0][None, :]
    out = c1 + P["gamma2"][0][None, :] * mm
    o_ref[0] = out.astype(o_ref.dtype)
    if save_residuals:
        osave_ref[0] = o
        msave_ref[0] = mm


def _ca_bwd_kernel(cls_ref, x_ref, *refs, H: int):
    P = _unpack(refs[:18])
    (attn_ref, osave_ref, msave_ref, dy_ref, dattn_ref,
     dcls_ref, dx_ref) = refs[18:25]
    G = _unpack(refs[25:])

    b = pl.program_id(0)
    cls = cls_ref[0]
    x = x_ref[0]
    t, D = cls.shape
    dh = D // H
    scale = dh ** -0.5
    in_dt = cls.dtype

    @pl.when(b == 0)
    def _init():
        for r in refs[25:]:
            r[...] = jnp.zeros_like(r)

    # ---- recompute the linear parts (attention probs come from the fwd
    # output; o / mlp-out come from the saved residuals) ----
    u = jnp.concatenate([cls, x], axis=0)
    un, xhat1, inv1 = _ln_fwd(u, P["g1"][0], P["b1"][0])
    un_c = un.astype(in_dt)
    q, k, v = _proj_heads(un_c[:t], un_c, P, H, dh)
    q = q.astype(in_dt)
    k = k.astype(in_dt)
    v = v.astype(in_dt)
    o = osave_ref[0]                        # (t, D) in_dt
    ao = _dot(o, P["wp"][...]) + P["bp"][0][None, :]
    c1 = cls.astype(jnp.float32) + P["gamma1"][0][None, :] * ao
    h2n, xhat2, inv2 = _ln_fwd(c1, P["g2"][0], P["b2"][0])
    h2n_c = h2n.astype(in_dt)
    u2 = _dot(h2n_c, P["w1"][...]) + P["bb1"][0][None, :]
    ug = _gelu(u2)
    mm = msave_ref[0]                       # (t, D) f32

    # ---- backward ----
    dy = dy_ref[0].astype(jnp.float32)      # (t, D)

    # MLP branch: out = c1 + gamma2 * mm
    G["gamma2"][0] += jnp.sum(dy * mm, axis=0)
    dm = dy * P["gamma2"][0][None, :]
    G["w2"][...] += _dot(ug.astype(in_dt), dm.astype(in_dt), ta=True)
    G["bb2"][0] += jnp.sum(dm, axis=0)
    dug = _dot(dm.astype(in_dt), P["w2"][...], tb=True)
    du2 = dug * _gelu_grad(u2)
    G["w1"][...] += _dot(h2n_c, du2.astype(in_dt), ta=True)
    G["bb1"][0] += jnp.sum(du2, axis=0)
    dh2n = _dot(du2.astype(in_dt), P["w1"][...], tb=True)
    dc1_ln, dg2, db2 = _ln_bwd(dh2n, xhat2, inv2, P["g2"][0])
    G["g2"][0] += dg2
    G["b2"][0] += db2
    dc1 = dy + dc1_ln

    # attention branch: c1 = cls + gamma1 * ao
    G["gamma1"][0] += jnp.sum(dc1 * ao, axis=0)
    dao = dc1 * P["gamma1"][0][None, :]
    G["wp"][...] += _dot(o, dao.astype(in_dt), ta=True)
    G["bp"][0] += jnp.sum(dao, axis=0)
    do = _dot(dao.astype(in_dt), P["wp"][...], tb=True)   # (t, D) f32

    dq_heads, dk_heads, dv_heads = [], [], []
    for h in range(H):
        cs = slice(h * dh, (h + 1) * dh)
        p = attn_ref[0, h].astype(jnp.float32)            # (t, N)
        doh = do[:, cs].astype(in_dt)
        dp = _dot(doh, v[:, cs], tb=True)                 # (t, N) f32
        dv_heads.append(_dot(p.astype(in_dt), doh, ta=True))
        dp = dp + dattn_ref[0, h].astype(jnp.float32)     # CAM cotangent
        dl = p * (dp - jnp.sum(dp * p, axis=-1, keepdims=True))
        dlc = dl.astype(in_dt)
        dq_heads.append(scale * _dot(dlc, k[:, cs]))
        dk_heads.append(scale * _dot(dlc, q[:, cs], ta=True))
    dq = jnp.concatenate(dq_heads, axis=1)                # (t, D) f32
    dk = jnp.concatenate(dk_heads, axis=1)                # (N, D) f32
    dv = jnp.concatenate(dv_heads, axis=1)

    G["wq"][...] += _dot(un_c[:t], dq.astype(in_dt), ta=True)
    G["bq"][0] += jnp.sum(dq, axis=0)
    G["wk"][...] += _dot(un_c, dk.astype(in_dt), ta=True)
    G["bk"][0] += jnp.sum(dk, axis=0)
    G["wv"][...] += _dot(un_c, dv.astype(in_dt), ta=True)
    G["bv"][0] += jnp.sum(dv, axis=0)

    dun = (_dot(dk.astype(in_dt), P["wk"][...], tb=True)
           + _dot(dv.astype(in_dt), P["wv"][...], tb=True))
    dun_q = _dot(dq.astype(in_dt), P["wq"][...], tb=True)  # (t, D)
    dun = jnp.concatenate([dun[:t] + dun_q, dun[t:]], axis=0)
    du, dg1, db1 = _ln_bwd(dun, xhat1, inv1, P["g1"][0])
    G["g1"][0] += dg1
    G["b1"][0] += db1
    dcls_ref[0] = (dc1 + du[:t]).astype(dcls_ref.dtype)
    dx_ref[0] = du[t:].astype(dx_ref.dtype)


def _specs(t, Pn, D, H, params):
    def rep(shape):
        return pl.BlockSpec(shape, lambda b: tuple(0 for _ in shape),
                            memory_space=pltpu.VMEM)

    cls_spec = pl.BlockSpec((1, t, D), lambda b: (b, 0, 0),
                            memory_space=pltpu.VMEM)
    x_spec = pl.BlockSpec((1, Pn, D), lambda b: (b, 0, 0),
                          memory_space=pltpu.VMEM)
    attn_spec = pl.BlockSpec((1, H, t, t + Pn), lambda b: (b, 0, 0, 0),
                             memory_space=pltpu.VMEM)
    p_specs = [rep(p.shape) for p in params]
    return cls_spec, x_spec, attn_spec, p_specs, rep


@functools.partial(jax.jit, static_argnames=("H", "interpret",
                                             "save_residuals"))
def _fwd_call(cls, x, params, *, H, interpret, save_residuals=False):
    B, t, D = cls.shape
    Pn = x.shape[1]
    cls_spec, x_spec, attn_spec, p_specs, _ = _specs(t, Pn, D, H, params)
    out_specs = [cls_spec, attn_spec]
    out_shape = [jax.ShapeDtypeStruct((B, t, D), cls.dtype),
                 jax.ShapeDtypeStruct((B, H, t, t + Pn), jnp.float32)]
    if save_residuals:
        out_specs += [cls_spec, cls_spec]
        out_shape += [jax.ShapeDtypeStruct((B, t, D), cls.dtype),      # o
                      jax.ShapeDtypeStruct((B, t, D), jnp.float32)]    # mlp
    return pl.pallas_call(
        functools.partial(_ca_fwd_kernel, H=H,
                          save_residuals=save_residuals),
        grid=(B,),
        in_specs=[cls_spec, x_spec] + p_specs,
        out_specs=tuple(out_specs),
        out_shape=tuple(out_shape),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel",),
            vmem_limit_bytes=110 * 1024 * 1024),
        interpret=pltpu.InterpretParams() if interpret else False,
    )(cls, x, *params)


@functools.partial(jax.jit, static_argnames=("H", "interpret"))
def _bwd_call(cls, x, params, attn, osave, msave, dy, dattn, *, H,
              interpret):
    B, t, D = cls.shape
    Pn = x.shape[1]
    cls_spec, x_spec, attn_spec, p_specs, rep = _specs(t, Pn, D, H, params)
    grad_shapes = ([jax.ShapeDtypeStruct((B, t, D), jnp.float32),
                    jax.ShapeDtypeStruct((B, Pn, D), jnp.float32)]
                   + [jax.ShapeDtypeStruct(p.shape, jnp.float32)
                      for p in params])
    grad_specs = [cls_spec, x_spec] + [rep(p.shape) for p in params]
    return pl.pallas_call(
        functools.partial(_ca_bwd_kernel, H=H),
        grid=(B,),
        in_specs=[cls_spec, x_spec] + p_specs
        + [attn_spec, cls_spec, cls_spec, cls_spec, attn_spec],
        out_specs=tuple(grad_specs),
        out_shape=tuple(grad_shapes),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),   # param grads accumulate
            vmem_limit_bytes=110 * 1024 * 1024),
        interpret=pltpu.InterpretParams() if interpret else False,
    )(cls, x, *params, attn, osave, msave, dy, dattn)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4))
def fused_class_attn_block(cls, x, params, num_heads, interpret):
    """cls: (B, t, D) class tokens; x: (B, P, D) patch stream; params:
    18-tuple in _unpack order (ln1 g/b, wq/bq, wk/bk, wv/bv, wp/bp, gamma1,
    ln2 g/b, w1/b1, w2/b2, gamma2). Returns (new_cls (B, t, D),
    attn (B, H, t, t+P) f32 softmax probabilities — the CAM source)."""
    out, attn = _fwd_call(cls, x, params, H=num_heads, interpret=interpret)
    return out, attn


def _fused_ca_fwd(cls, x, params, num_heads, interpret):
    out, attn, osave, msave = _fwd_call(cls, x, params, H=num_heads,
                                        interpret=interpret,
                                        save_residuals=True)
    return (out, attn), (cls, x, params, attn, osave, msave)


def _fused_ca_bwd(num_heads, interpret, res, cts):
    cls, x, params, attn, osave, msave = res
    dy, dattn = cts
    grads = _bwd_call(cls, x, params, attn, osave, msave,
                      dy.astype(jnp.float32), dattn.astype(jnp.float32),
                      H=num_heads, interpret=interpret)
    dcls = grads[0].astype(cls.dtype)
    dx = grads[1].astype(x.dtype)
    dparams = tuple(g.astype(p.dtype) for g, p in zip(grads[2:], params))
    return dcls, dx, dparams


fused_class_attn_block.defvjp(_fused_ca_fwd, _fused_ca_bwd)
