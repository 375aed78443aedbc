"""Fully-fused Conditional-DETR decoder layer (Pallas TPU): ONE kernel per
direction for the whole layer (reference transformer.py:313-427):

  self-attn (content+pos projected q/k, per-set isolation)
  -> LN1 -> conditional cross-attn at 2*d_model (per-head content||spatial
  concat, implemented as a sum of two half-dots) -> LN2 -> FFN -> LN3,

with all six dropout sites (self/cross attention probs + the four residual
dropouts, reference transformer.py:355-427) in-kernel via the TPU PRNG.

Why: each decoder layer is ~14 small Dense ops + 2 attentions + 3 LNs +
4 residual/dropout stages — at (B, 600, 192) every one is an HBM round trip
plus a tunnel dispatch, and XLA cannot fuse across the attention calls.
One kernel per direction reads tgt/memory once and keeps every intermediate
(projections, per-head attention maps, FFN hidden) in VMEM.

Query sets: the base + refinement query sets are stacked along the query
axis (models/transformer.py num_sets); self-attention isolates them by
looping the S set slices. The wrapper pads each set's Q to a multiple of 8
(Mosaic sublane tiling) and masks padded query KEYS with -1e9; padded rows
ride along and are dropped on unpad.

Backward is remat-style like ops/pallas_block.py: recompute the forward
from the saved layer inputs, hand-backprop the chain (attention backwards
regenerate identical dropout masks by the seed/tag contract), accumulate
parameter grads across the sequential batch grid axis.

Numerics: matmul operands keep the input dtype (bf16 on the recipe) with
f32 accumulation; LN statistics (eps 1e-5), softmax and grad accumulators
are f32. Cross-attention scale is (2*d_model/H)^-0.5 — the concat runs at
doubled head dim, reference transformer.py:417-419.
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
    pltpu.prng_seed(_seed_for(seed_ref, b, tag))
    (keep,), kp = _dropout_masks(x.shape, 1, rate)
    return jnp.where(keep, x / kp, 0.0), keep, kp


def _dense(x, w_ref, b_ref):
    return _dot(x, w_ref[...]) + b_ref[0][None, :]


def _n_params(has_qpos: bool) -> int:
    return 36 if has_qpos else 34


def _unpack(ps, has_qpos):
    """Kernel param refs -> named dict, in the wrapper's tuple order."""
    names = ["w_saq", "b_saq", "w_saqp", "b_saqp", "w_sak", "b_sak",
             "w_sakp", "b_sakp", "w_sav", "b_sav", "w_sao", "b_sao",
             "g1", "b1",
             "w_caq", "b_caq", "w_cak", "b_cak", "w_cav", "b_cav",
             "w_cakp", "b_cakp"]
    if has_qpos:
        names += ["w_caqp", "b_caqp"]
    names += ["w_sine", "b_sine", "w_cao", "b_cao", "g2", "b2",
              "w1", "bb1", "w2", "bb2", "g3", "b3"]
    assert len(ps) == len(names), (len(ps), len(names))
    return dict(zip(names, ps))


def _self_attention(q, k, v, qbias, seed_ref, b, H, S, Qp, drop_rate,
                    bwd_do=None):
    """Per-set per-head self-attention over (S*Qp, D) arrays.

    Forward (bwd_do None): returns o (S*Qp, D) f32 list-of-heads concat.
    Backward (bwd_do = d(attn out) f32): returns (dq, dk, dv) f32."""
    D = q.shape[1]
    dh = D // H
    scale = dh ** -0.5
    in_dt = q.dtype
    if bwd_do is None:
        out_rows = []
    else:
        dq = jnp.zeros((S * Qp, D), jnp.float32)
        dk = jnp.zeros((S * Qp, D), jnp.float32)
        dv = jnp.zeros((S * Qp, D), jnp.float32)
        dqs, dks, dvs = [], [], []
    for s in range(S):
        rs = slice(s * Qp, (s + 1) * Qp)
        hq, hk, hv = [], [], []
        for h in range(H):
            cs = slice(h * dh, (h + 1) * dh)
            logits = (_dot(q[rs, cs], k[rs, cs], tb=True) * scale
                      + qbias[0][None, :])
            m = jnp.max(logits, axis=-1, keepdims=True)
            e = jnp.exp(logits - m)
            p = e / jnp.sum(e, axis=-1, keepdims=True)
            if drop_rate > 0.0:
                pltpu.prng_seed(_seed_for(seed_ref, b, 100 + s * H + h))
                (keep,), kp = _dropout_masks((Qp, Qp), 1, drop_rate)
                zd = jnp.where(keep, p / kp, 0.0)
            else:
                zd = p
            if bwd_do is None:
                hq.append(_dot(zd.astype(in_dt), v[rs, cs]))
            else:
                doh = bwd_do[rs, cs].astype(in_dt)
                dzd = _dot(doh, v[rs, cs], tb=True)
                hv.append(_dot(zd.astype(in_dt), doh, ta=True))
                dp = (jnp.where(keep, dzd / kp, 0.0)
                      if drop_rate > 0.0 else dzd)
                dl = p * (dp - jnp.sum(dp * p, axis=-1, keepdims=True))
                dlc = dl.astype(in_dt)
                hq.append(scale * _dot(dlc, k[rs, cs]))
                hk.append(scale * _dot(dlc, q[rs, cs], ta=True))
        if bwd_do is None:
            out_rows.append(jnp.concatenate(hq, axis=1))
        else:
            dqs.append(jnp.concatenate(hq, axis=1))
            dks.append(jnp.concatenate(hk, axis=1))
            dvs.append(jnp.concatenate(hv, axis=1))
    if bwd_do is None:
        return jnp.concatenate(out_rows, axis=0)          # (S*Qp, D) f32
    return (jnp.concatenate(dqs, axis=0), jnp.concatenate(dks, axis=0),
            jnp.concatenate(dvs, axis=0))


def _split_to(ref, x, H, dh):
    """Write (N, H*dh) -> head-major scratch ref (H, N, dh) (static writes)."""
    for h in range(H):
        ref[h] = x[:, h * dh:(h + 1) * dh].astype(ref.dtype)


def _concat_from(ref, H):
    """Head-major scratch ref (H, N, dh) -> (N, H*dh)."""
    return jnp.concatenate([ref[h] for h in range(H)], axis=1)


def _cross_fwd_loop(qc3, s3, kc3, kp3, v3, o3, bias, seed_ref, b, H, dh,
                    drop_rate):
    """Conditional cross-attention per head over head-major scratch:
    logits_h = scale*(qc_h kc_h^T + sine_h kp_h^T) + bias;
    o3[h] = drop(softmax(logits)) v_h. One fori_loop body instance keeps the
    (SQ, N) temporaries allocated once, not per unrolled head."""
    scale = (2 * dh) ** -0.5

    def body(h, carry):
        logits = (_dot(qc3[h], kc3[h], tb=True)
                  + _dot(s3[h], kp3[h], tb=True)) * scale + bias[None, :]
        m = jnp.max(logits, axis=-1, keepdims=True)
        e = jnp.exp(logits - m)
        p = e / jnp.sum(e, axis=-1, keepdims=True)
        if drop_rate > 0.0:
            pltpu.prng_seed(_seed_for(seed_ref, b, 1000) + h)
            (keep,), kpk = _dropout_masks(logits.shape, 1, drop_rate)
            p = jnp.where(keep, p / kpk, 0.0)
        o3[h] = _dot(p.astype(qc3.dtype), v3[h]).astype(o3.dtype)
        return carry

    jax.lax.fori_loop(0, H, body, 0)


def _cross_bwd_loop(qc3, s3, kc3, kp3, v3, do3, dqc3, dsine3, dkc3, dkp3,
                    dv3, bias, seed_ref, b, H, dh, drop_rate):
    """Backward of _cross_fwd_loop (masks regenerated by the same seeds)."""
    scale = (2 * dh) ** -0.5

    def body(h, carry):
        logits = (_dot(qc3[h], kc3[h], tb=True)
                  + _dot(s3[h], kp3[h], tb=True)) * scale + bias[None, :]
        m = jnp.max(logits, axis=-1, keepdims=True)
        e = jnp.exp(logits - m)
        p = e / jnp.sum(e, axis=-1, keepdims=True)
        doh = do3[h]
        dzd = _dot(doh, v3[h], tb=True)
        if drop_rate > 0.0:
            pltpu.prng_seed(_seed_for(seed_ref, b, 1000) + h)
            (keep,), kpk = _dropout_masks(logits.shape, 1, drop_rate)
            zd = jnp.where(keep, p / kpk, 0.0)
            dp = jnp.where(keep, dzd / kpk, 0.0)
        else:
            zd, dp = p, dzd
        dv3[h] = _dot(zd.astype(qc3.dtype), doh, ta=True).astype(dv3.dtype)
        dl = p * (dp - jnp.sum(dp * p, axis=-1, keepdims=True))
        dlc = dl.astype(qc3.dtype)
        dqc3[h] = (scale * _dot(dlc, kc3[h])).astype(dqc3.dtype)
        dsine3[h] = (scale * _dot(dlc, kp3[h])).astype(dsine3.dtype)
        dkc3[h] = (scale * _dot(dlc, qc3[h], ta=True)).astype(dkc3.dtype)
        dkp3[h] = (scale * _dot(dlc, s3[h], ta=True)).astype(dkp3.dtype)
        return carry

    jax.lax.fori_loop(0, H, body, 0)


def _dec_fwd_kernel(*refs, H: int, S: int, has_qpos: bool, drop_rate: float,
                    save_residuals: bool = False):
    # With save_residuals the differentiated forward also writes the
    # self-attention output (input dtype), the cross-attention output
    # (input dtype) and the post-dropout FFN output (f32) so the backward
    # skips recomputing both attention forwards and the fc2 matmul
    # (~17% of its FLOPs). Same math to f32 ulp.
    (tgt_ref, mem_ref, pos_ref, qpos_ref, sine_ref, bias_ref,
     qbias_ref) = refs[:7]
    np_ = _n_params(has_qpos)
    P = _unpack(refs[7:7 + np_], has_qpos)
    seed_ref = refs[7 + np_]
    o_ref = refs[8 + np_]
    idx = 9 + np_
    if save_residuals:
        osasave_ref, ocasave_ref, h2save_ref = refs[idx:idx + 3]
        idx += 3
    qc3, s3, kc3, kp3, v3, o3 = refs[idx:]

    b = pl.program_id(0)
    tgt = tgt_ref[0]                                   # (SQp, D)
    mem = mem_ref[0]                                   # (N, D)
    pos = pos_ref[0]
    qpos = qpos_ref[0]
    sine_in = sine_ref[0]
    SQ, D = tgt.shape
    Qp = SQ // S
    in_dt = tgt.dtype
    bias = bias_ref[0, 0].astype(jnp.float32)

    # ---- self-attention ----
    q = (_dense(tgt, P["w_saq"], P["b_saq"])
         + _dense(qpos, P["w_saqp"], P["b_saqp"])).astype(in_dt)
    k = (_dense(tgt, P["w_sak"], P["b_sak"])
         + _dense(qpos, P["w_sakp"], P["b_sakp"])).astype(in_dt)
    v = _dense(tgt, P["w_sav"], P["b_sav"]).astype(in_dt)
    o_sa = _self_attention(q, k, v, qbias_ref, seed_ref, b, H, S, Qp,
                           drop_rate)
    sa = _dense(o_sa.astype(in_dt), P["w_sao"], P["b_sao"])
    if drop_rate > 0.0:
        sa, _, _ = _drop(sa, seed_ref, b, 5000, drop_rate)
    t1, _, _ = _ln_fwd(tgt.astype(jnp.float32) + sa, P["g1"][0], P["b1"][0],
                       eps=_EPS)
    t1c = t1.astype(in_dt)

    # ---- conditional cross-attention ----
    D_ = tgt.shape[1]
    dh = D_ // H
    qc = _dense(t1c, P["w_caq"], P["b_caq"])
    kc = _dense(mem, P["w_cak"], P["b_cak"])
    vv = _dense(mem, P["w_cav"], P["b_cav"])
    kpos = _dense(pos, P["w_cakp"], P["b_cakp"])
    if has_qpos:
        qc = qc + _dense(qpos, P["w_caqp"], P["b_caqp"])
        kc = kc + kpos
    sine_p = _dense(sine_in, P["w_sine"], P["b_sine"])
    _split_to(qc3, qc, H, dh)
    _split_to(s3, sine_p, H, dh)
    _split_to(kc3, kc, H, dh)
    _split_to(kp3, kpos, H, dh)
    _split_to(v3, vv, H, dh)
    _cross_fwd_loop(qc3, s3, kc3, kp3, v3, o3, bias, seed_ref, b, H, dh,
                    drop_rate)
    o_ca = _concat_from(o3, H)
    ca = _dense(o_ca, P["w_cao"], P["b_cao"])
    if drop_rate > 0.0:
        ca, _, _ = _drop(ca, seed_ref, b, 5500, drop_rate)
    t2, _, _ = _ln_fwd(t1 + ca, P["g2"][0], P["b2"][0], eps=_EPS)
    t2c = t2.astype(in_dt)

    # ---- FFN ----
    u = _dense(t2c, P["w1"], P["bb1"])
    ur = jnp.maximum(u, 0.0)
    if drop_rate > 0.0:
        ur, _, _ = _drop(ur, seed_ref, b, 6000, drop_rate)
    h2 = _dense(ur.astype(in_dt), P["w2"], P["bb2"])
    if drop_rate > 0.0:
        h2, _, _ = _drop(h2, seed_ref, b, 7000, drop_rate)
    out, _, _ = _ln_fwd(t2 + h2, P["g3"][0], P["b3"][0], eps=_EPS)
    o_ref[0] = out.astype(o_ref.dtype)
    if save_residuals:
        osasave_ref[0] = o_sa.astype(osasave_ref.dtype)
        ocasave_ref[0] = o_ca
        h2save_ref[0] = h2


def _dec_bwd_kernel(*refs, H: int, S: int, has_qpos: bool, drop_rate: float,
                    use_saved: bool = False):
    (tgt_ref, mem_ref, pos_ref, qpos_ref, sine_ref, bias_ref,
     qbias_ref) = refs[:7]
    np_ = _n_params(has_qpos)
    P = _unpack(refs[7:7 + np_], has_qpos)
    seed_ref = refs[7 + np_]
    dy_ref = refs[8 + np_]
    idx = 9 + np_
    if use_saved:
        osasave_ref, ocasave_ref, h2save_ref = refs[idx:idx + 3]
        idx += 3
    douts = refs[idx:idx + 5 + np_]
    (dtgt_ref, dmem_ref, dpos_ref, dqpos_ref, dsine_ref) = douts[:5]
    G = _unpack(douts[5:], has_qpos)
    (qc3, s3, kc3, kp3, v3, o3, do3, dqc3, dsine3, dkc3, dkp3,
     dv3) = refs[idx + 5 + np_:]

    b = pl.program_id(0)
    tgt = tgt_ref[0]
    mem = mem_ref[0]
    pos = pos_ref[0]
    qpos = qpos_ref[0]
    sine_in = sine_ref[0]
    SQ, D = tgt.shape
    Qp = SQ // S
    in_dt = tgt.dtype
    bias = bias_ref[0, 0].astype(jnp.float32)

    @pl.when(b == 0)
    def _init():
        for r in douts[5:]:
            r[...] = jnp.zeros_like(r)

    # ---- recompute forward ----
    q = (_dense(tgt, P["w_saq"], P["b_saq"])
         + _dense(qpos, P["w_saqp"], P["b_saqp"])).astype(in_dt)
    k = (_dense(tgt, P["w_sak"], P["b_sak"])
         + _dense(qpos, P["w_sakp"], P["b_sakp"])).astype(in_dt)
    v = _dense(tgt, P["w_sav"], P["b_sav"]).astype(in_dt)
    if use_saved:
        o_sa_c = osasave_ref[0]
    else:
        o_sa = _self_attention(q, k, v, qbias_ref, seed_ref, b, H, S, Qp,
                               drop_rate)
        o_sa_c = o_sa.astype(in_dt)
    sa = _dense(o_sa_c, P["w_sao"], P["b_sao"])
    if drop_rate > 0.0:
        sad, keep_sa, kp_sa = _drop(sa, seed_ref, b, 5000, drop_rate)
    else:
        sad = sa
    t1, xhat1, inv1 = _ln_fwd(tgt.astype(jnp.float32) + sad, P["g1"][0],
                              P["b1"][0], eps=_EPS)
    t1c = t1.astype(in_dt)

    dh = D // H
    qc0 = _dense(t1c, P["w_caq"], P["b_caq"])
    kc0 = _dense(mem, P["w_cak"], P["b_cak"])
    vv = _dense(mem, P["w_cav"], P["b_cav"])
    kpos = _dense(pos, P["w_cakp"], P["b_cakp"])
    if has_qpos:
        qc = qc0 + _dense(qpos, P["w_caqp"], P["b_caqp"])
        kc = kc0 + kpos
    else:
        qc, kc = qc0, kc0
    sine_p = _dense(sine_in, P["w_sine"], P["b_sine"])
    _split_to(qc3, qc, H, dh)
    _split_to(s3, sine_p, H, dh)
    _split_to(kc3, kc, H, dh)
    _split_to(kp3, kpos, H, dh)
    _split_to(v3, vv, H, dh)
    if use_saved:
        o_ca_c = ocasave_ref[0]
    else:
        _cross_fwd_loop(qc3, s3, kc3, kp3, v3, o3, bias, seed_ref, b, H, dh,
                        drop_rate)
        o_ca_c = _concat_from(o3, H)
    ca = _dense(o_ca_c, P["w_cao"], P["b_cao"])
    if drop_rate > 0.0:
        cad, keep_ca, kp_ca = _drop(ca, seed_ref, b, 5500, drop_rate)
    else:
        cad = ca
    t2, xhat2, inv2 = _ln_fwd(t1 + cad, P["g2"][0], P["b2"][0], eps=_EPS)
    t2c = t2.astype(in_dt)

    u = _dense(t2c, P["w1"], P["bb1"])
    ur = jnp.maximum(u, 0.0)
    if drop_rate > 0.0:
        urd, keep_u, kp_u = _drop(ur, seed_ref, b, 6000, drop_rate)
    else:
        urd = ur
    urd_c = urd.astype(in_dt)
    if use_saved:
        # fc2 recompute skipped; regenerate only the dropout mask
        if drop_rate > 0.0:
            pltpu.prng_seed(_seed_for(seed_ref, b, 7000))
            (keep_h2,), kp_h2 = _dropout_masks((SQ, D), 1, drop_rate)
        h2d = h2save_ref[0]
    else:
        h2 = _dense(urd_c, P["w2"], P["bb2"])
        if drop_rate > 0.0:
            h2d, keep_h2, kp_h2 = _drop(h2, seed_ref, b, 7000, drop_rate)
        else:
            h2d = h2
    _, xhat3, inv3 = _ln_fwd(t2 + h2d, P["g3"][0], P["b3"][0], eps=_EPS)

    # ---- backward ----
    dy = dy_ref[0].astype(jnp.float32)
    dy3, dg3, db3 = _ln_bwd(dy, xhat3, inv3, P["g3"][0])
    G["g3"][0] += dg3
    G["b3"][0] += db3

    dh2 = (jnp.where(keep_h2, dy3 / kp_h2, 0.0) if drop_rate > 0.0 else dy3)
    G["w2"][...] += _dot(urd_c, dh2.astype(in_dt), ta=True)
    G["bb2"][0] += jnp.sum(dh2, axis=0)
    durd = _dot(dh2.astype(in_dt), P["w2"][...], tb=True)
    dur = (jnp.where(keep_u, durd / kp_u, 0.0) if drop_rate > 0.0 else durd)
    du = jnp.where(u > 0.0, dur, 0.0)
    G["w1"][...] += _dot(t2c, du.astype(in_dt), ta=True)
    G["bb1"][0] += jnp.sum(du, axis=0)
    dt2 = dy3 + _dot(du.astype(in_dt), P["w1"][...], tb=True)

    dy2, dg2, db2 = _ln_bwd(dt2, xhat2, inv2, P["g2"][0])
    G["g2"][0] += dg2
    G["b2"][0] += db2

    # cross-attention branch
    dca = (jnp.where(keep_ca, dy2 / kp_ca, 0.0) if drop_rate > 0.0 else dy2)
    G["w_cao"][...] += _dot(o_ca_c, dca.astype(in_dt), ta=True)
    G["b_cao"][0] += jnp.sum(dca, axis=0)
    do_ca = _dot(dca.astype(in_dt), P["w_cao"][...], tb=True)
    _split_to(do3, do_ca, H, dh)
    _cross_bwd_loop(qc3, s3, kc3, kp3, v3, do3, dqc3, dsine3, dkc3, dkp3,
                    dv3, bias, seed_ref, b, H, dh, drop_rate)
    dqc = _concat_from(dqc3, H).astype(jnp.float32)
    dsine_p = _concat_from(dsine3, H).astype(jnp.float32)
    dkc = _concat_from(dkc3, H).astype(jnp.float32)
    dkp = _concat_from(dkp3, H).astype(jnp.float32)
    dvv = _concat_from(dv3, H).astype(jnp.float32)

    G["w_sine"][...] += _dot(sine_in, dsine_p.astype(in_dt), ta=True)
    G["b_sine"][0] += jnp.sum(dsine_p, axis=0)
    dsine_ref[0] = _dot(dsine_p.astype(in_dt), P["w_sine"][...],
                        tb=True).astype(dsine_ref.dtype)

    dqpos_acc = jnp.zeros((SQ, D), jnp.float32)
    if has_qpos:
        # qc = qc0 + qpos@w_caqp; kc = kc0 + kpos (kpos also in the concat)
        G["w_caqp"][...] += _dot(qpos, dqc.astype(in_dt), ta=True)
        G["b_caqp"][0] += jnp.sum(dqc, axis=0)
        dqpos_acc += _dot(dqc.astype(in_dt), P["w_caqp"][...], tb=True)
        dkp = dkp + dkc
    G["w_caq"][...] += _dot(t1c, dqc.astype(in_dt), ta=True)
    G["b_caq"][0] += jnp.sum(dqc, axis=0)
    dt1 = dy2 + _dot(dqc.astype(in_dt), P["w_caq"][...], tb=True)

    G["w_cak"][...] += _dot(mem, dkc.astype(in_dt), ta=True)
    G["b_cak"][0] += jnp.sum(dkc, axis=0)
    G["w_cav"][...] += _dot(mem, dvv.astype(in_dt), ta=True)
    G["b_cav"][0] += jnp.sum(dvv, axis=0)
    dmem = (_dot(dkc.astype(in_dt), P["w_cak"][...], tb=True)
            + _dot(dvv.astype(in_dt), P["w_cav"][...], tb=True))
    dmem_ref[0] = dmem.astype(dmem_ref.dtype)
    G["w_cakp"][...] += _dot(pos, dkp.astype(in_dt), ta=True)
    G["b_cakp"][0] += jnp.sum(dkp, axis=0)
    dpos_ref[0] = _dot(dkp.astype(in_dt), P["w_cakp"][...],
                       tb=True).astype(dpos_ref.dtype)

    # self-attention branch
    dy1, dg1, db1 = _ln_bwd(dt1, xhat1, inv1, P["g1"][0])
    G["g1"][0] += dg1
    G["b1"][0] += db1
    dsa = (jnp.where(keep_sa, dy1 / kp_sa, 0.0) if drop_rate > 0.0 else dy1)
    G["w_sao"][...] += _dot(o_sa_c, dsa.astype(in_dt), ta=True)
    G["b_sao"][0] += jnp.sum(dsa, axis=0)
    do_sa = _dot(dsa.astype(in_dt), P["w_sao"][...], tb=True)
    dq, dk, dv = _self_attention(q, k, v, qbias_ref, seed_ref, b, H, S, Qp,
                                 drop_rate, bwd_do=do_sa)

    G["w_saq"][...] += _dot(tgt, dq.astype(in_dt), ta=True)
    G["b_saq"][0] += jnp.sum(dq, axis=0)
    G["w_saqp"][...] += _dot(qpos, dq.astype(in_dt), ta=True)
    G["b_saqp"][0] += jnp.sum(dq, axis=0)
    G["w_sak"][...] += _dot(tgt, dk.astype(in_dt), ta=True)
    G["b_sak"][0] += jnp.sum(dk, axis=0)
    G["w_sakp"][...] += _dot(qpos, dk.astype(in_dt), ta=True)
    G["b_sakp"][0] += jnp.sum(dk, axis=0)
    G["w_sav"][...] += _dot(tgt, dv.astype(in_dt), ta=True)
    G["b_sav"][0] += jnp.sum(dv, axis=0)

    dtgt = (dy1
            + _dot(dq.astype(in_dt), P["w_saq"][...], tb=True)
            + _dot(dk.astype(in_dt), P["w_sak"][...], tb=True)
            + _dot(dv.astype(in_dt), P["w_sav"][...], tb=True))
    dtgt_ref[0] = dtgt.astype(dtgt_ref.dtype)
    dqpos_acc = (dqpos_acc
                 + _dot(dq.astype(in_dt), P["w_saqp"][...], tb=True)
                 + _dot(dk.astype(in_dt), P["w_sakp"][...], tb=True))
    dqpos_ref[0] = dqpos_acc.astype(dqpos_ref.dtype)


def _specs(SQ, N, D, params):
    def rep(shape):
        return pl.BlockSpec(shape, lambda b: tuple(0 for _ in shape),
                            memory_space=pltpu.VMEM)

    t_spec = pl.BlockSpec((1, SQ, D), lambda b: (b, 0, 0),
                          memory_space=pltpu.VMEM)
    m_spec = pl.BlockSpec((1, N, D), lambda b: (b, 0, 0),
                          memory_space=pltpu.VMEM)
    bias_spec = pl.BlockSpec((1, 1, N), lambda b: (b, 0, 0),
                             memory_space=pltpu.VMEM)
    p_specs = [rep(p.shape) for p in params]
    return t_spec, m_spec, bias_spec, p_specs, rep


@functools.partial(jax.jit, static_argnames=("H", "S", "has_qpos",
                                             "interpret", "drop_rate",
                                             "save_residuals"))
def _fwd_call(tgt, mem, pos, qpos, sine, bias, qbias, params, seed, *, H, S,
              has_qpos, interpret, drop_rate, save_residuals=False):
    B, SQ, D = tgt.shape
    N = mem.shape[1]
    t_spec, m_spec, bias_spec, p_specs, rep = _specs(SQ, N, D, params)
    dh = D // H
    dt = tgt.dtype
    out_specs = t_spec
    out_shape = jax.ShapeDtypeStruct((B, SQ, D), tgt.dtype)
    if save_residuals:
        out_specs = (t_spec, t_spec, t_spec, t_spec)
        out_shape = (out_shape,
                     jax.ShapeDtypeStruct((B, SQ, D), tgt.dtype),    # o_sa
                     jax.ShapeDtypeStruct((B, SQ, D), tgt.dtype),    # o_ca
                     jax.ShapeDtypeStruct((B, SQ, D), jnp.float32))  # h2
    return pl.pallas_call(
        functools.partial(_dec_fwd_kernel, H=H, S=S, has_qpos=has_qpos,
                          drop_rate=drop_rate, save_residuals=save_residuals),
        grid=(B,),
        in_specs=[t_spec, m_spec, m_spec, t_spec, t_spec, bias_spec,
                  rep(qbias.shape)] + p_specs
        + [pl.BlockSpec(memory_space=pltpu.SMEM)],
        out_specs=out_specs,
        out_shape=out_shape,
        scratch_shapes=[pltpu.VMEM((H, SQ, dh), dt),     # qc3
                        pltpu.VMEM((H, SQ, dh), dt),     # s3
                        pltpu.VMEM((H, N, dh), dt),      # kc3
                        pltpu.VMEM((H, N, dh), dt),      # kp3
                        pltpu.VMEM((H, N, dh), dt),      # v3
                        pltpu.VMEM((H, SQ, dh), dt)],    # o3
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel",),
            vmem_limit_bytes=110 * 1024 * 1024),
        interpret=pltpu.InterpretParams() if interpret else False,
    )(tgt, mem, pos, qpos, sine, bias, qbias, *params, seed)


@functools.partial(jax.jit, static_argnames=("H", "S", "has_qpos",
                                             "interpret", "drop_rate"))
def _bwd_call(tgt, mem, pos, qpos, sine, bias, qbias, params, seed, dy,
              osasave=None, ocasave=None, h2save=None, *, H,
              S, has_qpos, interpret, drop_rate):
    B, SQ, D = tgt.shape
    N = mem.shape[1]
    t_spec, m_spec, bias_spec, p_specs, rep = _specs(SQ, N, D, params)
    use_saved = osasave is not None
    extra_in = [osasave, ocasave, h2save] if use_saved else []
    extra_specs = [t_spec, t_spec, t_spec] if use_saved else []
    grad_shapes = ([jax.ShapeDtypeStruct((B, SQ, D), jnp.float32),
                    jax.ShapeDtypeStruct((B, N, D), jnp.float32),
                    jax.ShapeDtypeStruct((B, N, D), jnp.float32),
                    jax.ShapeDtypeStruct((B, SQ, D), jnp.float32),
                    jax.ShapeDtypeStruct((B, SQ, D), jnp.float32)]
                   + [jax.ShapeDtypeStruct(p.shape, jnp.float32)
                      for p in params])
    grad_specs = ([t_spec, m_spec, m_spec, t_spec, t_spec]
                  + [rep(p.shape) for p in params])
    dh = D // H
    dt = tgt.dtype
    return pl.pallas_call(
        functools.partial(_dec_bwd_kernel, H=H, S=S, has_qpos=has_qpos,
                          drop_rate=drop_rate, use_saved=use_saved),
        grid=(B,),
        in_specs=[t_spec, m_spec, m_spec, t_spec, t_spec, bias_spec,
                  rep(qbias.shape)] + p_specs
        + [pl.BlockSpec(memory_space=pltpu.SMEM), t_spec] + extra_specs,
        out_specs=tuple(grad_specs),
        out_shape=tuple(grad_shapes),
        scratch_shapes=[pltpu.VMEM((H, SQ, dh), dt),           # qc3
                        pltpu.VMEM((H, SQ, dh), dt),           # s3
                        pltpu.VMEM((H, N, dh), dt),            # kc3
                        pltpu.VMEM((H, N, dh), dt),            # kp3
                        pltpu.VMEM((H, N, dh), dt),            # v3
                        pltpu.VMEM((H, SQ, dh), dt),           # o3
                        pltpu.VMEM((H, SQ, dh), dt),           # do3
                        pltpu.VMEM((H, SQ, dh), jnp.float32),  # dqc3
                        pltpu.VMEM((H, SQ, dh), jnp.float32),  # dsine3
                        pltpu.VMEM((H, N, dh), jnp.float32),   # dkc3
                        pltpu.VMEM((H, N, dh), jnp.float32),   # dkp3
                        pltpu.VMEM((H, N, dh), jnp.float32)],  # dv3
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
            vmem_limit_bytes=110 * 1024 * 1024),
        interpret=pltpu.InterpretParams() if interpret else False,
    )(tgt, mem, pos, qpos, sine, bias, qbias, *params, seed, dy, *extra_in)


@functools.partial(jax.custom_vjp, nondiff_argnums=(5, 6, 7, 8))
def fused_decoder_layer(tgt, mem, pos, qpos, sine, num_heads, num_sets,
                        interpret, drop_rate, params):
    """One whole conditional decoder layer. tgt/qpos/sine: (B, S*Qp, D) with
    per-set queries padded to Qp (multiple of 8); mem/pos: (B, N, D);
    params: tuple in _unpack order (34 entries, or 36 with the first-layer
    ca_qpos_proj) followed by bias (B,1,N), qbias (1, Qp), seed (1,).
    Returns the layer output (B, S*Qp, D) in tgt.dtype."""
    *ps, bias, qbias, seed = params
    has_qpos = len(ps) == 36
    return _fwd_call(tgt, mem, pos, qpos, sine, bias, qbias, tuple(ps), seed,
                     H=num_heads, S=num_sets, has_qpos=has_qpos,
                     interpret=interpret, drop_rate=drop_rate)


def _fused_dec_fwd(tgt, mem, pos, qpos, sine, num_heads, num_sets, interpret,
                   drop_rate, params):
    from spe_tpu.ops.pallas_block import _save_residuals_enabled

    if not _save_residuals_enabled():
        y = fused_decoder_layer(tgt, mem, pos, qpos, sine, num_heads,
                                num_sets, interpret, drop_rate, params)
        return y, (tgt, mem, pos, qpos, sine, params, None, None, None)
    *ps, bias, qbias, seed = params
    has_qpos = len(ps) == 36
    y, osa, oca, h2 = _fwd_call(tgt, mem, pos, qpos, sine, bias, qbias,
                                tuple(ps), seed, H=num_heads, S=num_sets,
                                has_qpos=has_qpos, interpret=interpret,
                                drop_rate=drop_rate, save_residuals=True)
    return y, (tgt, mem, pos, qpos, sine, params, osa, oca, h2)


def _fused_dec_bwd(num_heads, num_sets, interpret, drop_rate, res, dy):
    tgt, mem, pos, qpos, sine, params, osa, oca, h2 = res
    *ps, bias, qbias, seed = params
    has_qpos = len(ps) == 36
    grads = _bwd_call(tgt, mem, pos, qpos, sine, bias, qbias, tuple(ps),
                      seed, dy, osa, oca, h2,
                      H=num_heads, S=num_sets, has_qpos=has_qpos,
                      interpret=interpret, drop_rate=drop_rate)
    dtgt = grads[0].astype(tgt.dtype)
    dmem = grads[1].astype(mem.dtype)
    dpos = grads[2].astype(pos.dtype)
    dqpos = grads[3].astype(qpos.dtype)
    dsine = grads[4].astype(sine.dtype)
    dparams = tuple(g.astype(p.dtype) for g, p in zip(grads[5:], ps))
    return (dtgt, dmem, dpos, dqpos, dsine,
            dparams + (jnp.zeros_like(bias), jnp.zeros_like(qbias),
                       jnp.zeros_like(seed)))


fused_decoder_layer.defvjp(_fused_dec_fwd, _fused_dec_bwd)
