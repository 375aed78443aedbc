"""Fully-fused CaiT LayerScale block (Pallas TPU): ONE kernel per direction
for  x += dp(gamma1 * proj(talking_heads(LN1(x))));
     x += dp(gamma2 * mlp(LN2(x))).

Why: the per-op path costs ~10 XLA kernels + 1 Pallas kernel per block x 48
blocks x fwd/bwd — every elementwise stage (LN, LayerScale, residual, GELU,
dropout) is a separate HBM round trip over the (B, N, D) activations, and on
the axon tunnel each dispatch also pays a fixed launch cost. Here a whole
block reads x once and writes the block output once; every intermediate
(qkv, H attention maps, MLP hidden) lives in VMEM.

Backward is remat-style: the kernel recomputes the forward from the saved
block INPUT x (nothing else is stashed to HBM) and hand-backprops the whole
chain — LN, matmuls, talking-heads softmax mixing, GELU — accumulating
parameter grads across the sequential batch grid axis.

Dropout contract: all three recipe dropouts (attention 0.05 after the 2nd
head-mix, proj/MLP 0.07, stochastic depth 0.2 per sample per branch) run
in-kernel via the TPU PRNG. Masks are regenerated identically in the
backward kernel: same seed derivation, same generation ORDER (attention
masks per q-tile first, then proj, mlp-hidden, mlp-out, then the two
drop-path draws), same shapes.

Numerics: matmul operands keep the input dtype (bf16 on the recipe) with
f32 accumulation via preferred_element_type; LN statistics, softmax, GELU
and all gradient accumulators are f32. Reference semantics:
models/cait.py:396-416 (LayerScale_Block) with talking-heads attention
(:344-393) and timm Mlp (tanh-approx GELU, like flax nn.gelu).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from spe_tpu.ops.pallas_attention import _dropout_masks

_C = 0.7978845608028654  # sqrt(2/pi)
_A = 0.044715

# Backward-kernel policy knob: keep the per-tile attention internals alive
# across the MLP backward (fast) only while their total f32 footprint stays
# under this; above it, stream — recompute each tile's internals inside the
# backward loop. 80 MB leaves ~30 MB of the 110 MB VMEM budget for the
# rest of the block's working set.
STREAM_BWD_BYTES = 80 * 1024 * 1024


def _gelu(u):
    t = jnp.tanh(_C * (u + _A * u * u * u))
    return 0.5 * u * (1.0 + t)


def _gelu_grad(u):
    t = jnp.tanh(_C * (u + _A * u * u * u))
    return 0.5 * (1.0 + t) + 0.5 * u * (1.0 - t * t) * _C * (1.0 + 3.0 * _A * u * u)


def _ln_fwd(x, g, b, eps=1e-6):
    """x (N, D) any dtype -> (y_f32, xhat_f32, inv_std_f32)."""
    xf = x.astype(jnp.float32)
    mu = jnp.mean(xf, axis=-1, keepdims=True)
    xc = xf - mu
    var = jnp.mean(xc * xc, axis=-1, keepdims=True)
    inv = jax.lax.rsqrt(var + eps)
    xhat = xc * inv
    return xhat * g[None, :] + b[None, :], xhat, inv


def _ln_bwd(dy, xhat, inv, g):
    """Backward of LN wrt input; returns (dx, dg, db) in f32."""
    dxhat = dy * g[None, :]
    m1 = jnp.mean(dxhat, axis=-1, keepdims=True)
    m2 = jnp.mean(dxhat * xhat, axis=-1, keepdims=True)
    dx = (dxhat - m1 - xhat * m2) * inv
    return dx, jnp.sum(dy * xhat, axis=0), jnp.sum(dy, axis=0)


def _dot(a, b, ta=False, tb=False):
    dims = (((0,) if ta else (1,), (1,) if tb else (0,)), ((), ()))
    return jax.lax.dot_general(a, b, dimension_numbers=dims,
                               preferred_element_type=jnp.float32)


def _seed_for(seed_ref, b, tag):
    return seed_ref[0].astype(jnp.int32) + b * 65536 + tag


def _path_keep(seed_ref, b, tag, rate):
    """Per-sample stochastic-depth keep factor (0 or 1/keep), f32 scalar."""
    pltpu.prng_seed(_seed_for(seed_ref, b, tag))
    bits = pltpu.bitcast(pltpu.prng_random_bits((8, 128)), jnp.uint32)
    byte = bits[0, 0] & jnp.uint32(0xFF)
    thresh_i = int((1.0 - rate) * 255.0)
    keep_prob = (thresh_i + 1) / 256.0
    keep = (byte <= jnp.uint32(thresh_i)).astype(jnp.float32)
    return keep / keep_prob


def _mix_rows(wl_ref, scale, H, dh):
    """Per-output-head folded mix rows: row_g (1, D) f32 with
    row_g[0, h*dh:(h+1)*dh] = scale * wl[h, g], so the talking-heads
    pre-softmax mix becomes part of the QK^T contraction:
      mixed_g = sum_h wl[h,g] * (scale*q_h @ k_h^T)
              = (q_all * row_g) @ k_all^T        (the wl-fold).
    Justified by the roofline finding (scripts_dev/roofline.py): MXU dot
    time at these widths is shape-insensitive (K=48 vs 192 equal), while
    the H^2 mixing multiply-adds on (q_tile, N) arrays are serial VPU
    work — the fold moves them onto (q_tile, dh)-scale arrays."""
    return [jnp.concatenate(
        [jnp.broadcast_to(wl_ref[h, g] * scale, (1, dh)) for h in range(H)],
        axis=1).astype(jnp.float32) for g in range(H)]


def _attention(q_all, k_all, v, wl_ref, bl_ref, ww_ref, bw_ref, seed_ref, b,
               H, dh, q_tile, attn_drop, collect=None, need_out=True):
    """Talking-heads attention over VMEM-resident q_all/k_all (N, D) in
    input dtype and per-head v list ((N, dh)). Returns list of per-head
    (N, dh) f32 outputs. The pre-softmax head mix is folded into the Q side
    of the QK^T dot (see _mix_rows). `collect`, when given, receives
    per-tile intermediates for the backward. need_out=False skips the
    attention@V dots (backward path with the attention output restored
    from a forward-saved residual)."""
    N = q_all.shape[0]
    in_dt = q_all.dtype
    scale = dh ** -0.5
    rows = _mix_rows(wl_ref, scale, H, dh)
    outs = [[] for _ in range(H)]
    for t0 in range(0, N, q_tile):
        sl = slice(t0, t0 + q_tile)
        qf = q_all[sl].astype(jnp.float32)
        mixed = [_dot((qf * rows[g]).astype(in_dt), k_all, tb=True)
                 + bl_ref[g, 0] for g in range(H)]
        probs = []
        for g in range(H):
            m = jnp.max(mixed[g], axis=-1, keepdims=True)
            e = jnp.exp(mixed[g] - m)
            probs.append(e / jnp.sum(e, axis=-1, keepdims=True))
        z = []
        for g in range(H):
            s = probs[0] * ww_ref[0, g]
            for h in range(1, H):
                s = s + probs[h] * ww_ref[h, g]
            z.append(s + bw_ref[g, 0])
        if attn_drop > 0.0:
            pltpu.prng_seed(_seed_for(seed_ref, b, t0 // q_tile))
            keeps, kp = _dropout_masks((q_tile, N), H, attn_drop)
            zd = [jnp.where(keeps[h], z[h] / kp, 0.0) for h in range(H)]
        else:
            keeps, kp, zd = None, 1.0, z
        if collect is not None:
            collect.append(dict(sl=sl, probs=probs, keeps=keeps, kp=kp,
                                zd=zd))
        if need_out:
            for h in range(H):
                outs[h].append(_dot(zd[h].astype(v[h].dtype), v[h]))
    if not need_out:
        return None
    return [jnp.concatenate(o, axis=0) for o in outs]


def _block_fwd_kernel(x_ref, g1_ref, b1_ref, wqkv_ref, bqkv_ref, wl_ref,
                      bl_ref, ww_ref, bw_ref, wp_ref, bp_ref, gam1_ref,
                      g2_ref, b2_ref, w1_ref, bb1_ref, w2_ref, bb2_ref,
                      gam2_ref, seed_ref, o_ref, *res_refs, H: int,
                      q_tile: int, attn_drop: float, proj_drop: float,
                      path_drop: float):
    # res_refs, when present, are (osave_ref, mdsave_ref): the training
    # forward also writes the attention output o (input dtype) and the
    # post-dropout MLP output md (f32) so the remat-style backward can skip
    # recomputing the attention@V dots and the fc2 matmul (~13% of its
    # FLOPs) for ~1.2 MB/sample of HBM — the same math the backward's
    # recompute performs (agreement to f32 ulp across the two programs).
    b = pl.program_id(0)
    x = x_ref[0]                       # (N, D)
    N, D = x.shape
    dh = D // H
    in_dt = x.dtype

    h1n, _, _ = _ln_fwd(x, g1_ref[0], b1_ref[0])
    qkv = _dot(h1n.astype(in_dt), wqkv_ref[...]) + bqkv_ref[0][None, :]
    qkv = qkv.astype(in_dt)
    q_all = qkv[:, :D]
    k_all = qkv[:, D:2 * D]
    v = [qkv[:, 2 * D + h * dh:2 * D + (h + 1) * dh] for h in range(H)]

    o_heads = _attention(q_all, k_all, v, wl_ref, bl_ref, ww_ref, bw_ref,
                         seed_ref, b, H, dh, q_tile, attn_drop)
    o = jnp.concatenate([oh.astype(in_dt) for oh in o_heads], axis=1)  # (N, D)
    ao = _dot(o, wp_ref[...]) + bp_ref[0][None, :]                     # f32
    if proj_drop > 0.0:
        pltpu.prng_seed(_seed_for(seed_ref, b, 5000))
        (keep_p,), kp_p = _dropout_masks((N, D), 1, proj_drop)
        ao = jnp.where(keep_p, ao / kp_p, 0.0)
    dp1 = (_path_keep(seed_ref, b, 8000, path_drop)
           if path_drop > 0.0 else jnp.float32(1.0))
    x1 = x.astype(jnp.float32) + dp1 * gam1_ref[0][None, :] * ao

    h2n, _, _ = _ln_fwd(x1, g2_ref[0], b2_ref[0])
    u = _dot(h2n.astype(in_dt), w1_ref[...]) + bb1_ref[0][None, :]     # (N, 4D) f32
    ug = _gelu(u)
    if proj_drop > 0.0:
        pltpu.prng_seed(_seed_for(seed_ref, b, 6000))
        (keep_u,), kp_u = _dropout_masks(ug.shape, 1, proj_drop)
        ug = jnp.where(keep_u, ug / kp_u, 0.0)
    m = _dot(ug.astype(in_dt), w2_ref[...]) + bb2_ref[0][None, :]      # (N, D) f32
    if proj_drop > 0.0:
        pltpu.prng_seed(_seed_for(seed_ref, b, 7000))
        (keep_m,), kp_m = _dropout_masks(m.shape, 1, proj_drop)
        m = jnp.where(keep_m, m / kp_m, 0.0)
    dp2 = (_path_keep(seed_ref, b, 9000, path_drop)
           if path_drop > 0.0 else jnp.float32(1.0))
    out = x1 + dp2 * gam2_ref[0][None, :] * m
    o_ref[0] = out.astype(o_ref.dtype)
    if res_refs:
        osave_ref, mdsave_ref = res_refs
        osave_ref[0] = o
        mdsave_ref[0] = m


def _block_bwd_kernel(x_ref, g1_ref, b1_ref, wqkv_ref, bqkv_ref, wl_ref,
                      bl_ref, ww_ref, bw_ref, wp_ref, bp_ref, gam1_ref,
                      g2_ref, b2_ref, w1_ref, bb1_ref, w2_ref, bb2_ref,
                      gam2_ref, seed_ref, dy_ref, *rest, H: int, q_tile: int,
                      attn_drop: float, proj_drop: float, path_drop: float,
                      stream: bool, use_saved: bool):
    # rest = ([osave_ref, mdsave_ref,] dx_ref, dg1_ref, ..., dgam2_ref);
    # with use_saved the forward-saved attention output / MLP output skip
    # their recompute (attention@V dots and the fc2 matmul) — same math as
    # the recompute, to f32 ulp.
    if use_saved:
        osave_ref, mdsave_ref = rest[0], rest[1]
        rest = rest[2:]
    (dx_ref, dg1_ref, db1_ref, dwqkv_ref, dbqkv_ref,
     dwl_ref, dbl_ref, dww_ref, dbw_ref, dwp_ref, dbp_ref,
     dgam1_ref, dg2_ref, db2_ref, dw1_ref, dbb1_ref,
     dw2_ref, dbb2_ref, dgam2_ref) = rest
    b = pl.program_id(0)
    x = x_ref[0]
    N, D = x.shape
    dh = D // H
    in_dt = x.dtype
    scale = dh ** -0.5

    @pl.when(b == 0)
    def _init():
        for r in (dg1_ref, db1_ref, dwqkv_ref, dbqkv_ref, dwl_ref, dbl_ref,
                  dww_ref, dbw_ref, dwp_ref, dbp_ref, dgam1_ref, dg2_ref,
                  db2_ref, dw1_ref, dbb1_ref, dw2_ref, dbb2_ref, dgam2_ref):
            r[...] = jnp.zeros_like(r)

    # ---- recompute forward ----
    # With stream=False the per-tile attention internals (logits/probs/z,
    # ~3 f32 (q_tile, N) arrays per head per tile ≈ 48 MB at N=1024/H=4)
    # are collected here and stay ALIVE across the whole MLP backward.
    # That fits the 110 MB VMEM budget at recipe shapes and avoids any
    # recompute; for larger N·N·H footprints _bwd_call flips stream=True,
    # which re-recomputes each tile's internals inside the backward loop
    # (one extra QK^T+mix+softmax per tile, ~13% of bwd FLOPs) so nothing
    # per-tile outlives its loop iteration.
    h1n, xhat1, inv1 = _ln_fwd(x, g1_ref[0], b1_ref[0])
    h1n_c = h1n.astype(in_dt)
    qkv = _dot(h1n_c, wqkv_ref[...]) + bqkv_ref[0][None, :]
    qkv = qkv.astype(in_dt)
    q_all = qkv[:, :D]
    k_all = qkv[:, D:2 * D]
    v = [qkv[:, 2 * D + h * dh:2 * D + (h + 1) * dh] for h in range(H)]

    saved = None if stream else []
    if use_saved:
        # internals (probs/zd) are still needed for the attention
        # backward — collect them (or leave them to the per-tile stream
        # recompute) but skip the attention@V output dots
        if not stream:
            _attention(q_all, k_all, v, wl_ref, bl_ref, ww_ref, bw_ref,
                       seed_ref, b, H, dh, q_tile, attn_drop, collect=saved,
                       need_out=False)
        o = osave_ref[0]
    else:
        o_heads = _attention(q_all, k_all, v, wl_ref, bl_ref, ww_ref, bw_ref,
                             seed_ref, b, H, dh, q_tile, attn_drop,
                             collect=saved)
        o = jnp.concatenate([oh.astype(in_dt) for oh in o_heads], axis=1)
    ao = _dot(o, wp_ref[...]) + bp_ref[0][None, :]
    if proj_drop > 0.0:
        pltpu.prng_seed(_seed_for(seed_ref, b, 5000))
        (keep_p,), kp_p = _dropout_masks((N, D), 1, proj_drop)
        aod = jnp.where(keep_p, ao / kp_p, 0.0)
    else:
        keep_p, kp_p, aod = None, 1.0, ao
    dp1 = (_path_keep(seed_ref, b, 8000, path_drop)
           if path_drop > 0.0 else jnp.float32(1.0))
    x1 = x.astype(jnp.float32) + dp1 * gam1_ref[0][None, :] * aod

    h2n, xhat2, inv2 = _ln_fwd(x1, g2_ref[0], b2_ref[0])
    h2n_c = h2n.astype(in_dt)
    u = _dot(h2n_c, w1_ref[...]) + bb1_ref[0][None, :]
    ug = _gelu(u)
    if proj_drop > 0.0:
        pltpu.prng_seed(_seed_for(seed_ref, b, 6000))
        (keep_u,), kp_u = _dropout_masks(ug.shape, 1, proj_drop)
        ugd = jnp.where(keep_u, ug / kp_u, 0.0)
    else:
        keep_u, kp_u, ugd = None, 1.0, ug
    if use_saved:
        # fc2 recompute skipped; still need keep_m for the dm mask below
        if proj_drop > 0.0:
            pltpu.prng_seed(_seed_for(seed_ref, b, 7000))
            (keep_m,), kp_m = _dropout_masks((N, D), 1, proj_drop)
        else:
            keep_m, kp_m = None, 1.0
        md = mdsave_ref[0]
    else:
        m = _dot(ugd.astype(in_dt), w2_ref[...]) + bb2_ref[0][None, :]
        if proj_drop > 0.0:
            pltpu.prng_seed(_seed_for(seed_ref, b, 7000))
            (keep_m,), kp_m = _dropout_masks(m.shape, 1, proj_drop)
            md = jnp.where(keep_m, m / kp_m, 0.0)
        else:
            keep_m, kp_m, md = None, 1.0, m
    dp2 = (_path_keep(seed_ref, b, 9000, path_drop)
           if path_drop > 0.0 else jnp.float32(1.0))

    # ---- backward ----
    dy = dy_ref[0].astype(jnp.float32)            # d(out), (N, D)

    # MLP branch: out = x1 + dp2 * gamma2 * md
    dgam2_ref[0] += jnp.sum(dy * dp2 * md, axis=0)
    dmd = dy * dp2 * gam2_ref[0][None, :]
    dm = jnp.where(keep_m, dmd / kp_m, 0.0) if keep_m is not None else dmd
    dw2_ref[...] += _dot(ugd.astype(in_dt), dm.astype(in_dt), ta=True)
    dbb2_ref[0] += jnp.sum(dm, axis=0)
    dugd = _dot(dm.astype(in_dt), w2_ref[...], tb=True)
    dug = jnp.where(keep_u, dugd / kp_u, 0.0) if keep_u is not None else dugd
    du = dug * _gelu_grad(u)
    dw1_ref[...] += _dot(h2n_c, du.astype(in_dt), ta=True)
    dbb1_ref[0] += jnp.sum(du, axis=0)
    dh2n = _dot(du.astype(in_dt), w1_ref[...], tb=True)
    dx1_ln, dg2, db2 = _ln_bwd(dh2n, xhat2, inv2, g2_ref[0])
    dg2_ref[0] += dg2
    db2_ref[0] += db2
    dx1 = dy + dx1_ln                              # d(x1)

    # attention branch: x1 = x + dp1 * gamma1 * aod
    dgam1_ref[0] += jnp.sum(dx1 * dp1 * aod, axis=0)
    daod = dx1 * dp1 * gam1_ref[0][None, :]
    dao = jnp.where(keep_p, daod / kp_p, 0.0) if keep_p is not None else daod
    dwp_ref[...] += _dot(o, dao.astype(in_dt), ta=True)
    dbp_ref[0] += jnp.sum(dao, axis=0)
    do = _dot(dao.astype(in_dt), wp_ref[...], tb=True)  # (N, D) f32

    # per-tile attention backward (no scatter updates: dq tiles are
    # concatenated, dk/dv/mixing grads are whole-array adds). The wl-fold
    # applies here too: dq~_g = dmix_g @ k_all, dK += dmix_g^T @ q~_g,
    # dQ = sum_g dq~_g * row_g, dwl[h,g] = scale*sum(q_h (.) dq~_g[:, h·dh:])
    # — the backward never materializes logits. With stream=True each
    # tile's internals are recomputed here (same seeds, same _dropout_masks
    # order as the forward _attention per tile) and consumed immediately;
    # otherwise they come from `saved`.
    rows = _mix_rows(wl_ref, scale, H, dh)
    dq_tiles = []
    dk_all = jnp.zeros((N, D), jnp.float32)
    dv = [jnp.zeros((N, dh), jnp.float32) for _ in range(H)]
    dwl = jnp.zeros(dwl_ref.shape, jnp.float32)
    dbl = jnp.zeros(dbl_ref.shape, jnp.float32)
    dww = jnp.zeros(dww_ref.shape, jnp.float32)
    dbw = jnp.zeros(dbw_ref.shape, jnp.float32)
    for t0 in range(0, N, q_tile):
        sl = slice(t0, t0 + q_tile)
        qf = q_all[sl].astype(jnp.float32)
        if stream:
            # -- recompute this tile's forward attention internals --
            mixed = [_dot((qf * rows[g]).astype(in_dt), k_all, tb=True)
                     + bl_ref[g, 0] for g in range(H)]
            probs = []
            for g in range(H):
                mx = jnp.max(mixed[g], axis=-1, keepdims=True)
                e = jnp.exp(mixed[g] - mx)
                probs.append(e / jnp.sum(e, axis=-1, keepdims=True))
            z = []
            for g in range(H):
                s = probs[0] * ww_ref[0, g]
                for h in range(1, H):
                    s = s + probs[h] * ww_ref[h, g]
                z.append(s + bw_ref[g, 0])
            if attn_drop > 0.0:
                pltpu.prng_seed(_seed_for(seed_ref, b, t0 // q_tile))
                keeps, kp = _dropout_masks((q_tile, N), H, attn_drop)
                zd = [jnp.where(keeps[h], z[h] / kp, 0.0) for h in range(H)]
            else:
                keeps, kp, zd = None, 1.0, z
        else:
            s_t = saved[t0 // q_tile]
            probs, zd = s_t["probs"], s_t["zd"]
            keeps, kp = s_t["keeps"], s_t["kp"]
        # -- backward through this tile --
        do_t = [do[sl, h * dh:(h + 1) * dh] for h in range(H)]
        dzd = [_dot(do_t[h].astype(in_dt), v[h], tb=True) for h in range(H)]
        for h in range(H):
            dv[h] = dv[h] + _dot(zd[h].astype(in_dt),
                                 do_t[h].astype(in_dt), ta=True)
        if keeps is not None:
            dz = [jnp.where(keeps[h], dzd[h] / kp, 0.0) for h in range(H)]
        else:
            dz = dzd
        # mix2 backward: z_g = sum_h p_h ww[h,g] + bw[g]
        dp = []
        for h in range(H):
            acc = dz[0] * ww_ref[h, 0]
            for g in range(1, H):
                acc = acc + dz[g] * ww_ref[h, g]
            dp.append(acc)
        dww = dww + jnp.stack(
            [jnp.stack([jnp.sum(probs[h] * dz[g]) for g in range(H)])
             for h in range(H)])
        dbw = dbw + jnp.stack(
            [jnp.sum(dz[g]) for g in range(H)]).reshape(H, 1)
        # softmax backward
        dmix = [probs[g] * (dp[g] - jnp.sum(dp[g] * probs[g],
                                            axis=-1, keepdims=True))
                for g in range(H)]
        # folded mix1 + QK backward
        dq_t = jnp.zeros((qf.shape[0], D), jnp.float32)
        dwl_cols = []
        for g in range(H):
            dmix_c = dmix[g].astype(in_dt)
            dqt_g = _dot(dmix_c, k_all)                 # (q_tile, D) f32
            dk_all = dk_all + _dot(dmix_c, (qf * rows[g]).astype(in_dt),
                                   ta=True)             # (N, D)
            dq_t = dq_t + dqt_g * rows[g]
            qdq = qf * dqt_g                            # (q_tile, D)
            dwl_cols.append(scale * jnp.stack(
                [jnp.sum(qdq[:, h * dh:(h + 1) * dh]) for h in range(H)]))
        dwl = dwl + jnp.stack(dwl_cols, axis=1)         # (H, H) [h, g]
        dbl = dbl + jnp.stack(
            [jnp.sum(dmix[g]) for g in range(H)]).reshape(H, 1)
        dq_tiles.append(dq_t)
    dwl_ref[...] += dwl
    dbl_ref[...] += dbl
    dww_ref[...] += dww
    dbw_ref[...] += dbw

    dqkv = jnp.concatenate(
        [jnp.concatenate(dq_tiles, axis=0), dk_all,
         jnp.concatenate(dv, axis=1)], axis=1)    # (N, 3D) f32
    dwqkv_ref[...] += _dot(h1n_c, dqkv.astype(in_dt), ta=True)
    dbqkv_ref[0] += jnp.sum(dqkv, axis=0)
    dh1n = _dot(dqkv.astype(in_dt), wqkv_ref[...], tb=True)
    dx_ln, dg1, db1 = _ln_bwd(dh1n, xhat1, inv1, g1_ref[0])
    dg1_ref[0] += dg1
    db1_ref[0] += db1
    dx_ref[0] = (dx1 + dx_ln).astype(dx_ref.dtype)


def _specs(N, D, H, batch_block=True):
    def rep(shape):
        return pl.BlockSpec(shape, lambda b: tuple(0 for _ in shape),
                            memory_space=pltpu.VMEM)

    x_spec = pl.BlockSpec((1, N, D), lambda b: (b, 0, 0),
                          memory_space=pltpu.VMEM)
    param_specs = [
        rep((1, D)), rep((1, D)),              # ln1 g/b
        rep((D, 3 * D)), rep((1, 3 * D)),      # qkv
        rep((H, H)), rep((H, 1)), rep((H, H)), rep((H, 1)),  # wl/bl/ww/bw
        rep((D, D)), rep((1, D)),              # proj
        rep((1, D)),                           # gamma1
        rep((1, D)), rep((1, D)),              # ln2 g/b
        rep((D, 4 * D)), rep((1, 4 * D)),      # fc1
        rep((4 * D, D)), rep((1, D)),          # fc2
        rep((1, D)),                           # gamma2
    ]
    return x_spec, param_specs, rep


@functools.partial(jax.jit, static_argnames=("q_tile", "interpret",
                                             "attn_drop", "proj_drop",
                                             "path_drop", "save_residuals"))
def _fwd_call(x, params, seed, *, q_tile, interpret, attn_drop, proj_drop,
              path_drop, save_residuals=False):
    B, N, D = x.shape
    H = params[4].shape[0]
    x_spec, p_specs, _ = _specs(N, D, H)
    out_specs = x_spec
    out_shape = jax.ShapeDtypeStruct((B, N, D), x.dtype)
    if save_residuals:
        out_specs = (x_spec, x_spec, x_spec)
        out_shape = (out_shape,
                     jax.ShapeDtypeStruct((B, N, D), x.dtype),    # o (attn out)
                     jax.ShapeDtypeStruct((B, N, D), jnp.float32))  # md
    return pl.pallas_call(
        functools.partial(_block_fwd_kernel, H=H, q_tile=q_tile,
                          attn_drop=attn_drop, proj_drop=proj_drop,
                          path_drop=path_drop),
        grid=(B,),
        in_specs=[x_spec] + p_specs + [pl.BlockSpec(memory_space=pltpu.SMEM)],
        out_specs=out_specs,
        out_shape=out_shape,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel",),
            vmem_limit_bytes=110 * 1024 * 1024),
        interpret=pltpu.InterpretParams() if interpret else False,
    )(x, *params, seed)


@functools.partial(jax.jit, static_argnames=("q_tile", "interpret",
                                             "attn_drop", "proj_drop",
                                             "path_drop"))
def _bwd_call(x, params, seed, dy, osave=None, mdsave=None, *, q_tile,
              interpret, attn_drop, proj_drop, path_drop):
    B, N, D = x.shape
    H = params[4].shape[0]
    x_spec, p_specs, rep = _specs(N, D, H)
    grad_shapes = [jax.ShapeDtypeStruct((B, N, D), jnp.float32)] + [
        jax.ShapeDtypeStruct(p.shape, jnp.float32) for p in params]
    grad_specs = [x_spec] + [rep(p.shape) for p in params]
    # Collecting the attention internals keeps ~3 live (N, N) planes per
    # head (probs/zd f32 + dropout mask) across the MLP backward; stream
    # (recompute per tile) once that footprint would crowd the 110 MB VMEM
    # budget. At recipe shapes (N=1024, H=4 -> 48 MB post-wl-fold, which
    # dropped logits/z from the saved set) collect is ~5% faster end-to-end.
    stream = 3 * H * N * N * 4 > STREAM_BWD_BYTES
    use_saved = osave is not None
    extra_in = [osave, mdsave] if use_saved else []
    extra_specs = [x_spec, x_spec] if use_saved else []
    return pl.pallas_call(
        functools.partial(_block_bwd_kernel, H=H, q_tile=q_tile,
                          attn_drop=attn_drop, proj_drop=proj_drop,
                          path_drop=path_drop, stream=stream,
                          use_saved=use_saved),
        grid=(B,),
        in_specs=[x_spec] + p_specs + [
            pl.BlockSpec(memory_space=pltpu.SMEM), x_spec] + extra_specs,
        out_specs=tuple(grad_specs),
        out_shape=tuple(grad_shapes),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),   # param grads accumulate
            vmem_limit_bytes=110 * 1024 * 1024),
        interpret=pltpu.InterpretParams() if interpret else False,
    )(x, *params, seed, dy, *extra_in)


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3, 4, 5, 6))
def fused_layer_scale_block(x, params, q_tile, interpret, attn_drop,
                            proj_drop, path_drop):
    """x: (B, N, D); params: tuple of 19 arrays in kernel order
    (ln1_g, ln1_b, w_qkv (D,3D), b_qkv, wl (H,H), bl (H,1), ww, bw,
     w_proj (D,D), b_proj, gamma1, ln2_g, ln2_b, w1 (D,4D), b1,
     w2 (4D,D), b2, gamma2, seed (1,) f32). Last tuple entry is the seed.
    Returns the block output (B, N, D) in x.dtype."""
    *ps, seed = params
    return _fwd_call(x, tuple(ps), seed, q_tile=q_tile, interpret=interpret,
                     attn_drop=attn_drop, proj_drop=proj_drop,
                     path_drop=path_drop)


def _fused_fwd(x, params, q_tile, interpret, attn_drop, proj_drop, path_drop):
    if not _save_residuals_enabled():
        y = fused_layer_scale_block(x, params, q_tile, interpret, attn_drop,
                                    proj_drop, path_drop)
        return y, (x, params, None, None)
    *ps, seed = params
    y, osave, mdsave = _fwd_call(x, tuple(ps), seed, q_tile=q_tile,
                                 interpret=interpret, attn_drop=attn_drop,
                                 proj_drop=proj_drop, path_drop=path_drop,
                                 save_residuals=True)
    return y, (x, params, osave, mdsave)


def _save_residuals_enabled() -> bool:
    """A/B knob (default on): the differentiated forward saves the attention
    output + post-dropout MLP output so the backward skips ~13% of its
    recompute FLOPs for ~1.2 MB/sample of HBM. The plain (non-vjp) forward —
    the eval path — never pays the extra writes."""
    import os

    return os.environ.get("SPE_BLOCK_SAVE_RESIDUALS", "1") != "0"


def _fused_bwd(q_tile, interpret, attn_drop, proj_drop, path_drop, res, dy):
    x, params, osave, mdsave = res
    *ps, seed = params
    grads = _bwd_call(x, tuple(ps), seed, dy, osave, mdsave, q_tile=q_tile,
                      interpret=interpret, attn_drop=attn_drop,
                      proj_drop=proj_drop, path_drop=path_drop)
    dx = grads[0].astype(x.dtype)
    dparams = tuple(g.astype(p.dtype) for g, p in zip(grads[1:], ps))
    return dx, dparams + (jnp.zeros_like(seed),)


fused_layer_scale_block.defvjp(_fused_fwd, _fused_bwd)
