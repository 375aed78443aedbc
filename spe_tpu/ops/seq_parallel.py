"""Sequence-parallel (sharded-KV) attention.

The reference never shards the sequence (1,045 tokens at the published
recipe — SURVEY §5.7), but its larger backbone configs (cait_M48 at 448²,
reference models/cait.py:1929) and bigger input sizes push the patch grid
past what one chip comfortably holds. This module is the scaling hook the
kernel API reserves for that case: attention where K/V (and optionally the
padding mask) live sharded along the sequence axis of a named mesh axis,
queries replicated, with the softmax normalizer merged across shards via
XLA collectives over ICI.

Math (flash/ring-style two-pass merge, exact — no approximation):
  per shard s:  L_s = scale * Q K_s^T + bias_s
                m_s = rowmax(L_s);  e_s = exp(L_s - m_s)
                l_s = rowsum(e_s);  o_s = e_s @ V_s
  global:       m = max_s m_s                      (pmax over the axis)
                l = sum_s l_s * exp(m_s - m)       (psum)
                o = sum_s o_s * exp(m_s - m)       (psum)
                out = o / l

Everything is expressed in differentiable jnp ops, so jax.grad through
shard_map gives the exact backward with the same collectives reversed
(psum <-> identity transposes handled by shard_map). Per-shard logits are
(Nq, Nk/num_shards) — the full (Nq, Nk) matrix never exists on any chip,
which is the point of the hook.

Use under shard_map, e.g.:

    mesh = Mesh(devices, ("seq",))
    out = shard_map(
        lambda q, k, v: kv_sharded_attention(q, k, v, axis_name="seq"),
        mesh=mesh,
        in_specs=(P(), P(None, None, "seq", None), P(None, None, "seq", None)),
        out_specs=P())(q, k, v)
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

_NEG = -1e9


def kv_sharded_attention(q: jnp.ndarray, k_local: jnp.ndarray,
                         v_local: jnp.ndarray, *, axis_name: str,
                         key_padding_mask_local: Optional[jnp.ndarray] = None,
                         already_scaled: bool = False) -> jnp.ndarray:
    """Exact attention with K/V sharded over `axis_name`.

    q: (B, H, Nq, Dh) replicated across the axis;
    k_local/v_local: (B, H, Nk_local, Dh) — this shard's keys/values;
    key_padding_mask_local: (B, Nk_local) bool, True = padded key.
    Returns (B, H, Nq, Dv), replicated (identical on every shard).
    """
    dtype = q.dtype
    qf = q.astype(jnp.float32)
    if not already_scaled:
        qf = qf * (q.shape[-1] ** -0.5)
    logits = jnp.einsum("bhqd,bhkd->bhqk", qf, k_local.astype(jnp.float32))
    if key_padding_mask_local is not None:
        logits = jnp.where(key_padding_mask_local[:, None, None, :], _NEG,
                           logits)
    m_local = jnp.max(logits, axis=-1, keepdims=True)          # (B,H,Nq,1)
    # the global max is only a numerical stabilizer: its softmax gradient
    # cancels exactly, and pmax has no VJP rule anyway
    m = jax.lax.pmax(jax.lax.stop_gradient(m_local), axis_name)
    e = jnp.exp(logits - m)
    l_local = jnp.sum(e, axis=-1, keepdims=True)
    o_local = jnp.einsum("bhqk,bhkd->bhqd", e, v_local.astype(jnp.float32))
    l = jax.lax.psum(l_local, axis_name)
    o = jax.lax.psum(o_local, axis_name)
    return (o / jnp.maximum(l, 1e-30)).astype(dtype)


def ring_kv_attention(q: jnp.ndarray, k_local: jnp.ndarray,
                      v_local: jnp.ndarray, *, axis_name: str,
                      key_padding_mask_local: Optional[jnp.ndarray] = None
                      ) -> jnp.ndarray:
    """Ring variant: identical math, but K/V shards rotate around the axis
    with ppermute so each step overlaps compute with neighbor transfers
    (ICI-friendly at large Nk where the one-shot psum of o would spike
    memory). Online (m, l, o) rescaling like flash attention.
    """
    n = jax.lax.axis_size(axis_name)
    dtype = q.dtype
    qf = q.astype(jnp.float32) * (q.shape[-1] ** -0.5)
    B, H, Nq, _ = q.shape

    perm = [(i, (i + 1) % n) for i in range(n)]

    def block(k_blk, v_blk, mask_blk):
        logits = jnp.einsum("bhqd,bhkd->bhqk", qf, k_blk.astype(jnp.float32))
        if mask_blk is not None:
            logits = jnp.where(mask_blk[:, None, None, :], _NEG, logits)
        m_b = jnp.max(logits, axis=-1, keepdims=True)
        e = jnp.exp(logits - m_b)
        return m_b, jnp.sum(e, axis=-1, keepdims=True), \
            jnp.einsum("bhqk,bhkd->bhqd", e, v_blk.astype(jnp.float32))

    def body(carry):
        m, l, o, k_cur, v_cur, mask_cur = carry
        m_b, l_b, o_b = block(k_cur, v_cur, mask_cur)
        m_new = jnp.maximum(m, m_b)
        a = jnp.exp(m - m_new)
        b = jnp.exp(m_b - m_new)
        l = l * a + l_b * b
        o = o * a + o_b * b
        k_cur = jax.lax.ppermute(k_cur, axis_name, perm)
        v_cur = jax.lax.ppermute(v_cur, axis_name, perm)
        if mask_cur is not None:
            mask_cur = jax.lax.ppermute(mask_cur, axis_name, perm)
        return m_new, l, o, k_cur, v_cur, mask_cur

    m0 = jnp.full((B, H, Nq, 1), -jnp.inf, jnp.float32)
    l0 = jnp.zeros((B, H, Nq, 1), jnp.float32)
    o0 = jnp.zeros((B, H, Nq, v_local.shape[-1]), jnp.float32)
    carry = (m0, l0, o0, k_local, v_local, key_padding_mask_local)
    # python loop (n is static = mesh axis size): each step's ppermute
    # overlaps the next block's compute under XLA latency hiding; the
    # (m, l, o) merge is commutative so rotation order doesn't matter
    for _ in range(n):
        carry = body(carry)
    m, l, o = carry[:3]
    return (o / jnp.maximum(l, 1e-30)).astype(dtype)
