"""Generic fused MHA kernel (ops/pallas_mha.py) vs the einsum reference:
forward, grads, padding mask, unequal q/k vs v head dims (conditional
cross-attention), attention-map output (class-attention/CAM), dropout
statistics. Runs in interpret mode on CPU."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from spe_tpu.ops.pallas_mha import fused_mha


def einsum_mha(q, k, v, mask=None):
    dqh = q.shape[-1]
    qf = q.astype(jnp.float32) / jnp.sqrt(jnp.float32(dqh))
    logits = jnp.einsum("bhqd,bhkd->bhqk", qf, k.astype(jnp.float32))
    if mask is not None:
        logits = jnp.where(mask[:, None, None, :], -1e9, logits)
    attn = jax.nn.softmax(logits, axis=-1)
    return jnp.einsum("bhqk,bhkd->bhqd", attn, v.astype(jnp.float32)), attn


def _mk(rng, B=2, H=2, Nq=10, Nk=20, dqh=16, dvh=16):
    q = jnp.asarray(rng.normal(size=(B, H, Nq, dqh)).astype(np.float32))
    k = jnp.asarray(rng.normal(size=(B, H, Nk, dqh)).astype(np.float32))
    v = jnp.asarray(rng.normal(size=(B, H, Nk, dvh)).astype(np.float32))
    return q, k, v


def test_fwd_matches_einsum(rng):
    q, k, v = _mk(rng)
    got = fused_mha(q, k, v, interpret=True)
    want, _ = einsum_mha(q, k, v)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-5)


def test_fwd_with_padding_mask(rng):
    q, k, v = _mk(rng)
    mask = jnp.asarray(rng.random((2, 20)) < 0.3)
    got = fused_mha(q, k, v, key_padding_mask=mask, interpret=True)
    want, _ = einsum_mha(q, k, v, mask)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-5)


def test_cross_attention_dims(rng):
    """q/k at 2*dh, v at dh — the conditional cross-attention shape
    (reference transformer.py:386-419), odd Nq=300-like and Nk=1045-like."""
    q, k, v = _mk(rng, Nq=27, Nk=133, dqh=32, dvh=16)
    got = fused_mha(q, k, v, interpret=True)
    want, _ = einsum_mha(q, k, v)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-5)


def test_return_attn_matches(rng):
    q, k, v = _mk(rng, Nq=21, Nk=85)
    got, attn = fused_mha(q, k, v, return_attn=True, interpret=True)
    want, attn_want = einsum_mha(q, k, v)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-5)
    np.testing.assert_allclose(np.asarray(attn), np.asarray(attn_want), atol=1e-6)
    # rows sum to 1 over real (unpadded) keys
    np.testing.assert_allclose(np.asarray(attn).sum(-1), 1.0, atol=1e-5)


def test_grads_match_einsum(rng):
    q, k, v = _mk(rng, Nq=16, Nk=24)
    mask = jnp.asarray(rng.random((2, 24)) < 0.25)

    def loss_fused(q, k, v):
        return (fused_mha(q, k, v, key_padding_mask=mask, interpret=True,
                          q_tile=8) ** 2).sum()

    def loss_ref(q, k, v):
        out, _ = einsum_mha(q, k, v, mask)
        return (out ** 2).sum()

    g1 = jax.grad(loss_fused, argnums=(0, 1, 2))(q, k, v)
    g2 = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
    for a, b in zip(g1, g2):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=2e-4)


def test_grads_with_attn_output(rng):
    """return_attn path: out grads flow, attn cotangent is dropped (CAM is
    read under stop_gradient in the train step)."""
    q, k, v = _mk(rng, Nq=8, Nk=16)

    def loss(q, k, v):
        out, attn = fused_mha(q, k, v, return_attn=True, interpret=True)
        return (out ** 2).sum() + jax.lax.stop_gradient(attn).sum() * 0.0

    def loss_ref(q, k, v):
        out, _ = einsum_mha(q, k, v)
        return (out ** 2).sum()

    g1 = jax.grad(loss, argnums=(0, 1, 2))(q, k, v)
    g2 = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
    for a, b in zip(g1, g2):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=2e-4)


def test_dropout_statistics_and_determinism(rng):
    """Same seed reproduces; dropout actually drops. (Seed-SENSITIVITY only
    holds on real TPU hardware — the CPU interpreter's PRNG ignores the
    seed value, same caveat as tests/test_pallas_bwd.py.)"""
    q, k, v = _mk(rng, B=1, H=4, Nq=32, Nk=64)
    seed = jnp.asarray([1234.0])
    y1 = fused_mha(q, k, v, seed=seed, dropout_rate=0.5, interpret=True)
    y2 = fused_mha(q, k, v, seed=seed, dropout_rate=0.5, interpret=True)
    np.testing.assert_array_equal(np.asarray(y1), np.asarray(y2))  # same seed
    base = np.asarray(fused_mha(q, k, v, interpret=True))
    assert not np.allclose(np.asarray(y1), base)  # dropout changed the output


def test_dropout_grads_consistent(rng):
    """Backward regenerates the forward's exact dropout mask: finite-diff
    the fused loss along a direction and compare with the analytic grad."""
    q, k, v = _mk(rng, B=1, H=2, Nq=8, Nk=16)
    seed = jnp.asarray([7.0])

    def loss(q):
        return (fused_mha(q, k, v, seed=seed, dropout_rate=0.3,
                          interpret=True, q_tile=8) ** 2).sum()

    g = jax.grad(loss)(q)
    d = jnp.asarray(rng.normal(size=q.shape).astype(np.float32))
    eps = 1e-3
    fd = (loss(q + eps * d) - loss(q - eps * d)) / (2 * eps)
    an = (g * d).sum()
    np.testing.assert_allclose(float(fd), float(an), rtol=2e-2)


def test_fused_mha_bf16_inputs(rng):
    """bf16 operands hit the MXU natively (f32 accumulation); results must
    track the f32 einsum reference within bf16 rounding."""
    import jax

    mk = lambda *s: jnp.array(rng.normal(size=s).astype(np.float32))
    q, k, v = mk(2, 2, 32, 16), mk(2, 2, 48, 16), mk(2, 2, 48, 16)
    want = np.asarray(einsum_mha(q, k, v)[0])
    got = fused_mha(q.astype(jnp.bfloat16), k.astype(jnp.bfloat16),
                    v.astype(jnp.bfloat16), interpret=True)
    assert got.dtype == jnp.bfloat16
    np.testing.assert_allclose(np.asarray(got, np.float32), want,
                               rtol=0.05, atol=0.05)

    def loss(q, k, v):
        return jnp.sum(fused_mha(q, k, v, interpret=True).astype(jnp.float32) ** 2)

    g = jax.grad(loss, argnums=(0, 1, 2))(
        q.astype(jnp.bfloat16), k.astype(jnp.bfloat16), v.astype(jnp.bfloat16))
    gr = jax.grad(lambda a, b, c: jnp.sum(einsum_mha(a, b, c)[0] ** 2),
                  argnums=(0, 1, 2))(q, k, v)
    for name, a, b in zip("qkv", g, gr):
        scale = np.abs(np.asarray(b)).max() + 1e-6
        err = np.abs(np.asarray(a, np.float32) - np.asarray(b)).max() / scale
        assert err < 0.1, (name, err)
