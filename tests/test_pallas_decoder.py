"""Fused whole-layer decoder kernel (ops/pallas_decoder.py) vs the flax
ConditionalDecoderLayer/ConditionalDecoder: identical param trees, forward
and full-VJP parity in interpret mode (f32) — including the set-padding
path (Q not a sublane multiple), the first-layer ca_qpos_proj variant, the
key-padding mask, and dropout smoke."""

import flax
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from spe_tpu.models.transformer import (ConditionalDecoder,
                                        ConditionalDecoderLayer,
                                        ConditionalTransformer)

B, D, H, F, S, N = 2, 16, 4, 40, 2, 24
Qp = 8  # layer-level tests use already-padded query sets


def _mk(rng, q_per_set=Qp):
    SQ = S * q_per_set
    return dict(
        tgt=jnp.asarray(rng.normal(size=(B, SQ, D)).astype(np.float32)),
        memory=jnp.asarray(rng.normal(size=(B, N, D)).astype(np.float32)),
        pos=jnp.asarray(rng.normal(size=(B, N, D)).astype(np.float32)),
        query_pos=jnp.asarray(rng.normal(size=(B, SQ, D)).astype(np.float32)),
        sine=jnp.asarray(rng.normal(size=(B, SQ, D)).astype(np.float32)),
    )


@pytest.fixture
def setup(rng, monkeypatch):
    monkeypatch.setenv("SPE_FUSED_INTERPRET", "1")
    return _mk(rng)


def _layers(is_first):
    l_std = ConditionalDecoderLayer(H, F, dropout=0.1, num_sets=S)
    l_fus = ConditionalDecoderLayer(H, F, dropout=0.1, num_sets=S,
                                    use_fused=True)
    return l_std, l_fus


_QBIAS = jnp.zeros((1, Qp), jnp.float32)  # all queries valid at Qp=Q


@pytest.mark.parametrize("is_first", [True, False])
def test_layer_parity(setup, is_first):
    a = setup
    l_std, l_fus = _layers(is_first)
    p = l_std.init(jax.random.PRNGKey(0), a["tgt"], a["memory"], a["pos"],
                   a["query_pos"], a["sine"], is_first=is_first)
    p_f = l_fus.init(jax.random.PRNGKey(0), a["tgt"], a["memory"], a["pos"],
                     a["query_pos"], a["sine"], is_first=is_first,
                     fused_qbias=_QBIAS)
    fs = flax.traverse_util.flatten_dict(p["params"], sep="/")
    ff = flax.traverse_util.flatten_dict(p_f["params"], sep="/")
    assert set(fs) == set(ff), set(fs) ^ set(ff)
    for k in fs:
        np.testing.assert_allclose(np.asarray(fs[k]), np.asarray(ff[k]),
                                   err_msg=k)

    mask = jnp.asarray(np.arange(N)[None, :] >= np.array([[N], [N - 5]]))
    ref = l_std.apply(p, a["tgt"], a["memory"], a["pos"], a["query_pos"],
                      a["sine"], is_first=is_first, key_padding_mask=mask,
                      deterministic=True)
    out = l_fus.apply(p, a["tgt"], a["memory"], a["pos"], a["query_pos"],
                      a["sine"], is_first=is_first, key_padding_mask=mask,
                      deterministic=True, fused_qbias=_QBIAS)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=3e-5, atol=3e-5)


@pytest.mark.parametrize("is_first", [
    pytest.param(True, marks=pytest.mark.slow), False])
def test_layer_vjp_parity(setup, is_first):
    a = setup
    l_std, l_fus = _layers(is_first)
    p = l_std.init(jax.random.PRNGKey(0), a["tgt"], a["memory"], a["pos"],
                   a["query_pos"], a["sine"], is_first=is_first)
    mask = jnp.asarray(np.arange(N)[None, :] >= np.array([[N], [N - 5]]))

    def loss(layer, p, tgt, mem, pos, qpos, sine, **kw):
        y = layer.apply(p, tgt, mem, pos, qpos, sine, is_first=is_first,
                        key_padding_mask=mask, deterministic=True, **kw)
        return jnp.sum(jnp.sin(y.astype(jnp.float32)))

    args = (a["tgt"], a["memory"], a["pos"], a["query_pos"], a["sine"])
    g_ref = jax.grad(lambda p, *xs: loss(l_std, p, *xs),
                     argnums=tuple(range(6)))(p, *args)
    g_fus = jax.grad(lambda p, *xs: loss(l_fus, p, *xs, fused_qbias=_QBIAS),
                     argnums=tuple(range(6)))(p, *args)

    names = ["dp", "dtgt", "dmem", "dpos", "dquery_pos", "dsine"]
    for i in range(1, 6):
        np.testing.assert_allclose(np.asarray(g_fus[i]), np.asarray(g_ref[i]),
                                   rtol=5e-4, atol=5e-4, err_msg=names[i])
    fr = flax.traverse_util.flatten_dict(g_ref[0]["params"], sep="/")
    ff = flax.traverse_util.flatten_dict(g_fus[0]["params"], sep="/")
    for k in fr:
        np.testing.assert_allclose(np.asarray(ff[k]), np.asarray(fr[k]),
                                   rtol=5e-4, atol=5e-4, err_msg=k)


def test_decoder_stack_parity_with_padding(setup, rng):
    """Full ConditionalDecoder, Q=5 per set (pads to 8): fused output must
    match the standard stack on the unpadded rows."""
    Q = 5
    a = _mk(rng, q_per_set=Q)
    dec_std = ConditionalDecoder(3, H, F, D, num_sets=S)
    dec_fus = ConditionalDecoder(3, H, F, D, num_sets=S, use_fused=True)
    p = dec_std.init(jax.random.PRNGKey(1), a["tgt"], a["memory"], a["pos"],
                     a["query_pos"])
    p_f = dec_fus.init(jax.random.PRNGKey(1), a["tgt"], a["memory"],
                       a["pos"], a["query_pos"])
    fs = flax.traverse_util.flatten_dict(p["params"], sep="/")
    ff = flax.traverse_util.flatten_dict(p_f["params"], sep="/")
    assert set(fs) == set(ff), set(fs) ^ set(ff)

    mask = jnp.asarray(np.arange(N)[None, :] >= np.array([[N], [N - 7]]))
    hs_r, ref_r = dec_std.apply(p, a["tgt"], a["memory"], a["pos"],
                                a["query_pos"], key_padding_mask=mask,
                                deterministic=True)
    hs_f, ref_f = dec_fus.apply(p, a["tgt"], a["memory"], a["pos"],
                                a["query_pos"], key_padding_mask=mask,
                                deterministic=True)
    assert hs_f.shape == hs_r.shape
    np.testing.assert_allclose(np.asarray(ref_f), np.asarray(ref_r),
                               rtol=3e-5, atol=3e-5)
    np.testing.assert_allclose(np.asarray(hs_f), np.asarray(hs_r),
                               rtol=5e-5, atol=5e-5)


@pytest.mark.slow
def test_decoder_stack_vjp_with_padding(setup, rng):
    Q = 5
    a = _mk(rng, q_per_set=Q)
    dec_std = ConditionalDecoder(2, H, F, D, num_sets=S)
    dec_fus = ConditionalDecoder(2, H, F, D, num_sets=S, use_fused=True)
    p = dec_std.init(jax.random.PRNGKey(1), a["tgt"], a["memory"], a["pos"],
                     a["query_pos"])

    def loss(dec, p, mem):
        hs, refs = dec.apply(p, a["tgt"], mem, a["pos"], a["query_pos"],
                             deterministic=True)
        return jnp.sum(jnp.sin(hs)) + jnp.sum(refs)

    gp_r, gm_r = jax.grad(lambda p, m: loss(dec_std, p, m),
                          argnums=(0, 1))(p, a["memory"])
    gp_f, gm_f = jax.grad(lambda p, m: loss(dec_fus, p, m),
                          argnums=(0, 1))(p, a["memory"])
    np.testing.assert_allclose(np.asarray(gm_f), np.asarray(gm_r),
                               rtol=5e-4, atol=5e-4, err_msg="dmem")
    fr = flax.traverse_util.flatten_dict(gp_r["params"], sep="/")
    ff = flax.traverse_util.flatten_dict(gp_f["params"], sep="/")
    for k in fr:
        np.testing.assert_allclose(np.asarray(ff[k]), np.asarray(fr[k]),
                                   rtol=5e-4, atol=5e-4, err_msg=k)


@pytest.mark.slow
def test_dropout_runs(setup):
    a = setup
    _, l_fus = _layers(True)
    p = l_fus.init(jax.random.PRNGKey(0), a["tgt"], a["memory"], a["pos"],
                   a["query_pos"], a["sine"], is_first=True,
                   fused_qbias=_QBIAS)
    det = l_fus.apply(p, a["tgt"], a["memory"], a["pos"], a["query_pos"],
                      a["sine"], is_first=True, deterministic=True,
                      fused_qbias=_QBIAS)
    drp = l_fus.apply(p, a["tgt"], a["memory"], a["pos"], a["query_pos"],
                      a["sine"], is_first=True, deterministic=False,
                      fused_qbias=_QBIAS,
                      rngs={"dropout": jax.random.PRNGKey(3)})
    assert not np.allclose(np.asarray(det), np.asarray(drp))

    g = jax.grad(lambda t: jnp.sum(l_fus.apply(
        p, t, a["memory"], a["pos"], a["query_pos"], a["sine"],
        is_first=True, deterministic=False, fused_qbias=_QBIAS,
        rngs={"dropout": jax.random.PRNGKey(3)}).astype(jnp.float32)))(
        a["tgt"])
    assert np.all(np.isfinite(np.asarray(g)))


@pytest.mark.slow
def test_vjp_save_residuals_identical(setup, monkeypatch):
    """Saved-residuals backward (forward stashes self-attn out, cross-attn
    out and FFN out; backward skips both attention forward recomputes and
    fc2) computes the same math as the full-recompute backward, to f32 ulp,
    with and without dropout, both layer variants."""
    a = setup
    mask = jnp.asarray(np.arange(N)[None, :] >= np.array([[N], [N - 5]]))

    for is_first in (True, False):
        _, l_fus = _layers(is_first)
        p = l_fus.init(jax.random.PRNGKey(0), a["tgt"], a["memory"],
                       a["pos"], a["query_pos"], a["sine"],
                       is_first=is_first, fused_qbias=_QBIAS)

        def grads(det):
            def loss(p, tgt, mem):
                y = l_fus.apply(p, tgt, mem, a["pos"], a["query_pos"],
                                a["sine"], is_first=is_first,
                                key_padding_mask=mask, deterministic=det,
                                fused_qbias=_QBIAS,
                                rngs=None if det else
                                {"dropout": jax.random.PRNGKey(3)})
                return jnp.sum(jnp.sin(y.astype(jnp.float32)))
            return jax.grad(loss, argnums=(0, 1, 2))(p, a["tgt"],
                                                     a["memory"])

        for det in (True, False):
            monkeypatch.setenv("SPE_BLOCK_SAVE_RESIDUALS", "1")
            g_saved = grads(det)
            monkeypatch.setenv("SPE_BLOCK_SAVE_RESIDUALS", "0")
            g_rec = grads(det)
            for x, y in zip(jax.tree.leaves(g_saved),
                            jax.tree.leaves(g_rec)):
                np.testing.assert_allclose(np.asarray(x), np.asarray(y),
                                           rtol=1e-4, atol=1e-6)
