"""Fused whole-layer encoder kernel (ops/pallas_encoder.py) vs the flax
TransformerEncoderLayer: identical param trees, forward and full VJP parity
in interpret mode (f32), key-padding-mask handling, dropout smoke."""

import flax
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from spe_tpu.models.transformer import TransformerEncoderLayer

B, N, D, H, F = 2, 32, 16, 4, 48


@pytest.fixture
def setup(rng, monkeypatch):
    monkeypatch.setenv("SPE_FUSED_INTERPRET", "1")
    src = jnp.asarray(rng.normal(size=(B, N, D)).astype(np.float32))
    pos = jnp.asarray(rng.normal(size=(B, N, D)).astype(np.float32))
    l_std = TransformerEncoderLayer(H, F, dropout=0.1)
    l_fused = TransformerEncoderLayer(H, F, dropout=0.1, use_fused=True)
    p_std = l_std.init(jax.random.PRNGKey(0), src, pos)
    p_fused = l_fused.init(jax.random.PRNGKey(0), src, pos)
    return src, pos, l_std, l_fused, p_std, p_fused


def test_param_trees_identical(setup):
    _, _, _, _, p_std, p_fused = setup
    fs = flax.traverse_util.flatten_dict(p_std["params"], sep="/")
    ff = flax.traverse_util.flatten_dict(p_fused["params"], sep="/")
    assert set(fs) == set(ff), set(fs) ^ set(ff)
    for k in fs:
        np.testing.assert_allclose(np.asarray(fs[k]), np.asarray(ff[k]),
                                   err_msg=k)


def test_forward_parity(setup):
    src, pos, l_std, l_fused, p_std, _ = setup
    ref = l_std.apply(p_std, src, pos, deterministic=True)
    out = l_fused.apply(p_std, src, pos, deterministic=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-5, atol=2e-5)


def test_forward_parity_masked(setup):
    src, pos, l_std, l_fused, p_std, _ = setup
    mask = np.zeros((B, N), bool)
    mask[:, N - 7:] = True
    mask = jnp.asarray(mask)
    ref = l_std.apply(p_std, src, pos, key_padding_mask=mask,
                      deterministic=True)
    out = l_fused.apply(p_std, src, pos, key_padding_mask=mask,
                        deterministic=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-5, atol=2e-5)


def test_vjp_parity(setup):
    src, pos, l_std, l_fused, p_std, _ = setup
    mask = jnp.asarray(
        np.arange(N)[None, :] >= np.array([[N], [N - 5]]))  # (B, N)

    def loss(layer, p, s, q):
        y = layer.apply(p, s, q, key_padding_mask=mask, deterministic=True)
        return jnp.sum(jnp.sin(y.astype(jnp.float32)))

    g_ref = jax.grad(lambda p, s, q: loss(l_std, p, s, q),
                     argnums=(0, 1, 2))(p_std, src, pos)
    g_fus = jax.grad(lambda p, s, q: loss(l_fused, p, s, q),
                     argnums=(0, 1, 2))(p_std, src, pos)

    np.testing.assert_allclose(np.asarray(g_fus[1]), np.asarray(g_ref[1]),
                               rtol=3e-4, atol=3e-4, err_msg="dsrc")
    np.testing.assert_allclose(np.asarray(g_fus[2]), np.asarray(g_ref[2]),
                               rtol=3e-4, atol=3e-4, err_msg="dpos")
    fr = flax.traverse_util.flatten_dict(g_ref[0]["params"], sep="/")
    ff = flax.traverse_util.flatten_dict(g_fus[0]["params"], sep="/")
    for k in fr:
        np.testing.assert_allclose(np.asarray(ff[k]), np.asarray(fr[k]),
                                   rtol=3e-4, atol=3e-4, err_msg=k)


def test_dropout_runs_and_masks(setup):
    src, pos, _, l_fused, p_std, _ = setup
    det = l_fused.apply(p_std, src, pos, deterministic=True)
    drp = l_fused.apply(p_std, src, pos, deterministic=False,
                        rngs={"dropout": jax.random.PRNGKey(7)})
    assert not np.allclose(np.asarray(det), np.asarray(drp))

    g = jax.grad(lambda s: jnp.sum(l_fused.apply(
        p_std, s, pos, deterministic=False,
        rngs={"dropout": jax.random.PRNGKey(7)}).astype(jnp.float32)))(src)
    assert np.all(np.isfinite(np.asarray(g)))


def test_pre_norm_falls_back(setup, rng):
    """normalize_before must take the standard path (fused kernel is
    post-norm only) and still work."""
    src, pos, _, _, _, _ = setup
    layer = TransformerEncoderLayer(H, F, dropout=0.0, normalize_before=True,
                                    use_fused=True)
    p = layer.init(jax.random.PRNGKey(0), src, pos)
    ref = TransformerEncoderLayer(H, F, dropout=0.0, normalize_before=True)
    out = layer.apply(p, src, pos, deterministic=True)
    want = ref.apply(p, src, pos, deterministic=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(want))


def test_vjp_save_residuals_identical(setup, monkeypatch):
    """Saved-residuals backward (forward stashes attn out + FFN out;
    backward skips the attention forward recompute and fc2) computes the
    same math as the full-recompute backward, to f32 ulp, with and
    without dropout."""
    src, pos, _, l_fused, p_std, _ = setup
    mask = jnp.asarray(
        np.arange(N)[None, :] >= np.array([[N], [N - 5]]))

    def grads(det):
        def loss(p, s, q):
            y = l_fused.apply(p, s, q, key_padding_mask=mask,
                              deterministic=det,
                              rngs=None if det else
                              {"dropout": jax.random.PRNGKey(3)})
            return jnp.sum(jnp.sin(y.astype(jnp.float32)))
        return jax.grad(loss, argnums=(0, 1, 2))(p_std, src, pos)

    for det in (True, False):
        monkeypatch.setenv("SPE_BLOCK_SAVE_RESIDUALS", "1")
        g_saved = grads(det)
        monkeypatch.setenv("SPE_BLOCK_SAVE_RESIDUALS", "0")
        g_rec = grads(det)
        for a, b in zip(jax.tree.leaves(g_saved), jax.tree.leaves(g_rec)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=1e-4, atol=1e-6)
