"""Fused class-attention token block (ops/pallas_ca_block.py) vs the flax
LayerScaleBlockClassAttn: identical param trees, forward parity (both the
new class tokens AND the attention map — the CAM source), and full VJP
parity including a cotangent flowing through the attention-map output."""

import flax
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from spe_tpu.models.cait import LayerScaleBlockClassAttn

B, T, P, D, H = 2, 5, 32, 16, 4


@pytest.fixture
def setup(rng, monkeypatch):
    monkeypatch.setenv("SPE_FUSED_INTERPRET", "1")
    x = jnp.asarray(rng.normal(size=(B, P, D)).astype(np.float32))
    cls = jnp.asarray(rng.normal(size=(B, T, D)).astype(np.float32))
    blk = LayerScaleBlockClassAttn(num_heads=H, num_tokens=T, init_scale=0.5)
    blk_f = LayerScaleBlockClassAttn(num_heads=H, num_tokens=T,
                                     init_scale=0.5, use_fused=True)
    p = blk.init(jax.random.PRNGKey(0), x, cls)
    p_f = blk_f.init(jax.random.PRNGKey(0), x, cls)
    return x, cls, blk, blk_f, p, p_f


def test_param_trees_identical(setup):
    _, _, _, _, p, p_f = setup
    fs = flax.traverse_util.flatten_dict(p["params"], sep="/")
    ff = flax.traverse_util.flatten_dict(p_f["params"], sep="/")
    assert set(fs) == set(ff), set(fs) ^ set(ff)
    for k in fs:
        np.testing.assert_allclose(np.asarray(fs[k]), np.asarray(ff[k]),
                                   err_msg=k)


def test_forward_parity(setup):
    x, cls, blk, blk_f, p, _ = setup
    ref_cls, ref_attn = blk.apply(p, x, cls, deterministic=True)
    out_cls, out_attn = blk_f.apply(p, x, cls, deterministic=True)
    np.testing.assert_allclose(np.asarray(out_cls), np.asarray(ref_cls),
                               rtol=2e-5, atol=2e-5, err_msg="cls")
    np.testing.assert_allclose(np.asarray(out_attn), np.asarray(ref_attn),
                               rtol=2e-5, atol=2e-5, err_msg="attn")


def test_vjp_parity(setup):
    """Gradients wrt params, patches and class tokens — with the loss
    reading BOTH outputs, so the attention-map cotangent (dattn) path is
    exercised (the recipe stop-gradients the CAM, but the kernel must stay
    correct for uses that don't)."""
    x, cls, blk, blk_f, p, _ = setup

    def loss(layer, p, x, cls):
        out, attn = layer.apply(p, x, cls, deterministic=True)
        return (jnp.sum(jnp.sin(out.astype(jnp.float32)))
                + 0.1 * jnp.sum(jnp.sin(attn.astype(jnp.float32) * 3.0)))

    g_ref = jax.grad(lambda p, x, c: loss(blk, p, x, c),
                     argnums=(0, 1, 2))(p, x, cls)
    g_fus = jax.grad(lambda p, x, c: loss(blk_f, p, x, c),
                     argnums=(0, 1, 2))(p, x, cls)

    np.testing.assert_allclose(np.asarray(g_fus[1]), np.asarray(g_ref[1]),
                               rtol=3e-4, atol=3e-4, err_msg="dx")
    np.testing.assert_allclose(np.asarray(g_fus[2]), np.asarray(g_ref[2]),
                               rtol=3e-4, atol=3e-4, err_msg="dcls")
    fr = flax.traverse_util.flatten_dict(g_ref[0]["params"], sep="/")
    ff = flax.traverse_util.flatten_dict(g_fus[0]["params"], sep="/")
    assert set(fr) == set(ff)
    for k in fr:
        np.testing.assert_allclose(np.asarray(ff[k]), np.asarray(fr[k]),
                                   rtol=3e-4, atol=3e-4, err_msg=k)


def test_stop_gradient_cam_path(setup):
    """The recipe's actual usage: CAM consumed under stop_gradient — the
    fused block must produce the same cls-token gradients as unfused."""
    x, cls, blk, blk_f, p, _ = setup

    def loss(layer, p, x, cls):
        out, attn = layer.apply(p, x, cls, deterministic=True)
        cam = jax.lax.stop_gradient(attn)
        return jnp.sum(out.astype(jnp.float32) ** 2) + 0.0 * jnp.sum(cam)

    g_ref = jax.grad(lambda x: loss(blk, p, x, cls))(x)
    g_fus = jax.grad(lambda x: loss(blk_f, p, x, cls))(x)
    np.testing.assert_allclose(np.asarray(g_fus), np.asarray(g_ref),
                               rtol=3e-4, atol=3e-4)


def test_qkv_bias_false_falls_back_to_flax(rng, monkeypatch):
    """use_fused with qkv_bias=False must NOT enter the fused path: the
    kernel's param shell always declares q/k/v biases and adds them, so
    routing through it would silently diverge in both param tree and math
    (ADVICE r4). The block falls back to the flax path instead."""
    monkeypatch.setenv("SPE_FUSED_INTERPRET", "1")
    x = jnp.asarray(rng.normal(size=(B, P, D)).astype(np.float32))
    cls = jnp.asarray(rng.normal(size=(B, T, D)).astype(np.float32))
    blk = LayerScaleBlockClassAttn(num_heads=H, num_tokens=T, init_scale=0.5,
                                   qkv_bias=False)
    blk_f = LayerScaleBlockClassAttn(num_heads=H, num_tokens=T, init_scale=0.5,
                                     qkv_bias=False, use_fused=True)
    p = blk.init(jax.random.PRNGKey(0), x, cls)
    p_f = blk_f.init(jax.random.PRNGKey(0), x, cls)
    fs = flax.traverse_util.flatten_dict(p["params"], sep="/")
    ff = flax.traverse_util.flatten_dict(p_f["params"], sep="/")
    assert set(fs) == set(ff), set(fs) ^ set(ff)
    assert not any(k.endswith(("q/bias", "k/bias", "v/bias")) for k in fs)
    ref_cls, ref_attn = blk.apply(p, x, cls, deterministic=True)
    out_cls, out_attn = blk_f.apply(p, x, cls, deterministic=True)
    np.testing.assert_allclose(np.asarray(out_cls), np.asarray(ref_cls))
    np.testing.assert_allclose(np.asarray(out_attn), np.asarray(ref_attn))
