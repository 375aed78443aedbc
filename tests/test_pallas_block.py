"""Fused whole-block kernel (ops/pallas_block.py) vs the flax
LayerScaleBlock: forward and full VJP parity in interpret mode (f32), plus
dropout-mode sanity (unbiasedness + fwd/bwd mask identity via grad check).
"""

import flax
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from spe_tpu.models.cait import LayerScaleBlock
from spe_tpu.ops.pallas_block import fused_layer_scale_block

B, N, D, H = 2, 32, 16, 4


def _params_tuple(pdict, seed=0.0):
    """flax LayerScaleBlock params -> the kernel's 19-tuple + seed."""
    p = flax.traverse_util.flatten_dict(pdict["params"], sep="/")
    t = (
        p["norm1/scale"].reshape(1, D).astype(jnp.float32),
        p["norm1/bias"].reshape(1, D).astype(jnp.float32),
        p["attn/qkv/kernel"],
        p["attn/qkv/bias"].reshape(1, 3 * D),
        p["attn/proj_l"].astype(jnp.float32),
        p["attn/proj_l_bias"].reshape(H, 1).astype(jnp.float32),
        p["attn/proj_w"].astype(jnp.float32),
        p["attn/proj_w_bias"].reshape(H, 1).astype(jnp.float32),
        p["attn/proj/kernel"],
        p["attn/proj/bias"].reshape(1, D),
        p["gamma_1"].reshape(1, D).astype(jnp.float32),
        p["norm2/scale"].reshape(1, D).astype(jnp.float32),
        p["norm2/bias"].reshape(1, D).astype(jnp.float32),
        p["mlp/fc1/kernel"],
        p["mlp/fc1/bias"].reshape(1, 4 * D),
        p["mlp/fc2/kernel"],
        p["mlp/fc2/bias"].reshape(1, D),
        p["gamma_2"].reshape(1, D).astype(jnp.float32),
        jnp.asarray([seed], jnp.float32),
    )
    return tuple(jnp.asarray(a) for a in t)


@pytest.fixture
def setup(rng):
    x = jnp.asarray(rng.normal(size=(B, N, D)).astype(np.float32))
    blk = LayerScaleBlock(num_heads=H, init_scale=0.5)
    pdict = blk.init(jax.random.PRNGKey(0), x)
    return x, blk, pdict


def test_forward_parity(setup):
    x, blk, pdict = setup
    ref = blk.apply(pdict, x, True)
    params = _params_tuple(pdict)
    out = fused_layer_scale_block(x, params, 16, True, 0.0, 0.0, 0.0)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-5, atol=2e-5)


def test_vjp_parity(setup):
    x, blk, pdict = setup
    params = _params_tuple(pdict)

    def loss_ref(pdict, x):
        y = blk.apply(pdict, x, True)
        return jnp.sum(jnp.sin(y.astype(jnp.float32)))

    def loss_fused(params, x):
        y = fused_layer_scale_block(x, params, 16, True, 0.0, 0.0, 0.0)
        return jnp.sum(jnp.sin(y.astype(jnp.float32)))

    gref_p, gref_x = jax.grad(loss_ref, argnums=(0, 1))(pdict, x)
    gfp, gfx = jax.grad(loss_fused, argnums=(0, 1))(params, x)

    np.testing.assert_allclose(np.asarray(gfx), np.asarray(gref_x),
                               rtol=2e-4, atol=2e-4, err_msg="dx")

    fref = flax.traverse_util.flatten_dict(gref_p["params"], sep="/")
    names = ["norm1/scale", "norm1/bias", "attn/qkv/kernel", "attn/qkv/bias",
             "attn/proj_l", "attn/proj_l_bias", "attn/proj_w",
             "attn/proj_w_bias", "attn/proj/kernel", "attn/proj/bias",
             "gamma_1", "norm2/scale", "norm2/bias", "mlp/fc1/kernel",
             "mlp/fc1/bias", "mlp/fc2/kernel", "mlp/fc2/bias", "gamma_2"]
    for got, name in zip(gfp[:-1], names):
        want = np.asarray(fref[name]).reshape(np.asarray(got).shape)
        np.testing.assert_allclose(np.asarray(got), want, rtol=3e-4,
                                   atol=3e-4, err_msg=name)


@pytest.mark.slow
def test_vjp_parity_streamed(setup, monkeypatch):
    """Force the streamed backward (per-tile recompute instead of the
    collect-everything path) and require identical gradients — the two
    modes must be numerically interchangeable, incl. dropout mask order."""
    import spe_tpu.ops.pallas_block as pb
    monkeypatch.setattr(pb, "STREAM_BWD_BYTES", 0)
    pb._bwd_call.clear_cache()
    x, blk, pdict = setup
    params = _params_tuple(pdict, seed=5.0)

    def loss(params, x, d):
        y = fused_layer_scale_block(x, params, 16, True, d, d, 0.0)
        return jnp.sum(jnp.sin(y.astype(jnp.float32)))

    try:
        for drop in (0.0, 0.15):
            g_stream = jax.grad(loss, argnums=(0, 1))(params, x, drop)
            pb.STREAM_BWD_BYTES = 1 << 40
            pb._bwd_call.clear_cache()
            g_collect = jax.grad(loss, argnums=(0, 1))(params, x, drop)
            pb.STREAM_BWD_BYTES = 0
            pb._bwd_call.clear_cache()
            for a, b in zip(jax.tree.leaves(g_stream),
                            jax.tree.leaves(g_collect)):
                np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                           rtol=1e-6, atol=1e-6)
    finally:
        pb._bwd_call.clear_cache()


@pytest.mark.slow
def test_vjp_save_residuals_identical(setup, monkeypatch):
    """The save-residuals backward (forward stashes the attention output +
    post-dropout MLP output; backward skips their recompute) computes the
    same real-number math as the full-recompute backward — gradients must
    agree to f32 ulp level (the two compiled programs may reassociate
    elementwise chains differently), in both stream and collect modes,
    with and without dropout."""
    import spe_tpu.ops.pallas_block as pb

    x, blk, pdict = setup
    params = _params_tuple(pdict, seed=9.0)

    def grads(d):
        def loss(params, x):
            y = fused_layer_scale_block(x, params, 16, True, d, d, 0.1)
            return jnp.sum(jnp.sin(y.astype(jnp.float32)))
        return jax.grad(loss, argnums=(0, 1))(params, x)

    for stream_bytes in (0, 1 << 40):
        monkeypatch.setattr(pb, "STREAM_BWD_BYTES", stream_bytes)
        pb._bwd_call.clear_cache()
        try:
            for drop in (0.0, 0.15):
                monkeypatch.setenv("SPE_BLOCK_SAVE_RESIDUALS", "1")
                g_saved = grads(drop)
                monkeypatch.setenv("SPE_BLOCK_SAVE_RESIDUALS", "0")
                g_recompute = grads(drop)
                for a, b in zip(jax.tree.leaves(g_saved),
                                jax.tree.leaves(g_recompute)):
                    np.testing.assert_allclose(np.asarray(a),
                                               np.asarray(b),
                                               rtol=1e-4, atol=1e-6)
        finally:
            pb._bwd_call.clear_cache()


def test_dropout_modes_run_and_are_masked(setup):
    """Dropout path: output differs from deterministic, zeros appear where
    expected, and the VJP runs (mask identity fwd/bwd is implied by the
    custom-VJP recompute using the same seeds)."""
    x, blk, pdict = setup
    params = _params_tuple(pdict, seed=123.0)
    det = fused_layer_scale_block(x, params, 16, True, 0.0, 0.0, 0.0)
    drp = fused_layer_scale_block(x, params, 16, True, 0.2, 0.1, 0.0)
    assert not np.allclose(np.asarray(det), np.asarray(drp))

    # gradient flows through the dropout path without error
    g = jax.grad(lambda x: jnp.sum(
        fused_layer_scale_block(x, params, 16, True, 0.2, 0.1, 0.0)
        .astype(jnp.float32)))(x)
    assert np.all(np.isfinite(np.asarray(g)))

    # drop-path semantics: each sample's output must equal one of the four
    # exact outcomes {branch kept (x2 inverted scale) / dropped} x 2 —
    # candidates are the fused kernel itself with gammas scaled by 0 or 2
    # (drop-path only scales the added branch; rate 0.5 -> factor 2.0
    # exactly under the kernel's 1/256-quantized keep prob)
    drp = np.asarray(fused_layer_scale_block(
        x, _params_tuple(pdict, seed=77.0), 16, True, 0.0, 0.0, 0.5))
    cands = []
    for c1 in (0.0, 2.0):
        for c2 in (0.0, 2.0):
            ps = list(_params_tuple(pdict))
            ps[10] = ps[10] * c1   # gamma1
            ps[17] = ps[17] * c2   # gamma2
            cands.append(np.asarray(fused_layer_scale_block(
                x, tuple(ps), 16, True, 0.0, 0.0, 0.0)))
    for b in range(B):
        dists = [np.abs(c[b] - drp[b]).max() for c in cands]
        assert min(dists) < 1e-4, (b, dists)


def test_dropout_unbiased(setup):
    """Inverted dropout keeps E[out] ~= deterministic out (within MC error),
    averaged over seeds."""
    x, blk, pdict = setup
    det = np.asarray(fused_layer_scale_block(
        x, _params_tuple(pdict), 16, True, 0.0, 0.0, 0.0), np.float64)
    acc = np.zeros_like(det)
    S = 24
    for s in range(S):
        acc += np.asarray(fused_layer_scale_block(
            x, _params_tuple(pdict, seed=1000.0 + s), 16, True,
            0.3, 0.0, 0.0), np.float64)
    mean = acc / S
    err = np.abs(mean - det).mean() / (np.abs(det).mean() + 1e-9)
    assert err < 0.08, err


@pytest.mark.slow
def test_backbone_fused_matches_standard(rng, monkeypatch):
    """CaiTTwoBranch with use_fused_block must match the standard path
    (f32, deterministic), outputs AND gradients — param trees identical."""
    from spe_tpu.models.cait import CaiTConfig, CaiTTwoBranch

    # on CPU the fused path falls back unless interpret is forced
    monkeypatch.setenv("SPE_FUSED_INTERPRET", "1")

    imgs = jnp.asarray(rng.normal(size=(1, 32, 32, 3)).astype(np.float32))
    kw = dict(img_size=32, patch_size=8, embed_dim=16, depth=3, num_heads=4,
              num_classes=3, layer_to_det=2, depth_token_only=1,
              init_scale=0.5)
    m_std = CaiTTwoBranch(CaiTConfig(**kw))
    m_fused = CaiTTwoBranch(CaiTConfig(use_fused_block=True, **kw))

    p_std = m_std.init(jax.random.PRNGKey(0), imgs)
    p_fused = m_fused.init(jax.random.PRNGKey(0), imgs)
    # identical param trees (paths AND values: same per-path init streams)
    fs = flax.traverse_util.flatten_dict(p_std["params"], sep="/")
    ff = flax.traverse_util.flatten_dict(p_fused["params"], sep="/")
    assert set(fs) == set(ff), set(fs) ^ set(ff)
    for k in fs:
        np.testing.assert_allclose(np.asarray(fs[k]), np.asarray(ff[k]),
                                   err_msg=k)

    out_s = m_std.apply(p_std, imgs, deterministic=True)
    out_f = m_fused.apply(p_std, imgs, deterministic=True)
    for k in ("x_logits", "x_cls_logits", "cams_cls", "x_patch"):
        np.testing.assert_allclose(np.asarray(out_f[k]), np.asarray(out_s[k]),
                                   rtol=2e-4, atol=2e-4, err_msg=k)

    def loss(m, p):
        o = m.apply(p, imgs, deterministic=True)
        return (jnp.sum(jnp.sin(o["x_patch"])) +
                jnp.sum(jnp.sin(o["x_logits"])))

    g_s = jax.grad(lambda p: loss(m_std, p))(p_std)
    g_f = jax.grad(lambda p: loss(m_fused, p))(p_std)
    gs = flax.traverse_util.flatten_dict(g_s["params"], sep="/")
    gf = flax.traverse_util.flatten_dict(g_f["params"], sep="/")
    for k in gs:
        np.testing.assert_allclose(np.asarray(gf[k]), np.asarray(gs[k]),
                                   rtol=3e-3, atol=3e-4, err_msg=k)
