import jax
import jax.numpy as jnp
import numpy as np
import pytest

from spe_tpu.ops.pallas_attention import (talking_heads_attention,
                                          talking_heads_reference)


def _inputs(rng, B=2, H=4, N=64, dh=16):
    mk = lambda *s: jnp.array(rng.normal(size=s).astype(np.float32))
    return (mk(B, H, N, dh), mk(B, H, N, dh), mk(B, H, N, dh),
            mk(H, H), mk(H), mk(H, H), mk(H))


def test_pallas_matches_einsum_interpret(rng):
    args = _inputs(rng)
    ref = talking_heads_reference(*args)
    got = talking_heads_attention(*args, q_tile=32, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=2e-5)


def test_pallas_single_tile_interpret(rng):
    args = _inputs(rng, B=1, H=2, N=32, dh=8)
    ref = talking_heads_reference(*args)
    got = talking_heads_attention(*args, q_tile=32, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=2e-5)


def test_pallas_matches_module_path(rng):
    """The flax TalkingHeadsAttention (einsum) and the kernel agree through
    the module's qkv/proj wrapping."""
    import flax.linen as nn

    from spe_tpu.models.attention import TalkingHeadsAttention

    B, N, D, H = 2, 64, 32, 4
    x = jnp.array(rng.normal(size=(B, N, D)).astype(np.float32))
    mod = TalkingHeadsAttention(num_heads=H)
    params = mod.init(jax.random.PRNGKey(0), x)
    ref_out = mod.apply(params, x)

    p = params["params"]
    qkv = x @ p["qkv"]["kernel"] + p["qkv"]["bias"]
    q, k, v = jnp.split(qkv, 3, axis=-1)
    split = lambda t: t.reshape(B, N, H, D // H).transpose(0, 2, 1, 3)
    out = talking_heads_attention(
        split(q), split(k), split(v),
        p["proj_l"], p["proj_l_bias"], p["proj_w"], p["proj_w_bias"],
        q_tile=32, interpret=True)
    out = out.transpose(0, 2, 1, 3).reshape(B, N, D)
    out = out @ p["proj"]["kernel"] + p["proj"]["bias"]
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref_out), atol=2e-5)
