"""Sharded-KV / ring attention vs unsharded reference on a virtual mesh
(SURVEY §5.7: the long-context scaling hook the reference lacks)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import Mesh, PartitionSpec as P
from jax.experimental.shard_map import shard_map

from spe_tpu.ops.seq_parallel import kv_sharded_attention, ring_kv_attention

B, H, NQ, NK, DH, DV = 2, 4, 16, 64, 8, 8


def _mesh(n=4):
    devs = jax.devices("cpu")[:n]
    if len(devs) < n:
        pytest.skip("needs virtual CPU devices")
    return Mesh(np.array(devs), ("seq",))


def _ref(q, k, v, mask):
    qf = q / jnp.sqrt(q.shape[-1]).astype(q.dtype)
    logits = jnp.einsum("bhqd,bhkd->bhqk", qf, k)
    logits = jnp.where(mask[:, None, None, :], -1e9, logits)
    attn = jax.nn.softmax(logits, axis=-1)
    return jnp.einsum("bhqk,bhkd->bhqd", attn, v)


def _inputs(rng):
    mk = lambda *s: jnp.array(rng.normal(size=s).astype(np.float32))
    q, k, v = mk(B, H, NQ, DH), mk(B, H, NK, DH), mk(B, H, NK, DV)
    mask = jnp.array(rng.uniform(size=(B, NK)) > 0.8)
    return q, k, v, mask


@pytest.mark.parametrize("fn", [kv_sharded_attention, ring_kv_attention])
def test_matches_unsharded(rng, fn):
    mesh = _mesh()
    q, k, v, mask = _inputs(rng)

    sharded = shard_map(
        lambda q, k, v, m: fn(q, k, v, axis_name="seq",
                              key_padding_mask_local=m),
        mesh=mesh,
        in_specs=(P(), P(None, None, "seq", None), P(None, None, "seq", None),
                  P(None, "seq")),
        out_specs=P(), check_rep=False)
    out = jax.jit(sharded)(q, k, v, mask)
    np.testing.assert_allclose(np.asarray(out), np.asarray(_ref(q, k, v, mask)),
                               rtol=2e-5, atol=2e-5)


def test_grads_match_unsharded(rng):
    mesh = _mesh()
    q, k, v, mask = _inputs(rng)

    def loss_sharded(q, k, v):
        f = shard_map(
            lambda q, k, v, m: kv_sharded_attention(
                q, k, v, axis_name="seq", key_padding_mask_local=m),
            mesh=mesh,
            in_specs=(P(), P(None, None, "seq", None),
                      P(None, None, "seq", None), P(None, "seq")),
            out_specs=P(), check_rep=False)
        return jnp.sum(f(q, k, v, mask) ** 2)

    def loss_ref(q, k, v):
        return jnp.sum(_ref(q, k, v, mask) ** 2)

    gs = jax.jit(jax.grad(loss_sharded, argnums=(0, 1, 2)))(q, k, v)
    gr = jax.jit(jax.grad(loss_ref, argnums=(0, 1, 2)))(q, k, v)
    for name, a, b in zip("qkv", gs, gr):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=5e-5,
                                   atol=5e-5, err_msg=f"grad {name}")


def test_fully_masked_shard(rng):
    """A shard whose keys are ALL padding must not poison the merge."""
    mesh = _mesh()
    q, k, v, _ = _inputs(rng)
    mask = jnp.zeros((B, NK), bool).at[:, -NK // 4:].set(True)  # last shard all pad

    sharded = shard_map(
        lambda q, k, v, m: kv_sharded_attention(q, k, v, axis_name="seq",
                                                key_padding_mask_local=m),
        mesh=mesh,
        in_specs=(P(), P(None, None, "seq", None), P(None, None, "seq", None),
                  P(None, "seq")),
        out_specs=P(), check_rep=False)
    out = jax.jit(sharded)(q, k, v, mask)
    assert np.isfinite(np.asarray(out)).all()
    np.testing.assert_allclose(np.asarray(out), np.asarray(_ref(q, k, v, mask)),
                               rtol=2e-5, atol=2e-5)


def test_mha_module_kv_shard_axis(rng):
    """MultiheadAttention(kv_shard_axis=...) under shard_map matches the
    einsum module path."""
    import flax.linen as _nn  # noqa: F401 (import parity with module file)
    from spe_tpu.models.attention import MultiheadAttention

    mesh = _mesh()
    mk = lambda *s: jnp.array(rng.normal(size=s).astype(np.float32))
    x = mk(B, NK, 16)
    mod_ref = MultiheadAttention(num_heads=4)
    params = mod_ref.init(jax.random.PRNGKey(0), x, x, x)
    want = mod_ref.apply(params, x, x, x)

    mod_sp = MultiheadAttention(num_heads=4, kv_shard_axis="seq")

    def inner(x_q, x_kv):
        return mod_sp.apply(params, x_q, x_kv, x_kv)

    f = shard_map(inner, mesh=mesh,
                  in_specs=(P(), P(None, "seq", None)),
                  out_specs=P(), check_rep=False)
    got = jax.jit(f)(x, x)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-5, atol=2e-5)
