import flax
import jax
import jax.numpy as jnp
import numpy as np

from spe_tpu.models.cait import CaiTConfig, CaiTTwoBranch
from spe_tpu.parallel.mesh import make_mesh
from spe_tpu.parallel.sharding_rules import tp_param_shardings
from jax.sharding import NamedSharding, PartitionSpec as P


def test_tp_sharded_forward_matches_replicated(rng):
    """2x4 (data x model) mesh: TP-sharded params give the same outputs as
    replicated execution; GSPMD inserts the collectives."""
    assert len(jax.devices()) == 8
    mesh = make_mesh(num_data=2, num_model=4)

    cfg = CaiTConfig(img_size=64, patch_size=16, embed_dim=32, depth=2,
                     num_heads=4, num_classes=3, layer_to_det=1,
                     depth_token_only=1)
    model = CaiTTwoBranch(cfg)
    x = jnp.array(rng.normal(size=(4, 64, 64, 3)).astype(np.float32))
    params = model.init(jax.random.PRNGKey(0), x)
    ref = model.apply(params, x)

    from spe_tpu.config import SPEConfig

    rules = tp_param_shardings(params, mesh, SPEConfig())
    # some kernels must actually be model-sharded
    flat = flax.traverse_util.flatten_dict(
        jax.tree_util.tree_map(lambda s: s.spec, rules)["params"])
    sharded = [k for k, v in flat.items() if v != P()]
    assert any("fc1" in k for k in sharded)
    assert any("qkv" in k for k in sharded)

    params_tp = jax.device_put(params, rules)
    batch_sh = NamedSharding(mesh, P("data"))
    x_tp = jax.device_put(x, batch_sh)
    fn = jax.jit(model.apply, in_shardings=(rules, batch_sh))
    out = fn(params_tp, x_tp)
    for k in ("x_logits", "x_cls_logits", "cams_cls"):
        np.testing.assert_allclose(np.asarray(out[k]), np.asarray(ref[k]),
                                   atol=2e-4, err_msg=k)


def test_tp_refuses_fused_kernels():
    """VERDICT r3 Next #5: TP x fused Pallas kernels is explicitly refused.
    The fused whole-block/whole-layer kernels consume raw param arrays
    inside one pallas_call; GSPMD cannot partition through them, so
    tp_param_shardings(cfg=...) must raise with an actionable message when
    the model axis >1 and any fusion flag is on."""
    import pytest

    from spe_tpu.config import SPEConfig
    from spe_tpu.parallel.sharding_rules import check_tp_fused_compat

    mesh_tp = make_mesh(num_data=4, num_model=2)
    mesh_dp = make_mesh(num_data=8, num_model=1)
    cfg_fused = SPEConfig(use_fused_block=True, use_pallas_attention=True)
    cfg_plain = SPEConfig(use_fused_block=False, use_fused_layers=False,
                          use_pallas_attention=False)

    with pytest.raises(ValueError, match="use_fused_block"):
        check_tp_fused_compat(cfg_fused, mesh_tp)
    with pytest.raises(ValueError, match="no_use_pallas_attention"):
        tp_param_shardings({"w": jnp.zeros((4, 4))}, mesh_tp, cfg_fused)

    # fine: DP-only mesh with fused kernels, or TP with fusion off
    check_tp_fused_compat(cfg_fused, mesh_dp)
    check_tp_fused_compat(cfg_plain, mesh_tp)
    tp_param_shardings({"w": jnp.zeros((4, 4))}, mesh_tp, cfg_plain)
