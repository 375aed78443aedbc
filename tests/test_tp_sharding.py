import flax
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from spe_tpu.models.cait import CaiTConfig, CaiTTwoBranch
from spe_tpu.parallel.mesh import make_mesh
from spe_tpu.parallel.sharding_rules import tp_param_shardings
from jax.sharding import NamedSharding, PartitionSpec as P


@pytest.mark.slow
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


def test_tp_head_sharded_fused_mha_matches_unsharded(rng):
    """r5 (VERDICT r4 #8 next step): the fused-MHA kernel family runs
    head-sharded over the model axis via shard_map — sharded and unsharded
    outputs and input grads must agree (dropout off; dropout streams are
    per-shard by design)."""
    from spe_tpu.ops.pallas_mha import fused_mha

    mesh = make_mesh(num_data=2, num_model=4)
    B, H, Nq, Nk, dh = 2, 4, 16, 40, 8
    q = jnp.array(rng.normal(size=(B, H, Nq, dh)).astype(np.float32))
    k = jnp.array(rng.normal(size=(B, H, Nk, dh)).astype(np.float32))
    v = jnp.array(rng.normal(size=(B, H, Nk, dh)).astype(np.float32))
    mask = jnp.zeros((B, Nk), bool).at[:, -5:].set(True)

    def f_ref(q, k, v):
        return fused_mha(q, k, v, key_padding_mask=mask, interpret=True)

    def f_tp(q, k, v):
        return fused_mha(q, k, v, key_padding_mask=mask, interpret=True,
                         tp_mesh=mesh)

    ref = jax.jit(f_ref)(q, k, v)
    tp = jax.jit(f_tp)(q, k, v)
    np.testing.assert_allclose(np.asarray(tp), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)

    g_ref = jax.jit(jax.grad(lambda a, b, c: jnp.sum(f_ref(a, b, c) ** 2),
                             argnums=(0, 1, 2)))(q, k, v)
    g_tp = jax.jit(jax.grad(lambda a, b, c: jnp.sum(f_tp(a, b, c) ** 2),
                            argnums=(0, 1, 2)))(q, k, v)
    for name, a, b in zip("qkv", g_tp, g_ref):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-4, atol=2e-4, err_msg=f"d{name}")


@pytest.mark.slow
def test_tp_attention_detector_matches_unsharded(rng):
    """build_model(cfg tp_attention, tp_mesh): the TP-sharded detector
    forward (head-sharded fused-MHA kernels + GSPMD-partitioned einsum
    backbone) matches the plain single-build forward on the same params."""
    from spe_tpu.config import SPEConfig
    from spe_tpu.models.build import build_model

    mesh = make_mesh(num_data=4, num_model=2)
    kw = dict(backbone="TSCAM_cait_XXS24", num_classes=3, layer_to_det=2,
              num_queries=8, enc_layers=1, dec_layers=2, dim_feedforward=32,
              nheads=2, num_refines=1, compute_dtype="float32", dropout=0.0,
              drop_path_rate=0.0, backbone_drop_rate=0.0, drop_attn_rate=0.0)
    import dataclasses as dc

    from spe_tpu.models.cait import build_cait_config  # noqa: F401 (doc)

    cfg_ref = SPEConfig(use_pallas_attention=False, **kw)
    cfg_tp = SPEConfig(use_pallas_attention=True, tp_attention=True, **kw)
    # shrink the backbone to test scale
    model_ref = build_model(cfg_ref)
    model_tp = build_model(cfg_tp, tp_mesh=mesh)
    model_ref = model_ref.clone(backbone_cfg=dc.replace(
        model_ref.backbone_cfg, img_size=32, patch_size=8, embed_dim=16,
        depth=3, num_heads=2, depth_token_only=1))
    model_tp = model_tp.clone(backbone_cfg=dc.replace(
        model_tp.backbone_cfg, img_size=32, patch_size=8, embed_dim=16,
        depth=3, num_heads=2, depth_token_only=1))

    x = jnp.array(rng.normal(size=(4, 32, 32, 3)).astype(np.float32))
    params = model_ref.init(jax.random.PRNGKey(0), x)
    ref = model_ref.apply(params, x)

    rules = tp_param_shardings(params, mesh, cfg_tp)
    params_tp = jax.device_put(params, rules)
    x_tp = jax.device_put(x, NamedSharding(mesh, P("data")))
    out = jax.jit(model_tp.apply, in_shardings=(rules, NamedSharding(
        mesh, P("data"))))(params_tp, x_tp)

    for stage in (0, 1):
        for key in ("pred_logits", "pred_boxes"):
            np.testing.assert_allclose(
                np.asarray(out["stages"][stage][key]),
                np.asarray(ref["stages"][stage][key]),
                rtol=5e-4, atol=5e-4, err_msg=f"{stage}/{key}")


def test_tp_attention_compat_rules():
    """use_pallas_attention under TP: refused WITHOUT tp_attention (with a
    hint), allowed WITH it; whole-block/layer kernels stay refused; nheads
    must divide the model axis."""
    import pytest

    from spe_tpu.config import SPEConfig
    from spe_tpu.parallel.sharding_rules import check_tp_fused_compat

    mesh_tp = make_mesh(num_data=4, num_model=2)

    with pytest.raises(ValueError, match="tp_attention"):
        check_tp_fused_compat(
            SPEConfig(use_pallas_attention=True), mesh_tp)
    check_tp_fused_compat(
        SPEConfig(use_pallas_attention=True, tp_attention=True, nheads=8),
        mesh_tp)
    with pytest.raises(ValueError, match="use_fused_block"):
        check_tp_fused_compat(
            SPEConfig(use_pallas_attention=True, tp_attention=True,
                      use_fused_block=True), mesh_tp)
    with pytest.raises(ValueError, match="divisible"):
        check_tp_fused_compat(
            SPEConfig(use_pallas_attention=True, tp_attention=True,
                      nheads=3), mesh_tp)
