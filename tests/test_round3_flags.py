"""Round-3 flag wiring: --no_aux_loss, --position_embedding learned,
world_size/dist_url, CAM evidence-based positive-class budget, and the
sequence-parallel dropout guard. Every parsed flag must change behavior or
raise (config.py validate() philosophy)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from spe_tpu.config import SPEConfig, config_from_args
from spe_tpu.models.cait import CaiTConfig
from spe_tpu.models.detector import SPEDetector
from spe_tpu.train.train_step import Gates, compute_losses


def tiny_cfg(**kw):
    base = dict(
        backbone="TSCAM_cait_XXS24", num_classes=5, layer_to_det=3,
        num_queries=12, enc_layers=1, dec_layers=2, dim_feedforward=64,
        nheads=2, num_refines=1, max_gt_boxes=6, max_cam_boxes_per_class=2,
        cam_cc_size=16, hung_match_ratio=3, compute_dtype="float32",
        dropout=0.0,
    )
    base.update(kw)
    return SPEConfig(**base)


def tiny_model(cfg, **det_kw):
    bb = CaiTConfig(img_size=64, patch_size=16, embed_dim=32, depth=4,
                    num_heads=2, num_classes=cfg.num_classes,
                    layer_to_det=cfg.layer_to_det, depth_token_only=2)
    return SPEDetector(backbone_cfg=bb, num_det_classes=cfg.num_det_classes,
                       num_queries=cfg.num_queries, num_refines=cfg.num_refines,
                       enc_layers=cfg.enc_layers, dec_layers=cfg.dec_layers,
                       dim_feedforward=cfg.dim_feedforward, nheads=cfg.nheads,
                       dropout=cfg.dropout, **det_kw)


def tiny_batch(rng, B=2, C=5):
    img_label = np.zeros((B, C), np.float32)
    img_label[:, 1] = 1
    img_label[0, 3] = 1
    return {
        "images": jnp.array(rng.normal(size=(B, 64, 64, 3)).astype(np.float32)),
        "img_label": jnp.array(img_label),
    }


# ---------------------------------------------------------------------------
# --no_aux_loss (reference main.py:89-90)
# ---------------------------------------------------------------------------

@pytest.mark.slow
def test_no_aux_loss_drops_aux_terms(rng):
    cfg = tiny_cfg()
    model = tiny_model(cfg)
    batch = tiny_batch(rng)
    params = model.init(jax.random.PRNGKey(0), batch["images"])
    gates = Gates.for_epoch(cfg, epoch=20)

    _, with_aux = compute_losses(model, params, batch, jax.random.PRNGKey(1),
                                 cfg, gates, deterministic=True)
    assert "loss_ce_0" in with_aux  # dec_layers=2 -> one aux layer

    cfg_na = cfg.replace(aux_loss=False)
    total_na, no_aux = compute_losses(model, params, batch,
                                      jax.random.PRNGKey(1), cfg_na, gates,
                                      deterministic=True)
    assert not any(k.endswith("_0") for k in no_aux), sorted(no_aux)
    assert "loss_ce" in no_aux and "ref_1_loss_ce" in no_aux
    assert np.isfinite(float(total_na))
    # final-layer losses are identical maths either way
    np.testing.assert_allclose(float(no_aux["loss_ce"]),
                               float(with_aux["loss_ce"]), rtol=1e-5)


def test_no_aux_loss_flag_parses():
    cfg = config_from_args(["--no_aux_loss"])
    assert cfg.aux_loss is False
    assert config_from_args([]).aux_loss is True


# ---------------------------------------------------------------------------
# --position_embedding learned (reference position_encoding.py:88-97)
# ---------------------------------------------------------------------------

def test_position_embedding_learned_dispatch(rng):
    cfg = tiny_cfg()
    batch = tiny_batch(rng)
    model = tiny_model(cfg, position_embedding="learned")
    params = model.init(jax.random.PRNGKey(0), batch["images"])
    flat = jax.tree_util.tree_leaves_with_path(params)
    names = {"/".join(str(getattr(k, "key", k)) for k in path)
             for path, _ in flat}
    assert any("pos_embed_learned" in n for n in names), sorted(names)[:20]
    out = model.apply(params, batch["images"], deterministic=True)
    assert np.all(np.isfinite(np.asarray(out["stages"][0]["pred_boxes"])))

    # sine model must NOT carry learned-pos params
    model_s = tiny_model(cfg, position_embedding="sine")
    params_s = model_s.init(jax.random.PRNGKey(0), batch["images"])
    flat_s = jax.tree_util.tree_leaves_with_path(params_s)
    names_s = {"/".join(str(getattr(k, "key", k)) for k in path)
               for path, _ in flat_s}
    assert not any("pos_embed_learned" in n for n in names_s)


def test_position_embedding_invalid_raises(rng):
    cfg = tiny_cfg()
    batch = tiny_batch(rng)
    model = tiny_model(cfg, position_embedding="fourier")
    with pytest.raises(ValueError, match="not supported"):
        model.init(jax.random.PRNGKey(0), batch["images"])


# ---------------------------------------------------------------------------
# world_size / dist_url (reference util/misc.py:414-436)
# ---------------------------------------------------------------------------

def test_init_distributed_single_process_noop():
    from spe_tpu.parallel.mesh import init_distributed

    init_distributed(1, "env://")  # must not touch jax.distributed


def test_init_distributed_requires_rank(monkeypatch):
    from spe_tpu.parallel.mesh import init_distributed

    for var in ("RANK", "PROCESS_ID", "JAX_PROCESS_ID"):
        monkeypatch.delenv(var, raising=False)
    with pytest.raises(ValueError, match="process id"):
        init_distributed(2, "tcp://localhost:12345")


# ---------------------------------------------------------------------------
# CAM positive-class budget selects by evidence (ADVICE r2, medium)
# ---------------------------------------------------------------------------

def test_cam_budget_keeps_strongest_channels():
    from spe_tpu.ops.cam_boxes import cam_pseudo_boxes

    B, C, S = 1, 6, 16
    cams = np.zeros((B, C, S, S), np.float32)
    ranges = [0.1, 5.0, 1.0, 3.0, 0.2, 0.05]
    for c, r in enumerate(ranges):
        cams[0, c, 4:10, 4:10] = r  # one centered blob per channel
    img_label = np.ones((B, C), np.float32)

    out = cam_pseudo_boxes(jnp.asarray(cams), jnp.asarray(img_label), 0.2,
                           size=S, k=2, max_boxes=8, max_pos=2)
    got = set(np.asarray(out["labels"])[0][np.asarray(out["mask"])[0]].tolist())
    # channels 1 and 3 have the largest dynamic range; labels are class+1
    assert got == {2, 4}, got


def test_cam_budget_exact_when_under_budget():
    """max_pos >= #positives must be bit-identical to the unbudgeted path."""
    from spe_tpu.ops.cam_boxes import cam_pseudo_boxes

    rng = np.random.default_rng(7)
    B, C, S = 2, 6, 16
    cams = rng.normal(size=(B, C, S, S)).astype(np.float32)
    img_label = np.zeros((B, C), np.float32)
    img_label[0, [1, 4]] = 1
    img_label[1, [0, 2, 5]] = 1

    full = cam_pseudo_boxes(jnp.asarray(cams), jnp.asarray(img_label), 0.2,
                            size=S, k=2, max_boxes=8, max_pos=None)
    budget = cam_pseudo_boxes(jnp.asarray(cams), jnp.asarray(img_label), 0.2,
                              size=S, k=2, max_boxes=8, max_pos=3)
    m = np.asarray(full["mask"])
    np.testing.assert_array_equal(m, np.asarray(budget["mask"]))
    np.testing.assert_array_equal(np.asarray(full["labels"]),
                                  np.asarray(budget["labels"]))
    # boxes at invalid slots are don't-care padding; compare valid ones only
    np.testing.assert_array_equal(np.asarray(full["boxes"])[m],
                                  np.asarray(budget["boxes"])[m])


# ---------------------------------------------------------------------------
# sequence-parallel dropout guard (ADVICE r2, low)
# ---------------------------------------------------------------------------

def test_kv_shard_dropout_guard(rng):
    from spe_tpu.models.attention import MultiheadAttention

    m = MultiheadAttention(num_heads=2, dropout=0.1, kv_shard_axis="seq")
    x = jnp.array(rng.normal(size=(1, 8, 16)).astype(np.float32))
    with pytest.raises(ValueError, match="dropout"):
        m.init({"params": jax.random.PRNGKey(0),
                "dropout": jax.random.PRNGKey(1)},
               x, x, x, deterministic=False)


# ---------------------------------------------------------------------------
# --backbone_weights auto -> published checkpoint URL table
# ---------------------------------------------------------------------------

def test_pretrained_url_table():
    from spe_tpu.models.cait import BACKBONE_REGISTRY
    from spe_tpu.models.convert import (PRETRAINED_URLS,
                                        resolve_backbone_weights)

    # every non-test registry backbone resolves to a fbaipublicfiles URL
    # (tiny/mini are synthetic rehearsal scales with no published weights)
    for name in BACKBONE_REGISTRY:
        if name in ("TSCAM_cait_tiny", "TSCAM_cait_mini"):
            continue
        url = resolve_backbone_weights("auto", name)
        assert url.startswith("https://dl.fbaipublicfiles.com/deit/"), (name, url)
        assert url.endswith(".pth")
    # explicit paths pass through untouched
    assert resolve_backbone_weights("/x/y.pth", "whatever") == "/x/y.pth"
    # unknown backbone fails loudly
    with pytest.raises(KeyError, match="tiny"):
        resolve_backbone_weights("auto", "TSCAM_cait_tiny")
    # the published recipe's checkpoint (reference cait.py:1676-1700)
    assert PRETRAINED_URLS["TSCAM_cait_XXS36_Two_Branch"].endswith("XXS36_384.pth")
