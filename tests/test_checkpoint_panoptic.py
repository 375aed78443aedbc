import json

import jax
import jax.numpy as jnp
import numpy as np
from PIL import Image

from spe_tpu.data.coco_panoptic import CocoPanopticDataset, decode_segment_map


def test_decode_segment_map():
    png = np.zeros((2, 2, 3), np.uint8)
    png[0, 0] = (7, 0, 0)      # id 7
    png[0, 1] = (0, 1, 0)      # id 256
    png[1, 1] = (1, 1, 1)      # id 1 + 256 + 65536
    ids = decode_segment_map(png)
    assert ids[0, 0] == 7 and ids[0, 1] == 256 and ids[1, 1] == 65793


def test_coco_panoptic_dataset(tmp_path, rng):
    img_dir = tmp_path / "imgs"
    ann_dir = tmp_path / "panoptic"
    img_dir.mkdir()
    ann_dir.mkdir()
    Image.fromarray(rng.integers(0, 255, (20, 30, 3)).astype(np.uint8)).save(
        img_dir / "img0.jpg")
    seg = np.zeros((20, 30, 3), np.uint8)
    seg[2:10, 3:12, 0] = 5  # segment id 5
    Image.fromarray(seg).save(ann_dir / "img0.png")
    ann = {
        "images": [{"id": 0, "file_name": "img0.jpg", "width": 30, "height": 20}],
        "annotations": [{
            "image_id": 0, "file_name": "img0.png",
            "segments_info": [{"id": 5, "category_id": 2, "bbox": [3, 2, 9, 8],
                               "area": 72, "iscrowd": 0}],
        }],
        "categories": [{"id": 2, "name": "thing", "isthing": 1}],
    }
    p = tmp_path / "panoptic.json"
    p.write_text(json.dumps(ann))
    ds = CocoPanopticDataset(img_dir, ann_dir, p)
    assert len(ds) == 1
    img, t = ds[0]
    assert img.shape == (20, 30, 3)
    np.testing.assert_allclose(t["boxes"][0], [3, 2, 12, 10])
    assert t["labels"][0] == 2
    assert t["masks"].shape == (1, 20, 30)
    assert t["masks"][0, 5, 5] and not t["masks"][0, 0, 0]


def test_checkpoint_roundtrip(tmp_path, rng):
    from spe_tpu.config import SPEConfig
    from spe_tpu.train.checkpoint import restore_checkpoint, save_checkpoint
    from spe_tpu.train.train_step import TrainState

    params = {"w": jnp.array(rng.normal(size=(4, 4)).astype(np.float32)),
              "nested": {"b": jnp.arange(3, dtype=jnp.float32)}}
    opt_state = {"m": jnp.zeros((4, 4))}
    state = TrainState(jnp.int32(17), params, opt_state)
    cfg = SPEConfig(epochs=3)
    save_checkpoint(tmp_path / "ckpt", state, epoch=2, cfg=cfg)

    zero = TrainState(jnp.int32(0),
                      jax.tree_util.tree_map(jnp.zeros_like, params),
                      jax.tree_util.tree_map(jnp.zeros_like, opt_state))
    restored, epoch = restore_checkpoint(tmp_path / "ckpt", zero)
    assert epoch == 2
    assert int(restored.step) == 17
    np.testing.assert_allclose(np.asarray(restored.params["w"]),
                               np.asarray(params["w"]))
    np.testing.assert_allclose(np.asarray(restored.params["nested"]["b"]),
                               np.asarray(params["nested"]["b"]))


def test_load_params_lenient(tmp_path, rng):
    from spe_tpu.config import SPEConfig
    from spe_tpu.train.checkpoint import load_params_lenient, save_checkpoint
    from spe_tpu.train.train_step import TrainState

    params = {"params": {"backbone": {"w": jnp.array(rng.normal(size=(3, 3)).astype(np.float32))}}}
    state = TrainState(jnp.int32(5), params, {"m": jnp.zeros(2)})
    save_checkpoint(tmp_path / "ck", state, epoch=1, cfg=SPEConfig())

    # target has an EXTRA head the checkpoint lacks
    target = {"params": {"backbone": {"w": jnp.zeros((3, 3))},
                         "segm_head": {"k": jnp.full((2,), 7.0)}}}
    merged = load_params_lenient(tmp_path / "ck", target)
    np.testing.assert_allclose(np.asarray(merged["params"]["backbone"]["w"]),
                               np.asarray(params["params"]["backbone"]["w"]))
    np.testing.assert_allclose(np.asarray(merged["params"]["segm_head"]["k"]), 7.0)


def test_checkpoint_lr_vec_rebuilt_from_config(tmp_path):
    """lr_vec is derived state: it is NOT persisted (placeholder only), and
    restore always keeps the CURRENT optimizer init's vector — so resuming
    with a changed lr config takes effect instead of silently keeping the
    stale checkpointed per-element lr (ADVICE r4)."""
    from spe_tpu.config import SPEConfig
    from spe_tpu.train.checkpoint import restore_checkpoint, save_checkpoint
    from spe_tpu.train.optim import make_optimizer
    from spe_tpu.train.train_step import TrainState

    params = {"params": {"backbone": {"w": jnp.ones((2, 2))},
                         "head": {"w": jnp.ones((3,))}}}
    cfg_old = SPEConfig(lr=1e-4, lr_backbone=1e-5)
    tx_old = make_optimizer(cfg_old, steps_per_epoch=10, params=params)
    state = TrainState(jnp.int32(9), params, tx_old.init(params), jnp.int32(1))
    save_checkpoint(tmp_path / "ck", state, epoch=4, cfg=cfg_old)

    # the saved artifact must not carry the params-sized lr vector
    import orbax.checkpoint as ocp
    raw = ocp.StandardCheckpointer().restore((tmp_path / "ck").resolve() / "state")
    assert raw["opt_state"]["lr_vec"].size == 1

    # resume under a CHANGED lr config: restored lr_vec == new config's
    cfg_new = SPEConfig(lr=5e-4, lr_backbone=2e-5)
    tx_new = make_optimizer(cfg_new, steps_per_epoch=10, params=params)
    zero = TrainState(jnp.int32(0),
                      jax.tree_util.tree_map(jnp.zeros_like, params),
                      tx_new.init(params), jnp.int32(0))
    restored, epoch = restore_checkpoint(tmp_path / "ck", zero)
    assert epoch == 4 and int(restored.step) == 9 and int(restored.bad_steps) == 1
    np.testing.assert_allclose(np.asarray(restored.opt_state.lr_vec),
                               np.asarray(zero.opt_state.lr_vec))
    assert np.any(np.asarray(restored.opt_state.lr_vec) == np.float32(5e-4))
    np.testing.assert_allclose(np.asarray(restored.params["params"]["head"]["w"]), 1.0)


def test_checkpoint_pre_lr_vec_compat(tmp_path):
    """Checkpoints written before FusedAdamWState gained lr_vec (no such key
    on disk) still restore; truly-missing leaves still fail loudly."""
    from spe_tpu.config import SPEConfig
    from spe_tpu.train.checkpoint import restore_checkpoint, save_checkpoint
    from spe_tpu.train.optim import make_optimizer
    from spe_tpu.train.train_step import TrainState
    import pytest

    params = {"w": jnp.full((3,), 2.0)}
    # simulate an OLD checkpoint: opt_state without lr_vec at all
    old_opt = {"count": jnp.int32(3), "mu": jnp.zeros((3,)), "nu": jnp.ones((3,))}
    state_old = TrainState(jnp.int32(3), params, old_opt, jnp.int32(0))
    save_checkpoint(tmp_path / "old", state_old, epoch=1, cfg=SPEConfig())

    cfg = SPEConfig()
    tx = make_optimizer(cfg, steps_per_epoch=5, params=params)
    target = TrainState(jnp.int32(0), {"w": jnp.zeros((3,))}, tx.init(params),
                        jnp.int32(0))
    restored, epoch = restore_checkpoint(tmp_path / "old", target)
    assert epoch == 1
    np.testing.assert_allclose(np.asarray(restored.opt_state.nu), 1.0)
    np.testing.assert_allclose(np.asarray(restored.opt_state.lr_vec),
                               np.asarray(target.opt_state.lr_vec))

    # a genuinely missing leaf (not in _DERIVED_LEAVES) is an error
    bad_target = target._replace(params={"w": jnp.zeros((3,)),
                                         "extra": jnp.zeros((2,))})
    with pytest.raises(ValueError, match="missing"):
        restore_checkpoint(tmp_path / "old", bad_target)
