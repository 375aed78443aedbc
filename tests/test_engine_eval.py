import numpy as np
import pytest
from PIL import Image

import jax
import jax.numpy as jnp

from spe_tpu.config import SPEConfig
from spe_tpu.data.loader import DataLoader
from spe_tpu.data.transforms import FixedSizeTransform
from spe_tpu.data.voc import VOC_CLASSES, VOCDevkitDataset
from spe_tpu.models.cait import CaiTConfig
from spe_tpu.models.detector import SPEDetector
from spe_tpu.train import engine

XML_TMPL = """<annotation>
  <size><width>64</width><height>64</height><depth>3</depth></size>
  <object><name>{name}</name><difficult>0</difficult>
    <bndbox><xmin>9</xmin><ymin>9</ymin><xmax>41</xmax><ymax>41</ymax></bndbox>
  </object>
</annotation>"""


@pytest.fixture
def devkit(tmp_path, rng):
    root = tmp_path / "VOCdevkit"
    for sub in ("Annotations", "JPEGImages", "ImageSets/Main"):
        (root / "VOC2007" / sub).mkdir(parents=True)
    ids = []
    for i in range(4):
        img_id = f"{i:06d}"
        ids.append(img_id)
        Image.fromarray(rng.integers(0, 255, (64, 64, 3)).astype(np.uint8)).save(
            root / "VOC2007" / "JPEGImages" / f"{img_id}.jpg")
        (root / "VOC2007" / "Annotations" / f"{img_id}.xml").write_text(
            XML_TMPL.format(name=VOC_CLASSES[i % 3]))
    (root / "VOC2007" / "ImageSets" / "Main" / "test.txt").write_text("\n".join(ids))
    return root


def test_evaluate_voc_end_to_end(devkit, rng):
    """Full VOC eval path (incl. flip-TTA decouple merge) with a tiny model:
    must produce a finite mAP/CorLoc without shape errors."""
    cfg = SPEConfig(num_classes=20, max_size=64, fixed_size=True, num_queries=8,
                    enc_layers=1, dec_layers=2, dim_feedforward=32, nheads=2,
                    num_refines=1, compute_dtype="float32")
    bb = CaiTConfig(img_size=64, patch_size=16, embed_dim=32, depth=3,
                    num_heads=2, num_classes=20, layer_to_det=2,
                    depth_token_only=2)
    model = SPEDetector(backbone_cfg=bb, num_det_classes=21, num_queries=8,
                        num_refines=1, enc_layers=1, dec_layers=2,
                        dim_feedforward=32, nheads=2)
    ds = VOCDevkitDataset(devkit, [("VOC2007", "test")],
                          transform=FixedSizeTransform(64, train=False))
    loader = DataLoader(ds, batch_size=2, num_classes=20, fixed_size=64,
                        shuffle=False, drop_last=False)
    params = model.init(jax.random.PRNGKey(0),
                        jnp.zeros((1, 64, 64, 3), jnp.float32))
    for flip in (False, True):
        stats = engine.evaluate_voc(model, params, loader, ds, cfg,
                                    with_flip=flip, keep=8)
        assert 0.0 <= stats["mAP"] <= 1.0
        assert 0.0 <= stats["CorLoc"] <= 1.0


def test_flip_merge_semantics():
    out_n = {"pred_logits": jnp.ones((1, 3, 4)),
             "pred_boxes": jnp.array([[[0.2, 0.5, 0.1, 0.1]] * 3])}
    out_f = {"pred_logits": jnp.zeros((1, 3, 4)),
             "pred_boxes": jnp.array([[[0.7, 0.5, 0.1, 0.1]] * 3])}
    merged = engine._flip_merge(out_n, out_f)
    assert merged["pred_logits"].shape == (1, 6, 4)
    # flipped boxes get cx -> 1 - cx (engine_loc.py:110)
    np.testing.assert_allclose(np.asarray(merged["pred_boxes"][0, 3:, 0]), 0.3)
    np.testing.assert_allclose(np.asarray(merged["pred_boxes"][0, :3, 0]), 0.2)
