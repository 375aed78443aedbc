import json

import numpy as np
import pytest
from PIL import Image

from spe_tpu.config import SPEConfig
from spe_tpu.data.build import build_dataset
from spe_tpu.data.loader import DataLoader, collate
from spe_tpu.data.synthetic import SyntheticDetection
from spe_tpu.data.transforms import (FixedSizeTransform, MultiScaleTransform,
                                     hflip, normalize_image, resize)


def test_synthetic_dataset_contract():
    ds = SyntheticDetection(num_images=8, num_classes=4, img_size=96, seed=0)
    img, t = ds[0]
    assert img.shape == (96, 96, 3) and img.dtype == np.float32
    assert t["img_label"].shape == (4,)
    assert (t["labels"] >= 1).all() and (t["labels"] <= 4).all()
    assert t["boxes"].shape[1] == 4
    # img_label consistent with labels
    for c in t["labels"]:
        assert t["img_label"][c - 1] == 1.0
    gt = ds.coco_gt()
    assert len(gt["images"]) == 8 and len(gt["categories"]) == 4


def test_hflip_boxes():
    img = Image.new("RGB", (100, 50))
    t = {"boxes": np.array([[10, 5, 30, 20]], np.float32)}
    _, t2 = hflip(img, t)
    np.testing.assert_allclose(t2["boxes"], [[70, 5, 90, 20]])


def test_resize_boxes():
    img = Image.new("RGB", (100, 50))
    t = {"boxes": np.array([[10, 5, 30, 20]], np.float32)}
    _, t2 = resize(img, t, (100, 200))  # h x2, w x2
    np.testing.assert_allclose(t2["boxes"], [[20, 10, 60, 40]])


def test_fixed_size_transform():
    tf = FixedSizeTransform(64, train=False)
    img = Image.fromarray(np.full((30, 40, 3), 128, np.uint8))
    t = {"boxes": np.array([[0, 0, 40, 30]], np.float32)}
    x, t2 = tf(img, t)
    assert x.shape == (64, 64, 3)
    np.testing.assert_allclose(t2["boxes"], [[0, 0, 64, 64]], atol=1e-4)


def test_collate_padding_and_mask():
    imgs = [np.ones((32, 48, 3), np.float32), np.ones((48, 32, 3), np.float32)]
    targets = [{"img_label": np.zeros(3, np.float32), "image_id": i,
                "orig_size": np.array([32, 48]), "size": np.array([32, 48])}
               for i in range(2)]
    batch = collate(list(zip(imgs, targets)), num_classes=3)
    assert batch["images"].shape == (2, 48, 48, 3)
    assert not batch["pad_mask"][0, :32, :48].any()
    assert batch["pad_mask"][0, 32:, :].all()
    assert not batch["pad_mask"][1, :48, :32].any()


def test_dataloader_epoch_shuffling_and_sharding():
    cfg = SPEConfig(dataset_file="synthetic", num_classes=4, max_size=64, fixed_size=True)
    ds = build_dataset("train", "synthetic", cfg)
    dl0 = DataLoader(ds, batch_size=4, num_classes=4, fixed_size=64, seed=7,
                     process_index=0, process_count=2)
    dl1 = DataLoader(ds, batch_size=4, num_classes=4, fixed_size=64, seed=7,
                     process_index=1, process_count=2)
    ids0 = [b["image_id"] for b in dl0.epoch(0)]
    ids1 = [b["image_id"] for b in dl1.epoch(0)]
    all0 = np.concatenate(ids0)
    all1 = np.concatenate(ids1)
    assert set(all0.tolist()).isdisjoint(all1.tolist())
    # set_epoch semantics: different epoch -> different order
    all0b = np.concatenate([b["image_id"] for b in dl0.epoch(1)])
    assert not np.array_equal(all0, all0b)
    b = next(iter(dl0.epoch(0)))
    assert b["images"].shape == (4, 64, 64, 3)
    assert b["img_label"].shape == (4, 4)


def test_coco_format_dataset(tmp_path, rng):
    # synthesize a tiny COCO dataset on disk
    img_dir = tmp_path / "imgs"
    img_dir.mkdir()
    for i in range(3):
        Image.fromarray(rng.integers(0, 255, (40, 60, 3)).astype(np.uint8)).save(
            img_dir / f"{i:012d}.jpg")
    gt = {
        "images": [{"id": i, "file_name": f"{i:012d}.jpg", "width": 60, "height": 40}
                   for i in range(3)],
        "annotations": [
            {"id": 1, "image_id": 0, "category_id": 2, "bbox": [5, 5, 20, 10],
             "area": 200, "iscrowd": 0},
            {"id": 2, "image_id": 0, "category_id": 7, "bbox": [1, 1, 5, 5],
             "area": 25, "iscrowd": 0},
            {"id": 3, "image_id": 1, "category_id": 2, "bbox": [0, 0, 0, 0],
             "area": 0, "iscrowd": 0},  # degenerate
            {"id": 4, "image_id": 2, "category_id": 3, "bbox": [2, 2, 10, 10],
             "area": 100, "iscrowd": 1},  # crowd
        ],
        "categories": [{"id": c, "name": str(c)} for c in range(1, 10)],
    }
    ann = tmp_path / "ann.json"
    ann.write_text(json.dumps(gt))

    from spe_tpu.data.coco import CocoFormatDataset

    ds = CocoFormatDataset(img_dir, ann, num_classes=9, remove_empty=True)
    # image 1 (degenerate only) and 2 (crowd only) are removed
    assert ds.ids == [0]
    img, t = ds[0]
    assert img.shape == (40, 60, 3)
    np.testing.assert_array_equal(t["labels"], [2, 7])
    np.testing.assert_allclose(t["boxes"][0], [5, 5, 25, 15])
    assert t["img_label"][1] == 1 and t["img_label"][6] == 1 and t["img_label"].sum() == 2
