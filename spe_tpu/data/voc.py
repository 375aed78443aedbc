"""VOC datasets.

Two forms, like the reference:
  * VOC-as-COCO (datasets/voc.py): COCO-format json files
    (voc_07_12_trainval.json / voc_2007_test.json) with 20 classes — just
    CocoFormatDataset with num_classes=20.
  * VOCdevkit (datasets/voc_voc.py:68-347): raw ImageSets/Main txt splits +
    XML annotations across VOC2007/VOC2012, used for the eval side (mAP and
    CorLoc against difficult-aware GT).
"""

from __future__ import annotations

import xml.etree.ElementTree as ET
from pathlib import Path
from typing import Dict, List, Tuple

import numpy as np
from PIL import Image

VOC_CLASSES = (
    "aeroplane", "bicycle", "bird", "boat", "bottle", "bus", "car", "cat",
    "chair", "cow", "diningtable", "dog", "horse", "motorbike", "person",
    "pottedplant", "sheep", "sofa", "train", "tvmonitor",
)


def parse_voc_xml(path) -> Dict:
    """Annotation XML -> {boxes xyxy, labels (1-based), difficult}."""
    root = ET.parse(path).getroot()
    boxes, labels, difficult = [], [], []
    for obj in root.findall("object"):
        name = obj.findtext("name")
        if name not in VOC_CLASSES:
            continue
        bb = obj.find("bndbox")
        # VOC pixel indices are 1-based (voc_voc.py subtracts 1)
        boxes.append([float(bb.findtext("xmin")) - 1, float(bb.findtext("ymin")) - 1,
                      float(bb.findtext("xmax")) - 1, float(bb.findtext("ymax")) - 1])
        labels.append(VOC_CLASSES.index(name) + 1)
        difficult.append(int(obj.findtext("difficult", "0")))
    return {
        "boxes": np.array(boxes, np.float32).reshape(-1, 4),
        "labels": np.array(labels, np.int64),
        "difficult": np.array(difficult, np.int64).astype(bool),
    }


class VOCDevkitDataset:
    """Raw VOCdevkit dataset (reference VOCDataset, voc_voc.py:68-347).

    devkit_root contains VOC2007/ (and optionally VOC2012/); split is e.g.
    [('VOC2007', 'test')] or [('VOC2007', 'trainval'), ('VOC2012', 'trainval')].
    """

    def __init__(self, devkit_root, splits: List[Tuple[str, str]],
                 transform=None, keep_difficult: bool = True):
        self.root = Path(devkit_root)
        self.transform = transform
        self.keep_difficult = keep_difficult
        self.items: List[Tuple[str, str]] = []  # (year_dir, image_id)
        for year, split in splits:
            lst = self.root / year / "ImageSets" / "Main" / f"{split}.txt"
            for line in lst.read_text().split():
                if line.strip():
                    self.items.append((year, line.strip()))
        self.classes = VOC_CLASSES

    def __len__(self):
        return len(self.items)

    def _ann(self, idx: int) -> Dict:
        year, img_id = self.items[idx]
        return parse_voc_xml(self.root / year / "Annotations" / f"{img_id}.xml")

    def image_path(self, idx: int):
        """File path by dataset index (native decode fast path)."""
        year, img_id = self.items[idx]
        return self.root / year / "JPEGImages" / f"{img_id}.jpg"

    def target_at(self, idx: int):
        return self.get_target(idx)

    def get_target(self, idx: int) -> Dict:
        year, img_id = self.items[idx]
        ann = self._ann(idx)
        img_path = self.root / year / "JPEGImages" / f"{img_id}.jpg"
        with Image.open(img_path) as im:
            w, h = im.size
        keep = np.ones(len(ann["labels"]), bool)
        if not self.keep_difficult:
            keep = ~ann["difficult"]
        img_label = np.zeros(len(VOC_CLASSES), np.float32)
        for c in ann["labels"][keep]:
            img_label[c - 1] = 1.0
        return {
            "image_id": idx,
            "boxes": ann["boxes"][keep],
            "labels": ann["labels"][keep],
            "difficult": ann["difficult"][keep],
            "img_label": img_label,
            "orig_size": np.array([h, w], np.int64),
            "size": np.array([h, w], np.int64),
        }

    def __getitem__(self, idx: int):
        year, img_id = self.items[idx]
        img = Image.open(self.root / year / "JPEGImages" / f"{img_id}.jpg").convert("RGB")
        target = self.get_target(idx)
        if self.transform is not None:
            return self.transform(img, target)
        from spe_tpu.data.transforms import normalize_image

        return normalize_image(img), target

    # ---- eval-side GT in the shape voc_eval/corloc expect ----
    def eval_ground_truth(self) -> Dict[int, Dict]:
        """{class (1-based): {idx: (boxes, difficult)}}."""
        gt: Dict[int, Dict] = {c + 1: {} for c in range(len(VOC_CLASSES))}
        for idx in range(len(self.items)):
            ann = self._ann(idx)
            for c in np.unique(ann["labels"]):
                sel = ann["labels"] == c
                gt[int(c)][idx] = (ann["boxes"][sel].astype(np.float64),
                                   ann["difficult"][sel])
        return gt
