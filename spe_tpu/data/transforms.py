"""Image/box transforms (numpy + PIL), reference datasets/transforms.py.

The published recipe (`--fixed_size`, coco.py:344-383) is:
  train: RandomHorizontalFlip -> Resize((S, S)) -> normalize(ImageNet)
  val:   Resize((S, S)) -> normalize
The DETR multi-scale chain (make_coco_transforms, coco.py:271-300) is also
provided for API parity: RandomResize(shortest-side scales, max_size) and
RandomSelect with RandomSizeCrop.

Targets ride along as numpy dicts: boxes xyxy absolute pixels, labels,
img_label, orig_size. Normalization of boxes to cxcywh happens at batch
time (reference does it inside T.Normalize, transforms.py).
"""

from __future__ import annotations

import random
from typing import Dict, List, Optional, Tuple

import numpy as np
from PIL import Image

IMAGENET_MEAN = np.array([0.485, 0.456, 0.406], np.float32)
IMAGENET_STD = np.array([0.229, 0.224, 0.225], np.float32)


def hflip(img: Image.Image, target: Dict) -> Tuple[Image.Image, Dict]:
    img = img.transpose(Image.FLIP_LEFT_RIGHT)
    w = img.size[0]
    t = dict(target)
    if len(t.get("boxes", [])):
        b = t["boxes"].copy()
        b[:, [0, 2]] = w - b[:, [2, 0]]
        t["boxes"] = b
    if "masks" in t and len(t["masks"]):
        t["masks"] = t["masks"][:, :, ::-1].copy()
    return img, t


def resize(img: Image.Image, target: Dict, size: Tuple[int, int]) -> Tuple[Image.Image, Dict]:
    """size = (h, w) absolute."""
    w0, h0 = img.size
    h1, w1 = size
    img = img.resize((w1, h1), Image.BILINEAR)
    t = dict(target)
    if len(t.get("boxes", [])):
        b = t["boxes"].copy().astype(np.float32)
        b[:, [0, 2]] *= w1 / w0
        b[:, [1, 3]] *= h1 / h0
        t["boxes"] = b
    if "masks" in t and len(t["masks"]):
        # nearest-neighbor via index sampling (reference interpolates masks
        # with nearest when resizing, transforms.py resize path)
        m = t["masks"]
        yi = (np.arange(h1) * (m.shape[1] / h1)).astype(np.int64)
        xi = (np.arange(w1) * (m.shape[2] / w1)).astype(np.int64)
        t["masks"] = m[:, yi][:, :, xi]
    t["size"] = np.array([h1, w1], np.int64)
    return img, t


def random_resize_shortest(img, target, scales: List[int], max_size: Optional[int] = None):
    """torchvision RandomResize semantics: shortest side to `s`, capped."""
    s = random.choice(scales)
    w0, h0 = img.size
    short, long = min(w0, h0), max(w0, h0)
    scale = s / short
    if max_size is not None and long * scale > max_size:
        scale = max_size / long
    return resize(img, target, (round(h0 * scale), round(w0 * scale)))


def random_size_crop(img, target, min_size: int, max_size: int):
    w0, h0 = img.size
    w = random.randint(min(min_size, w0), min(max_size, w0))
    h = random.randint(min(min_size, h0), min(max_size, h0))
    x0 = random.randint(0, w0 - w)
    y0 = random.randint(0, h0 - h)
    img = img.crop((x0, y0, x0 + w, y0 + h))
    t = dict(target)
    if len(t.get("boxes", [])):
        b = t["boxes"].copy()
        b[:, [0, 2]] = np.clip(b[:, [0, 2]] - x0, 0, w)
        b[:, [1, 3]] = np.clip(b[:, [1, 3]] - y0, 0, h)
        keep = (b[:, 2] > b[:, 0]) & (b[:, 3] > b[:, 1])
        t["boxes"] = b[keep]
        if "labels" in t:
            t["labels"] = t["labels"][keep]
        if "masks" in t and len(t["masks"]):
            t["masks"] = t["masks"][keep][:, y0:y0 + h, x0:x0 + w]
    t["size"] = np.array([h, w], np.int64)
    return img, t


def normalize_image(img: Image.Image) -> np.ndarray:
    x = np.asarray(img.convert("RGB"), np.float32) / 255.0
    return (x - IMAGENET_MEAN) / IMAGENET_STD


class FixedSizeTransform:
    """The published recipe (coco.py:344-383)."""

    def __init__(self, size: int, train: bool):
        self.size = size
        self.train = train

    def __call__(self, img, target):
        if self.train and random.random() < 0.5:
            img, target = hflip(img, target)
        img, target = resize(img, target, (self.size, self.size))
        return normalize_image(img), target


class MultiScaleTransform:
    """DETR-style multi-scale recipe (coco.py:271-300 / :303-341)."""

    SCALES = [480, 512, 544, 576, 608, 640, 672, 704, 736, 768, 800]

    def __init__(self, max_size: int = 1333, train: bool = True):
        self.max_size = max_size
        self.scales = [s * max_size // 1333 for s in self.SCALES]
        self.rand_sizes = [r * max_size // 1333 for r in (400, 500, 600)]
        self.crop = tuple(c * max_size // 1333 for c in (384, 600))
        self.train = train

    def __call__(self, img, target):
        if self.train:
            if random.random() < 0.5:
                img, target = hflip(img, target)
            if random.random() < 0.5:
                img, target = random_resize_shortest(img, target, self.scales, self.max_size)
            else:
                img, target = random_resize_shortest(img, target, self.rand_sizes)
                img, target = random_size_crop(img, target, *self.crop)
                img, target = random_resize_shortest(img, target, self.scales, self.max_size)
        else:
            img, target = random_resize_shortest(
                img, target, [800 * self.max_size // 1333], self.max_size)
        return normalize_image(img), target
