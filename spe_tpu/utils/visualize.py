"""Offline visualization (host-side; reference cams_deit.py:16-31 blend_cam,
:178-260 draw_gt_bbox). cv2 is used only here — never in the training loop."""

from __future__ import annotations

from typing import Sequence

import numpy as np


def resize_cam(cam: np.ndarray, size) -> np.ndarray:
    """cv2 resize + min-max normalize (cams_deit.py:9-13)."""
    import cv2

    cam = cv2.resize(cam.astype(np.float32), (size[0], size[1]))
    cam = cam - cam.min()
    cam = cam / max(cam.max(), 1e-12)
    return cam


def blend_cam(image: np.ndarray, cam: np.ndarray):
    """Overlay a [0,1] CAM on a uint8 BGR image (cams_deit.py:16-21)."""
    import cv2

    heat = cv2.applyColorMap((cam * 255).astype(np.uint8), cv2.COLORMAP_JET)
    blend = image.astype(np.float64) * 0.5 + heat * 0.5
    return blend.astype(np.uint8), heat


def draw_boxes(image: np.ndarray, boxes_xyxy: Sequence, scores=None,
               labels=None, color=(0, 0, 255), thickness: int = 2) -> np.ndarray:
    import cv2

    out = np.ascontiguousarray(image).copy()
    for i, b in enumerate(boxes_xyxy):
        x0, y0, x1, y1 = [int(round(float(v))) for v in b]
        cv2.rectangle(out, (x0, y0), (x1, y1), color, thickness)
        tag = ""
        if labels is not None:
            tag += str(labels[i])
        if scores is not None:
            tag += f" {float(scores[i]):.2f}"
        if tag:
            cv2.putText(out, tag, (x0, max(y0 - 4, 10)),
                        cv2.FONT_HERSHEY_SIMPLEX, 0.5, color, 1)
    return out


def denormalize_image(x: np.ndarray) -> np.ndarray:
    """Invert the ImageNet normalization back to uint8 RGB."""
    from spe_tpu.data.transforms import IMAGENET_MEAN, IMAGENET_STD

    img = (x * IMAGENET_STD + IMAGENET_MEAN) * 255.0
    return np.clip(img, 0, 255).astype(np.uint8)
