"""Synthetic end-to-end convergence (VERDICT round-1, item 2c): N epochs of
the REAL fused train step — CAM pseudo-boxes, auction matching, focal/L1/
GIoU criterion, AdamW — must push synthetic detection AP50 above a
committed threshold, with the weak-supervision chain checked at each link:

  1. the image-label heads learn (multilabel BCE drops),
  2. the CAM pseudo-boxes localize (mean best-IoU vs GT rises ~0.1 -> >0.4),
  3. the detector trained ONLY on those pseudo-boxes reaches AP50 >= 0.08
     (observed 0.21 at epoch 19 with these seeds; margin ~2.6x).

Everything is seeded and runs on the deterministic CPU backend, so the
thresholds are regression guards, not statistical gambles. ~2-3 min.

The same recipe (tests/convergence_recipe.py) runs on the real chip with
the fused Pallas kernels via scripts_dev/convergence_tpu.py — the
training-parity run behind the presets' use_pallas_attention default.
"""

import pytest

from tests.convergence_recipe import run_convergence


@pytest.mark.slow
def test_synthetic_training_converges():
    r = run_convergence(use_pallas=False)
    assert r["bad_steps"] == 0
    # 1) classifier learned
    assert r["bce"] < 0.3, r
    # 2) CAM pseudo-boxes localize
    assert r["iou_end"] > 0.35, r
    assert r["iou_end"] > r["iou_start"] + 0.15, r
    # 3) detection AP50 above the committed threshold
    assert r["ap50"] >= 0.08, r
