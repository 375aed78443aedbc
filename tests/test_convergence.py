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


@pytest.mark.slow
def test_two_stage_refinement_converges():
    """The FULL weak-supervision chain incl. the self-refinement stage:
    PostProcessRefine pseudo labels supervise stage 1 with score-weighted
    SetCriterionRefine from refine_start_epoch on (reference
    engine.py:271-308, conditional_detr.py:497-589). Both stages must clear
    a detection bar — refinement must not break the base stage.

    Bar calibration (r4 bisect, same seeds, CPU): the base-stage AP50 at
    this tiny 28-epoch scale is CHAOTIC under last-ulp numeric changes —
    commits that only reorder float summations (batched decoder passes,
    flat-vector optimizer tail; each carries bit-parity or 1e-7-parity
    tests against its predecessor formulation) moved it across
    0.062 / 0.089 / 0.123 / 0.130, while bce (0.03-0.10), pseudo-box IoU
    (0.57±0.01) and refine-stage AP50 (0.095-0.131) stayed stable. The
    bars are therefore set BELOW the observed chaos band — a broken chain
    reads ~0.0x AP50 and still fails loudly — with the refine head (the
    stage the reference actually evaluates, engine.py:642) held to the
    tighter bar. ~4 min on CPU."""
    r = run_convergence(use_pallas=False, epochs=28, num_refines=1,
                        refine_start_epoch=10)
    assert r["bad_steps"] == 0
    assert r["bce"] < 0.3, r
    assert r["iou_end"] > 0.35, r
    assert r["ap50"] >= 0.04, r
    assert r["ap50_refine"] >= 0.07, r
