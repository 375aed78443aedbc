"""Training-parity run on the REAL chip: the synthetic-convergence recipe
with use_pallas_attention=True (fused talking-heads + generic MHA kernels,
in-kernel attention dropout). Passing the same milestones as the CPU/einsum
regression test is the gate for defaulting the presets to the fused path.

Usage: PYTHONPATH=.:$PYTHONPATH python scripts_dev/convergence_tpu.py [rate]
"""

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from spe_tpu.utils.jax_setup import setup

setup()

sys.path.insert(0, ".")
from tests.convergence_recipe import run_convergence  # noqa: E402

if __name__ == "__main__":
    pos = [a for a in sys.argv[1:] if not a.startswith("--")]
    rate = float(pos[0]) if pos else 0.05
    fused_layers = "--fused-layers" in sys.argv
    fused_block = "--fused-block" in sys.argv
    r = run_convergence(use_pallas=True, dropout=rate,
                        use_fused_block=fused_block,
                        use_fused_layers=fused_layers)
    print(f"fused TPU run (fused_layers={fused_layers}, "
          f"fused_block={fused_block}):", r)
    assert r["bad_steps"] == 0
    assert r["bce"] < 0.3, r
    assert r["iou_end"] > 0.35, r
    assert r["iou_end"] > r["iou_start"] + 0.15, r
    assert r["ap50"] >= 0.08, r
    print("TRAINING PARITY OK (fused kernels, attention dropout "
          f"rate={rate})")
