"""SPE-TPU: a TPU-native weakly-supervised detection framework.

A from-scratch JAX/XLA/Pallas rebuild of the capabilities of MingXiangL/SPE
("End-to-End Weakly Supervised Object Detection with Sparse Proposal
Evolution"): a CaiT two-branch backbone produces class-attention maps (CAMs),
CAMs are converted on-device into pseudo ground-truth boxes, and a
Conditional-DETR encoder/decoder is trained against those pseudo boxes with
on-device assignment + focal/GIoU losses, plus self-refinement decoder passes.

Design stance (vs the PyTorch reference at /root/reference):
  * everything in the hot loop is one jitted program: CAM->boxes, box-repeat
    jitter, Hungarian-style assignment and post-processing all run on TPU
    with fixed shapes + masks (the reference round-trips to cv2/scipy on CPU
    per image per step);
  * batch-first layouts, bf16-friendly matmuls, pjit/shard_map over a
    `jax.sharding.Mesh` instead of DDP/NCCL;
  * single dataclass config with recipe presets instead of duplicated
    argparse drivers.
"""

__version__ = "0.1.0"

from spe_tpu.config import SPEConfig, voc0712_preset, coco17_preset  # noqa: F401
