"""Worker for the 2-process distributed integration test.

Runs the REAL driver (spe_tpu.cli.main) under jax.distributed with a CPU
backend: each process owns 2 virtual CPU devices, the batch is process-
sharded by the loader, gradients ride GSPMD psums, and the per-epoch COCO
eval merges detections collectively — the exact wiring a real multi-host
pod launch uses (reference torch.distributed.launch + DistributedSampler +
CocoEvaluator.synchronize_between_processes).

Usage: python tests/dist_worker.py <rank> <port> <output_dir>
"""

import os
import sys

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=2").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")  # the axon plugin pins via config


def run(rank: int, port: int, output_dir: str) -> None:
    os.environ["RANK"] = str(rank)
    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    from spe_tpu.cli.main import main

    main([
        "--world_size", "2", "--dist_url", f"tcp://localhost:{port}",
        "--dataset_file", "synthetic", "--dataset_eval", "synthetic",
        "--backbone", "TSCAM_cait_tiny", "--layer_to_det", "3",
        "--num_classes", "5", "--num_queries", "12",
        "--enc_layers", "1", "--dec_layers", "2", "--dim_feedforward", "64",
        "--nheads", "2", "--num_refines", "1", "--max_gt_boxes", "6",
        "--cam_cc_size", "16", "--hung_match_ratio", "3",
        "--compute_dtype", "float32", "--dropout", "0.0",
        "--max_size", "64", "--fixed_size", "--batch_size", "2",
        "--epochs", "1", "--num_workers", "1",
        "--output_dir", output_dir,
    ])
    # every process must reach this line; the pytest side asserts on it
    print(f"DIST_WORKER_DONE rank={rank}", flush=True, force=True)


if __name__ == "__main__":
    run(int(sys.argv[1]), int(sys.argv[2]), sys.argv[3])
