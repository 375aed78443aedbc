"""Device mesh + sharding layout.

The reference's only parallelism is synchronous data parallelism over NCCL
(DDP, main.py:171-173; DistributedSampler main.py:196-197). TPU-native
equivalent: a `jax.sharding.Mesh` with a `data` axis; the batch is sharded
along it, parameters/optimizer state are replicated, and gradient psums are
inserted by XLA automatically under jit — collectives ride ICI.

A `model` axis is part of the mesh layout from day one (size 1 in the
published recipes) so tensor-parallel sharding rules can land without
re-plumbing. `multihost` wires jax.distributed for multi-host pods.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(num_data: Optional[int] = None, num_model: int = 1,
              devices: Optional[Sequence] = None) -> Mesh:
    devices = list(devices if devices is not None else jax.devices())
    if num_data is None:
        num_data = len(devices) // num_model
    grid = np.asarray(devices[: num_data * num_model]).reshape(num_data, num_model)
    return Mesh(grid, ("data", "model"))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Leading batch dim sharded over `data`."""
    return NamedSharding(mesh, P("data"))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(mesh: Mesh, batch):
    sh = batch_sharding(mesh)
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, sh), batch)


def init_distributed(coordinator: Optional[str] = None,
                     num_processes: Optional[int] = None,
                     process_id: Optional[int] = None) -> None:
    """Multi-host init (replaces init_distributed_mode, util/misc.py:414-436).

    No-op when single-process; env:// style discovery is handled by
    jax.distributed.initialize itself (JAX_COORDINATOR_ADDRESS etc.).
    """
    if num_processes is not None and num_processes > 1:
        jax.distributed.initialize(coordinator_address=coordinator,
                                   num_processes=num_processes,
                                   process_id=process_id)
