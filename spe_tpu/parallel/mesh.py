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
    """Put a host-local batch onto the mesh's data axis.

    Single-process: plain device_put. Multi-process: each process's local
    batch is its shard of the global batch (the loader is process-sharded,
    the DistributedSampler replacement), assembled into one global array —
    device_put cannot target non-addressable devices.
    """
    sh = batch_sharding(mesh)
    if jax.process_count() > 1:
        return jax.tree_util.tree_map(
            lambda x: jax.make_array_from_process_local_data(sh, np.asarray(x)),
            batch)
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, sh), batch)


def init_distributed(world_size: int = 1, dist_url: str = "env://",
                     process_id: Optional[int] = None) -> None:
    """Multi-host init (replaces init_distributed_mode, util/misc.py:414-436).

    Must run before any other JAX backend use. No-op when world_size <= 1
    (the reference's single-process fallback, util/misc.py:422-425).

    dist_url 'env://' defers discovery to jax.distributed.initialize's own
    environment handling (JAX_COORDINATOR_ADDRESS / cloud-TPU metadata /
    SLURM). Any other value is the coordinator address ('host:port', with
    an optional tcp:// prefix for reference-flag compatibility); the process
    id then comes from `process_id` or, like the reference's env discovery
    (util/misc.py:417-421), the RANK / PROCESS_ID environment variables.
    """
    if world_size <= 1:
        return
    if dist_url == "env://":
        jax.distributed.initialize()
        return
    import os

    coordinator = dist_url.removeprefix("tcp://").removeprefix("grpc://")
    if process_id is None:
        for var in ("RANK", "PROCESS_ID", "JAX_PROCESS_ID"):
            if var in os.environ:
                process_id = int(os.environ[var])
                break
    if process_id is None:
        raise ValueError(
            "multi-process launch needs a process id: set RANK (like the "
            "reference's env:// discovery) or pass process_id")
    jax.distributed.initialize(coordinator_address=coordinator,
                               num_processes=world_size,
                               process_id=process_id)


def warmup_collectives() -> None:
    """Form the cross-process collective cliques while ranks are still
    aligned by the coordination-service init barrier.

    Gloo (the CPU-collectives backend used by the 2-process integration
    test; TPU pods use ICI and are unaffected) gives each rank only ~30s to
    join a communicator's rendezvous. Heavy jit compiles can skew ranks by
    more than that before the FIRST collective of a phase, so the driver
    calls this right after init and again right before the train loop."""
    if jax.process_count() <= 1:
        return
    from jax.experimental import multihost_utils

    multihost_utils.sync_global_devices("spe:warmup")      # device clique
    multihost_utils.process_allgather(np.zeros(1, np.float32))  # host clique


def coordination_barrier(name: str, timeout_s: int = 1800) -> None:
    """Align processes via the coordination SERVICE (long, configurable
    timeout) — unlike gloo collective rendezvous, which gives ~30s. Used
    around heavy compile phases so the first post-compile collective finds
    every rank within its window."""
    if jax.process_count() <= 1:
        return
    from jax._src import distributed

    client = distributed.global_state.client
    if client is not None:
        client.wait_at_barrier(name, timeout_in_ms=int(timeout_s * 1000))
