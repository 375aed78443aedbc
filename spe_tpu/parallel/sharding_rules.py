"""Parameter sharding rules for the `model` mesh axis (tensor parallelism).

The published SPE configs are small enough for pure DP, but the mesh carries
a `model` axis from day one (parallel/mesh.py). These rules shard the
weight matrices that dominate memory/compute — MLP fc1/fc2, attention
qkv/proj, FFN linear1/linear2 — column-/row-wise over `model`, and leave
everything else replicated. Under jit, GSPMD propagates the shardings and
inserts the reduce-scatter/all-gather collectives over ICI.

Usage:
    rules = tp_param_shardings(params, mesh)
    params = jax.device_put(params, rules)
    fn = jax.jit(model.apply, in_shardings=(rules, batch_sharding(mesh)))
"""

from __future__ import annotations

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

# (path-suffix, param-name) -> partition spec builder for 2D kernels.
# Column-parallel (shard output features) for up-projections, row-parallel
# (shard input features) for down-projections, like Megatron. The decoder's
# conditional-attention projections (reference transformer.py:313-427) are
# all up-projections into the per-head q/k/v space -> column-parallel; their
# out_proj closes the attention block -> row-parallel.
_COL_PARALLEL = {"fc1", "linear1", "qkv", "q", "k", "v", "q_proj", "k_proj",
                 "v_proj", "q_linear", "k_linear",
                 # decoder self-attention projections
                 "sa_qcontent_proj", "sa_qpos_proj", "sa_kcontent_proj",
                 "sa_kpos_proj", "sa_v_proj",
                 # conditional cross-attention projections (2*d_model q/k)
                 "ca_qcontent_proj", "ca_kcontent_proj", "ca_kpos_proj",
                 "ca_v_proj", "ca_qpos_proj", "ca_qpos_sine_proj"}
_ROW_PARALLEL = {"fc2", "linear2", "proj", "out_proj"}


def _spec_for(path, leaf) -> P:
    names = [str(getattr(p, "key", p)) for p in path]
    if getattr(leaf, "ndim", 0) != 2 or "kernel" not in names[-1:]:
        return P()  # scalars / python ints (e.g. TrainState.bad_steps) replicate
    parent = names[-2] if len(names) >= 2 else ""
    if parent in _COL_PARALLEL:
        return P(None, "model")
    if parent in _ROW_PARALLEL:
        return P("model", None)
    return P()


def tp_param_shardings(params, mesh: Mesh):
    """Pytree of NamedShardings for the parameter tree."""
    return jax.tree_util.tree_map_with_path(
        lambda path, leaf: NamedSharding(mesh, _spec_for(path, leaf)), params)
