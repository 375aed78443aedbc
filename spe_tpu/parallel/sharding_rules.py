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


def check_tp_fused_compat(cfg, mesh: Mesh) -> None:
    """Validate TP x fused-Pallas-kernel combinations.

    The whole-block / whole-layer fused kernels (ops/pallas_block.py,
    ops/pallas_encoder.py, ops/pallas_decoder.py) consume raw
    param/activation arrays inside ONE pallas_call — GSPMD cannot partition
    through a Pallas kernel, so with the `model` axis >1 those kernels
    would silently force full re-gathers at best and miscompile at worst;
    they are refused with an actionable error (VERDICT r3 Next #5).

    The fused-MHA attention family (ops/pallas_mha.py: encoder self-attn,
    decoder conditional cross-attn) IS TP-capable since r5: with
    cfg.tp_attention the kernels run head-sharded over the model axis under
    shard_map (fused_mha tp_mesh=...), which states the partitioning the
    opaque pallas_call cannot express. use_pallas_attention is therefore
    allowed under TP iff tp_attention is set (the backbone talking-heads
    flavor head-mixes and auto-falls back to the GSPMD-partitioned einsum
    path — models/build.py).
    """
    if mesh.shape.get("model", 1) <= 1:
        return
    if cfg is None:
        raise ValueError(
            "a model mesh axis > 1 requires the SPEConfig to validate "
            "kernel-fusion compatibility — pass cfg to tp_param_shardings/"
            "check_tp_fused_compat")
    n_model = mesh.shape["model"]
    bad = [f for f in ("use_fused_block", "use_fused_layers")
           if getattr(cfg, f, False)]
    if getattr(cfg, "use_pallas_attention", False) and not getattr(
            cfg, "tp_attention", False):
        bad.append("use_pallas_attention")
    if bad:
        hint = (" — or set tp_attention=True (CLI: --tp_attention) to run "
                "the fused-MHA family head-sharded under shard_map"
                if "use_pallas_attention" in bad else "")
        raise ValueError(
            f"tensor parallelism (model mesh axis = {n_model}) "
            f"is not supported with fused Pallas kernels: {', '.join(bad)} "
            f"— set {', '.join(f + '=False' for f in bad)} (CLI: "
            f"{' '.join('--no_' + f for f in bad)}) or keep the model "
            f"axis at 1. The whole-block/whole-layer kernels consume whole "
            f"param arrays inside one pallas_call, which GSPMD cannot "
            f"partition{hint}.")
    if getattr(cfg, "tp_attention", False) and getattr(
            cfg, "nheads", 8) % n_model:
        raise ValueError(
            f"tp_attention head-shards the fused-MHA kernels: nheads "
            f"({cfg.nheads}) must be divisible by the model mesh axis "
            f"({n_model})")


def tp_param_shardings(params, mesh: Mesh, cfg):
    """Pytree of NamedShardings for the parameter tree.

    `cfg` (the SPEConfig) is REQUIRED: every TP entrypoint must validate that
    the config's kernel-fusion flags are compatible with the mesh (raises
    ValueError otherwise) — an optional check is a silent-miscompile trap."""
    check_tp_fused_compat(cfg, mesh)
    return jax.tree_util.tree_map_with_path(
        lambda path, leaf: NamedSharding(mesh, _spec_for(path, leaf)), params)
