"""Model factory (reference models/__init__.py:13 + conditional_detr.build
:733-802): config -> (model_def, criterion fns live in spe_tpu/train)."""

from __future__ import annotations

import dataclasses

import jax.numpy as jnp

from spe_tpu.config import SPEConfig
from spe_tpu.models.cait import build_cait_config
from spe_tpu.models.detector import SPEDetector


def build_model(cfg: SPEConfig, tp_mesh=None) -> SPEDetector:
    """tp_mesh: required when cfg.tp_attention — the mesh whose 'model' axis
    head-shards the fused-MHA kernels (encoder/decoder) via shard_map. The
    backbone's talking-heads attention head-MIXES (cait.py:344-393), so it
    cannot head-shard; under tp_attention it runs the XLA einsum path and
    GSPMD partitions its projections/mixes itself."""
    tp = bool(cfg.tp_attention)
    if tp and tp_mesh is None:
        raise ValueError("cfg.tp_attention requires build_model(cfg, "
                         "tp_mesh=mesh) — the shard_map'd kernels need the "
                         "concrete mesh at trace time")
    backbone_cfg = build_cait_config(
        cfg.backbone,
        num_classes=cfg.num_classes,
        layer_to_det=cfg.layer_to_det,
        drop_rate=cfg.backbone_drop_rate,
        attn_drop_rate=cfg.drop_attn_rate,
        drop_path_rate=cfg.drop_path_rate,
        # tp_attention redirects the backbone to the XLA einsum path by
        # DESIGN (talking-heads mixes across heads — not head-shardable);
        # fused_block/fused_layers misconfigurations are NOT silently fixed
        # here: parallel/sharding_rules.check_tp_fused_compat refuses them
        # at every TP entrypoint with an actionable error.
        use_pallas=cfg.use_pallas_attention and not tp,
        use_fused_block=cfg.use_fused_block,
        use_fused_ca=(False if tp else
                      {"auto": None, "on": True, "off": False}[cfg.use_fused_ca_block]),
        remat=cfg.remat,
    )
    if cfg.init_scale:
        backbone_cfg = dataclasses.replace(backbone_cfg,
                                           init_scale=cfg.init_scale)
    dtype = jnp.bfloat16 if cfg.compute_dtype == "bfloat16" else jnp.float32
    return SPEDetector(
        backbone_cfg=backbone_cfg,
        num_det_classes=cfg.num_det_classes,
        num_queries=cfg.num_queries,
        num_refines=cfg.num_refines,
        enc_layers=cfg.enc_layers,
        dec_layers=cfg.dec_layers,
        dim_feedforward=cfg.dim_feedforward,
        nheads=cfg.nheads,
        dropout=cfg.dropout,
        pre_norm=cfg.pre_norm,
        position_embedding=cfg.position_embedding,
        use_pallas=cfg.use_pallas_attention,
        use_fused_layers=cfg.use_fused_layers,
        masks=cfg.masks,
        tp_mesh=tp_mesh if tp else None,
        dtype=dtype,
    )
