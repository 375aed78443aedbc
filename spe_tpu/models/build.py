"""Model factory (reference models/__init__.py:13 + conditional_detr.build
:733-802): config -> (model_def, criterion fns live in spe_tpu/train)."""

from __future__ import annotations

import dataclasses

import jax.numpy as jnp

from spe_tpu.config import SPEConfig
from spe_tpu.models.cait import build_cait_config
from spe_tpu.models.detector import SPEDetector


def build_model(cfg: SPEConfig) -> SPEDetector:
    backbone_cfg = build_cait_config(
        cfg.backbone,
        num_classes=cfg.num_classes,
        layer_to_det=cfg.layer_to_det,
        drop_rate=cfg.backbone_drop_rate,
        attn_drop_rate=cfg.drop_attn_rate,
        drop_path_rate=cfg.drop_path_rate,
        use_pallas=cfg.use_pallas_attention,
        use_fused_block=cfg.use_fused_block,
        use_fused_ca={"auto": None, "on": True, "off": False}[cfg.use_fused_ca_block],
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
        dtype=dtype,
    )
