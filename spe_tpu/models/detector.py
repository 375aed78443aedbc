"""SPE detector: CaiT two-branch backbone + Conditional DETR with
refinement decoder passes (reference models/conditional_detr.py:33-124
`ConditionalDETR_Refine` + models/cait_backbone.py Joiner/Backbone).

Forward contract (per refine stage r in 0..num_refines):
  out[r] = {pred_logits (B,Q,K), pred_boxes (B,Q,4 sigmoid cxcywh),
            aux (L-1 stacked layer outputs)}, plus the backbone outputs
  (x_logits, x_cls_logits, cams_cls, x_patch) at the top level — matching
  the reference's `{stage: {..., **backbone_outputs}}` shape
  (conditional_detr.py:111).
"""

from __future__ import annotations

import math
from typing import Optional

import flax.linen as nn
import jax.numpy as jnp

from spe_tpu.models.cait import CaiTConfig, CaiTTwoBranch
from spe_tpu.models.transformer import MLP, ConditionalTransformer
from spe_tpu.ops.embeds import inverse_sigmoid, position_embedding_sine


class SPEDetector(nn.Module):
    backbone_cfg: CaiTConfig
    num_det_classes: int          # logit width: 21 VOC / 91 COCO
    num_queries: int = 300
    num_refines: int = 1
    enc_layers: int = 6
    dec_layers: int = 6
    dim_feedforward: int = 2048
    nheads: int = 8
    dropout: float = 0.1
    pre_norm: bool = False  # pre-norm encoder (reference --pre_norm)
    # --position_embedding: 'sine'/'v2' or 'learned'/'v3' (reference
    # models/position_encoding.py:88-97 build_position_encoding dispatch)
    position_embedding: str = "sine"
    use_pallas: bool = False  # fused attention kernels in encoder/cross-attn
    # whole-LAYER fused kernels for the encoder/decoder stack
    # (ops/pallas_encoder.py); takes precedence over use_pallas where it applies
    use_fused_layers: bool = False
    masks: bool = False   # attach the segmentation head (reference DETRsegm)
    # tensor parallelism: mesh whose 'model' axis head-shards the fused MHA
    # kernels via shard_map (ops/pallas_mha.fused_mha; cfg.tp_attention)
    tp_mesh: object = None
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, images, *, pad_mask: Optional[jnp.ndarray] = None,
                 deterministic: bool = True):
        """images: (B, H, W, 3); pad_mask: (B, H, W) True on padded pixels."""
        d_model = self.backbone_cfg.embed_dim  # hidden_dim := backbone dim
        backbone_out = CaiTTwoBranch(self.backbone_cfg, dtype=self.dtype,
                                     name="backbone")(images, deterministic=deterministic)
        feat = backbone_out["x_patch"]  # (B, gh, gw, D)
        B, gh, gw, _ = feat.shape

        if pad_mask is not None:
            # downsample image padding mask to the patch grid like
            # cait_backbone.py:92 (F.interpolate -> bool)
            import jax

            m = jax.image.resize(pad_mask.astype(jnp.float32)[..., None],
                                 (B, gh, gw, 1), "nearest")[..., 0]
            grid_mask = m > 0.5
        else:
            grid_mask = jnp.zeros((B, gh, gw), bool)

        if self.position_embedding in ("v3", "learned"):
            from spe_tpu.models.position_encoding import PositionEmbeddingLearned

            pos = PositionEmbeddingLearned(num_pos_feats=d_model // 2,
                                           name="pos_embed_learned")(
                (B, gh, gw))  # (B, gh, gw, D)
        elif self.position_embedding in ("v2", "sine"):
            pos = position_embedding_sine(grid_mask, num_pos_feats=d_model // 2,
                                          normalize=True)  # (B, gh, gw, D)
        else:
            raise ValueError(
                f"not supported {self.position_embedding}")  # :97

        src = feat.reshape(B, gh * gw, d_model)
        pos = pos.reshape(B, gh * gw, d_model).astype(src.dtype)
        key_padding = grid_mask.reshape(B, gh * gw)

        hs_all, ref_all = ConditionalTransformer(
            d_model=d_model, num_heads=self.nheads, num_queries=self.num_queries,
            num_encoder_layers=self.enc_layers, num_decoder_layers=self.dec_layers,
            dim_feedforward=self.dim_feedforward, dropout=self.dropout,
            num_refines=self.num_refines, normalize_before=self.pre_norm,
            use_pallas=self.use_pallas, use_fused_layers=self.use_fused_layers,
            tp_mesh=self.tp_mesh,
            dtype=self.dtype, name="transformer")(
            src, pos, key_padding_mask=key_padding, deterministic=deterministic)

        # per-stage heads; class bias initialized to the focal prior
        # (conditional_detr.py:58-61), bbox head last layer zero-init (:63-66)
        prior_bias = -math.log((1 - 0.01) / 0.01)
        out = {"backbone": {k: backbone_out[k] for k in
                            ("x_logits", "x_cls_logits", "cams_cls", "x_patch")}}
        stages = {}
        for r in range(self.num_refines + 1):
            hs = hs_all[r].astype(jnp.float32)      # (L, B, Q, D)
            ref = ref_all[r].astype(jnp.float32)    # (B, Q, 2)
            ref_before_sigmoid = inverse_sigmoid(ref)

            cls = nn.Dense(self.num_det_classes,
                           bias_init=nn.initializers.constant(prior_bias),
                           dtype=jnp.float32, name=f"class_embed_{r}")(hs)  # (L,B,Q,K)
            bbox_mlp = MLP(d_model, 4, 3, dtype=jnp.float32, final_zero_init=True,
                           name=f"bbox_embed_{r}")
            tmp = bbox_mlp(hs)
            tmp = tmp.at[..., :2].add(ref_before_sigmoid[None])
            coords = nn.sigmoid(tmp)  # (L, B, Q, 4)

            stages[r] = {
                "pred_logits": cls[-1],
                "pred_boxes": coords[-1],
                # aux outputs: all decoder layers but the last
                # (conditional_detr.py:118-124)
                "aux_pred_logits": cls[:-1],
                "aux_pred_boxes": coords[:-1],
            }
        out["stages"] = stages

        if self.masks:
            from spe_tpu.models.segmentation import SegmentationHead

            # stage-0 final decoder states over the patch feature grid
            hs0 = hs_all[0][-1].astype(jnp.float32)
            out["pred_masks"] = SegmentationHead(
                d_model, num_heads=self.nheads, dtype=jnp.float32,
                name="segm_head")(hs0, feat.astype(jnp.float32),
                                  pad_mask=key_padding)
        return out
