"""Segmentation head (optional `--masks` path).

Rebuild of reference models/segmentation.py:33-200 (DETRsegm +
MHAttentionMap + MaskHeadSmallConv): per-query multi-head attention maps
over the encoder feature grid, concatenated with projected features, run
through a small conv stack with progressive upsampling into per-query masks.

Deviation (documented): the reference's mask head takes FPN lateral inputs
from ResNet stages — the CaiT backbone is single-scale, so the conv stack
upsamples from the patch grid without laterals. The published recipes never
enable --masks; this preserves the API and training path.
"""

from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp


class MHAttentionMap(nn.Module):
    """Per-query attention heatmaps (reference segmentation.py MHAttentionMap):
    q from decoder states, k from the feature grid; softmax over positions.
    Returns (B, Q, heads, h, w)."""

    hidden_dim: int
    num_heads: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, q, feat, *, pad_mask=None):
        # q: (B, Q, D); feat: (B, h, w, D)
        B, Q, D = q.shape
        h, w = feat.shape[1:3]
        nh = self.num_heads
        dh = self.hidden_dim // nh
        qh = nn.Dense(self.hidden_dim, dtype=self.dtype, name="q_linear")(q)
        kh = nn.Dense(self.hidden_dim, dtype=self.dtype, name="k_linear")(feat)
        qh = qh.reshape(B, Q, nh, dh)
        kh = kh.reshape(B, h * w, nh, dh)
        logits = jnp.einsum("bqnd,bpnd->bqnp", qh, kh) / jnp.sqrt(dh).astype(qh.dtype)
        if pad_mask is not None:
            logits = jnp.where(pad_mask.reshape(B, 1, 1, h * w), -1e9, logits)
        attn = jax.nn.softmax(logits.astype(jnp.float32), axis=-1)
        return attn.reshape(B, Q, nh, h, w).astype(q.dtype)


class MaskHead(nn.Module):
    """Conv stack with progressive 2x upsampling (MaskHeadSmallConv without
    the ResNet FPN laterals)."""

    hidden_dim: int
    num_heads: int
    num_upsamples: int = 2
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, feat, attn_maps):
        """feat: (B, h, w, D); attn_maps: (B, Q, heads, h, w) ->
        masks (B, Q, h*2^u, w*2^u)."""
        B, Q = attn_maps.shape[:2]
        h, w = feat.shape[1:3]
        fproj = nn.Dense(self.hidden_dim, dtype=self.dtype, name="feat_proj")(feat)
        # expand features per query and concat the attention channels
        x = jnp.broadcast_to(fproj[:, None], (B, Q, h, w, self.hidden_dim))
        a = attn_maps.transpose(0, 1, 3, 4, 2)  # (B, Q, h, w, heads)
        x = jnp.concatenate([x, a.astype(x.dtype)], axis=-1)
        x = x.reshape(B * Q, h, w, self.hidden_dim + self.num_heads)

        dims = [self.hidden_dim, self.hidden_dim // 2, self.hidden_dim // 4,
                self.hidden_dim // 8]
        for i in range(self.num_upsamples + 1):
            d = dims[min(i, len(dims) - 1)]
            x = nn.Conv(d, (3, 3), padding="SAME", dtype=self.dtype,
                        name=f"conv_{i}")(x)
            x = nn.GroupNorm(num_groups=min(8, d), dtype=self.dtype,
                             name=f"gn_{i}")(x)
            x = nn.relu(x)
            if i < self.num_upsamples:
                hh, ww = x.shape[1:3]
                x = jax.image.resize(x, (x.shape[0], hh * 2, ww * 2, x.shape[3]),
                                     "nearest")
        x = nn.Conv(1, (3, 3), padding="SAME", dtype=self.dtype, name="out")(x)
        oh, ow = x.shape[1:3]
        return x.reshape(B, Q, oh, ow).astype(jnp.float32)


class SegmentationHead(nn.Module):
    """MHAttentionMap + MaskHead, applied to stage-0 decoder states."""

    hidden_dim: int
    num_heads: int = 8
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, hs, feat, *, pad_mask=None):
        attn = MHAttentionMap(self.hidden_dim, self.num_heads, dtype=self.dtype,
                              name="bbox_attention")(hs, feat, pad_mask=pad_mask)
        return MaskHead(self.hidden_dim, self.num_heads, dtype=self.dtype,
                        name="mask_head")(feat, attn)


def postprocess_segm(mask_logits: jnp.ndarray, keep_q: jnp.ndarray,
                     out_hw, threshold: float = 0.5):
    """Resize per-query mask logits to out_hw and threshold (reference
    PostProcessSegm)."""
    B, Q = mask_logits.shape[:2]
    sel = jnp.take_along_axis(mask_logits, keep_q[:, :, None, None], axis=1)
    sel = jax.image.resize(sel, (B, sel.shape[1]) + tuple(out_hw), "bilinear")
    return jax.nn.sigmoid(sel) > threshold
