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


# ---------------------------------------------------------------------------
# Panoptic postprocessing (reference PostProcessPanoptic,
# models/segmentation.py:249-371)
# ---------------------------------------------------------------------------

def id2rgb(id_map: "np.ndarray"):
    """Panoptic id -> RGB encoding (id = R + 256*G + 256^2*B)."""
    import numpy as np

    rgb = np.zeros(id_map.shape + (3,), np.uint8)
    rgb[..., 0] = id_map % 256
    rgb[..., 1] = (id_map // 256) % 256
    rgb[..., 2] = id_map // (256 ** 2)
    return rgb


def postprocess_panoptic(logits, mask_logits, is_thing_map,
                         processed_size, target_size=None,
                         threshold: float = 0.85, min_area: int = 4):
    """One image's panoptic prediction from per-query class logits (Q, K)
    and mask logits (Q, h, w). Mirrors the reference semantics:

      * queries kept when softmax-max class != no-object (column K-1) and
        score > threshold (segmentation.py:292-297);
      * per-pixel assignment = argmax over kept queries' mask logits after a
        softmax across queries (:313-321);
      * masks of the SAME stuff class are merged into one segment (:324-329);
      * segments with area <= min_area are deleted and the pixel assignment
        recomputed until stable (:345-357).

    Deviation: segment ids start at 1 so 0 stays the VOID id expected by
    data/panoptic_eval.py (the reference emits 0-based ids and has no void).

    Returns {"id_map" (H, W) int32, "segments_info": [...], "png_string"}.
    Host-side numpy: eval-only, like the reference's CPU loop (SURVEY §2.3
    classifies eval postprocessing as acceptable host work).
    """
    import numpy as np

    logits = np.asarray(logits, np.float32)
    masks = np.asarray(mask_logits, np.float32)
    K = logits.shape[-1]
    e = np.exp(logits - logits.max(-1, keepdims=True))
    prob = e / e.sum(-1, keepdims=True)
    scores = prob.max(-1)
    classes = prob.argmax(-1)
    keep = (classes != K - 1) & (scores > threshold)

    scores, classes, masks = scores[keep], classes[keep], masks[keep]
    h, w = processed_size
    if masks.shape[0]:
        # resize mask logits to the processed size (bilinear like F.interpolate)
        masks = np.asarray(jax.image.resize(
            jnp.asarray(masks), (masks.shape[0], h, w), "bilinear"))

    target_size = target_size or processed_size

    def assign(masks_):
        """Per-pixel argmax over the query-axis softmax, at target size."""
        if masks_.shape[0] == 0:
            return np.zeros(tuple(target_size), np.int32)
        m = masks_ - masks_.max(0, keepdims=True)
        soft = np.exp(m) / np.exp(m).sum(0, keepdims=True)
        m_id = soft.argmax(0).astype(np.int32)
        # stuff dedup: same-class stuff masks merge into the first index
        first_of_stuff = {}
        for k, c in enumerate(classes_cur):
            if not is_thing_map.get(int(c), True):
                if int(c) in first_of_stuff:
                    m_id[m_id == k] = first_of_stuff[int(c)]
                else:
                    first_of_stuff[int(c)] = k
        th, tw = target_size
        if (th, tw) != m_id.shape:
            # nearest resize to the requested output size (reference :334-336)
            yi = (np.arange(th) * m_id.shape[0] / th).astype(np.int64)
            xi = (np.arange(tw) * m_id.shape[1] / tw).astype(np.int64)
            m_id = m_id[yi][:, xi]
        return m_id

    classes_cur, scores_cur, masks_cur = classes, scores, masks
    while True:
        m_id = assign(masks_cur)
        areas = np.array([(m_id == i).sum() for i in range(len(classes_cur))])
        small = areas <= min_area
        if len(classes_cur) == 0 or not small.any():
            break
        classes_cur = classes_cur[~small]
        scores_cur = scores_cur[~small]
        masks_cur = masks_cur[~small]

    # renumber ids to 1..N (0 = void)
    id_map = np.zeros(m_id.shape, np.int32)
    segments_info = []
    for new_id, k in enumerate(
            [i for i in range(len(classes_cur)) if (m_id == i).any()], start=1):
        id_map[m_id == k] = new_id
        cat = int(classes_cur[k])
        segments_info.append({"id": new_id, "isthing": bool(
            is_thing_map.get(cat, True)), "category_id": cat,
            "area": int((m_id == k).sum())})

    import io

    from PIL import Image

    buf = io.BytesIO()
    Image.fromarray(id2rgb(id_map)).save(buf, format="PNG")
    return {"id_map": id_map, "segments_info": segments_info,
            "png_string": buf.getvalue()}
