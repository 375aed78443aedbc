"""Positional encodings (reference models/position_encoding.py).

The sine variant is a pure function in ops/embeds.py (used by the detector);
this module adds the learned variant (PositionEmbeddingLearned, :60-85) and
the `build_position_encoding` dispatch for API parity.
"""

from __future__ import annotations

import flax.linen as nn
import jax.numpy as jnp

from spe_tpu.ops.embeds import position_embedding_sine


class PositionEmbeddingLearned(nn.Module):
    """Learned 50x50 row/col embeddings (reference :60-85): output channel
    layout is [col_embed(x) ++ row_embed(y)]."""

    num_pos_feats: int = 128

    @nn.compact
    def __call__(self, shape_bhw):
        B, H, W = shape_bhw
        col = self.param("col_embed", nn.initializers.uniform(1.0),
                         (50, self.num_pos_feats), jnp.float32)
        row = self.param("row_embed", nn.initializers.uniform(1.0),
                         (50, self.num_pos_feats), jnp.float32)
        x_emb = col[:W]  # (W, F)
        y_emb = row[:H]  # (H, F)
        pos = jnp.concatenate([
            jnp.broadcast_to(x_emb[None, :, :], (H, W, self.num_pos_feats)),
            jnp.broadcast_to(y_emb[:, None, :], (H, W, self.num_pos_feats)),
        ], axis=-1)
        return jnp.broadcast_to(pos[None], (B, H, W, 2 * self.num_pos_feats))


def build_position_encoding(hidden_dim: int, kind: str = "sine"):
    """Returns a callable (mask_bhw or shape) -> (B, H, W, hidden_dim)."""
    n = hidden_dim // 2
    if kind in ("v2", "sine"):
        return lambda mask: position_embedding_sine(mask, num_pos_feats=n,
                                                    normalize=True)
    if kind in ("v3", "learned"):
        return PositionEmbeddingLearned(num_pos_feats=n)
    raise ValueError(f"not supported {kind}")
