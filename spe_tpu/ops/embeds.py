"""Sinusoidal positional embeddings.

TPU-native rewrites of:
  * gen_sineembed_for_position (reference models/transformer.py:35-49) —
    sine embedding of normalized (x, y) reference points. Note the reference
    hardcodes the 128 divisor in `dim_t` regardless of d_model
    (transformer.py:41); we reproduce that exactly for checkpoint parity.
  * PositionEmbeddingSine (reference models/position_encoding.py:21-57) —
    2D image positional encoding from a padding mask via cumsum.

All functions are batch-first: (B, N, ...) instead of the reference's
sequence-first (N, B, ...).
"""

from __future__ import annotations

import math

import jax.numpy as jnp


def _interleave_sin_cos(x: jnp.ndarray) -> jnp.ndarray:
    """stack(sin(x[..., 0::2]), cos(x[..., 1::2])) flattened, torch-style."""
    sin = jnp.sin(x[..., 0::2])
    cos = jnp.cos(x[..., 1::2])
    return jnp.stack([sin, cos], axis=-1).reshape(*x.shape[:-1], -1)


def gen_sineembed_for_position(pos: jnp.ndarray, d_model: int = 256) -> jnp.ndarray:
    """Sine embedding of (x, y) in [0,1]: (..., 2) -> (..., d_model).

    Matches reference transformer.py:35-49 including the hardcoded /128
    exponent denominator.
    """
    n_steps = d_model // 2
    scale = 2 * math.pi
    dim_t = jnp.arange(n_steps, dtype=jnp.float32)
    dim_t = 10000.0 ** (2 * (dim_t // 2) / 128.0)
    x_embed = pos[..., 0] * scale
    y_embed = pos[..., 1] * scale
    pos_x = x_embed[..., None] / dim_t
    pos_y = y_embed[..., None] / dim_t
    pos_x = _interleave_sin_cos(pos_x)
    pos_y = _interleave_sin_cos(pos_y)
    return jnp.concatenate([pos_y, pos_x], axis=-1)


def position_embedding_sine(
    mask: jnp.ndarray,
    num_pos_feats: int = 64,
    temperature: float = 10000.0,
    normalize: bool = True,
    scale: float | None = None,
) -> jnp.ndarray:
    """2D sine position embedding from padding mask.

    Args:
      mask: (B, H, W) bool, True on PADDED cells (reference NestedTensor mask
        convention, util/misc.py:282-336).
    Returns:
      (B, H, W, 2*num_pos_feats) float32 (batch-last-channel; the reference
      returns (B, C, H, W), position_encoding.py:56).
    """
    if scale is None:
        scale = 2 * math.pi
    not_mask = (~mask).astype(jnp.float32)
    y_embed = jnp.cumsum(not_mask, axis=1)
    x_embed = jnp.cumsum(not_mask, axis=2)
    if normalize:
        eps = 1e-6
        y_embed = y_embed / (y_embed[:, -1:, :] + eps) * scale
        x_embed = x_embed / (x_embed[:, :, -1:] + eps) * scale

    dim_t = jnp.arange(num_pos_feats, dtype=jnp.float32)
    dim_t = temperature ** (2 * (dim_t // 2) / num_pos_feats)

    pos_x = x_embed[..., None] / dim_t
    pos_y = y_embed[..., None] / dim_t
    pos_x = _interleave_sin_cos(pos_x)
    pos_y = _interleave_sin_cos(pos_y)
    return jnp.concatenate([pos_y, pos_x], axis=-1)


def inverse_sigmoid(x: jnp.ndarray, eps: float = 1e-5) -> jnp.ndarray:
    """logit with clamping (reference util/misc.py:475-481)."""
    x = jnp.clip(x, 0.0, 1.0)
    x1 = jnp.clip(x, eps, None)
    x2 = jnp.clip(1 - x, eps, None)
    return jnp.log(x1 / x2)
