"""Shared NN building blocks (flax.linen, batch-first).

TPU-native equivalents of the timm pieces the reference imports
(timm.models.vision_transformer.Mlp/PatchEmbed, timm.models.layers.DropPath,
see reference models/cait.py:9-11) — reimplemented, not ported: layouts are
(B, N, D), patch embedding is an MXU-friendly reshaped matmul instead of a
conv, and stochastic depth uses explicit JAX rngs.
"""

from __future__ import annotations

from typing import Callable, Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

Dtype = jnp.dtype

trunc_normal_init = nn.initializers.truncated_normal(stddev=0.02)


class Mlp(nn.Module):
    """Transformer FFN: Linear -> GELU -> drop -> Linear -> drop."""

    hidden_dim: int
    out_dim: Optional[int] = None
    dropout: float = 0.0
    act: Callable = nn.gelu
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, *, deterministic: bool = True):
        out_dim = self.out_dim or x.shape[-1]
        x = nn.Dense(self.hidden_dim, dtype=self.dtype, kernel_init=trunc_normal_init,
                     name="fc1")(x)
        x = self.act(x)
        x = nn.Dropout(self.dropout)(x, deterministic=deterministic)
        x = nn.Dense(out_dim, dtype=self.dtype, kernel_init=trunc_normal_init,
                     name="fc2")(x)
        x = nn.Dropout(self.dropout)(x, deterministic=deterministic)
        return x


class DropPath(nn.Module):
    """Stochastic depth per sample (reference uses timm DropPath)."""

    rate: float

    @nn.compact
    def __call__(self, x, *, deterministic: bool = True):
        if self.rate == 0.0 or deterministic:
            return x
        keep = 1.0 - self.rate
        rng = self.make_rng("dropout")
        shape = (x.shape[0],) + (1,) * (x.ndim - 1)
        mask = jax.random.bernoulli(rng, keep, shape)
        return jnp.where(mask, x / keep, 0.0)


class PatchEmbed(nn.Module):
    """Image -> patch tokens.

    The reference uses a Conv2d with stride=patch (PatchEmbedMine,
    cait.py:518-528). On TPU a stride=kernel conv is exactly a reshaped
    matmul, which maps straight onto the MXU; we implement it that way and
    the weight converter folds the conv kernel into the dense kernel.
    """

    patch_size: int
    embed_dim: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        # x: (B, H, W, 3)
        B, H, W, C = x.shape
        p = self.patch_size
        gh, gw = H // p, W // p
        x = x.reshape(B, gh, p, gw, p, C)
        x = x.transpose(0, 1, 3, 2, 4, 5).reshape(B, gh * gw, p * p * C)
        x = nn.Dense(self.embed_dim, dtype=self.dtype, name="proj")(x)
        return x  # (B, gh*gw, D)


def _cubic_resize_matrix(n_in: int, n_out: int, a: float = -0.75) -> "np.ndarray":
    """1D torch-bicubic interpolation as an (n_out, n_in) matrix.

    Torch F.interpolate(mode='bicubic', align_corners=False) semantics:
    half-pixel-center coordinate mapping, cubic convolution kernel with
    a=-0.75, border-replicated taps. (jax.image.resize 'cubic' uses the
    Keys a=-0.5 kernel, which does NOT match torch — measured 1e-2-level
    divergence on pos-embed grids.) Precomputing the map as a matrix makes
    the 2D resize two small matmuls: MXU-friendly and exactly reproducible.
    """
    import numpy as np

    def w(s):
        s = abs(s)
        if s <= 1:
            return (a + 2) * s ** 3 - (a + 3) * s ** 2 + 1
        if s < 2:
            return a * s ** 3 - 5 * a * s ** 2 + 8 * a * s - 4 * a
        return 0.0

    m = np.zeros((n_out, n_in), np.float32)
    scale = n_in / n_out
    for i in range(n_out):
        x = (i + 0.5) * scale - 0.5
        x0 = int(np.floor(x))
        for j in range(-1, 3):
            col = min(max(x0 + j, 0), n_in - 1)
            m[i, col] += w(x - (x0 + j))
    return m


def interpolate_pos_embed(pos_embed: jnp.ndarray, src_hw, dst_hw) -> jnp.ndarray:
    """Bicubic 2D re-interpolation of a (1, N, D) patch pos-embed grid.

    Equivalent of the reference's per-forward InterpolateInitPosEmbed
    (cait.py:744-759, torch bicubic align_corners=False), implemented as two
    precomputed separable matmuls (see _cubic_resize_matrix) so the result
    matches torch bit-for-bit up to f32 rounding and runs on the MXU instead
    of gather lanes.
    """
    sh, sw = src_hw
    dh, dw = dst_hw
    if (sh, sw) == (dh, dw):
        return pos_embed
    d = pos_embed.shape[-1]
    grid = pos_embed.reshape(sh, sw, d)
    mh = jnp.asarray(_cubic_resize_matrix(sh, dh))
    mw = jnp.asarray(_cubic_resize_matrix(sw, dw))
    grid = jnp.einsum("oh,hwd->owd", mh.astype(grid.dtype), grid)
    grid = jnp.einsum("ow,hwd->hod", mw.astype(grid.dtype), grid)
    return grid.reshape(1, dh * dw, d)
