"""Attention flavors used across the SPE stack (flax.linen, batch-first).

Three distinct attention mechanisms from the reference, rebuilt TPU-first
(einsum formulations that fuse into MXU matmuls; optional Pallas kernels
plug in behind the same signatures):

  * TalkingHeadsAttention — CaiT patch blocks: head-mixing linears before
    and after softmax (reference models/cait.py:344-393).
  * MultiClassAttention — class-attention where only the class tokens act
    as queries over [class tokens ++ patches]; exposes the softmax
    attention map, which IS the CAM signal (reference cait.py:91-139).
  * ConditionalCrossAttention support lives in models/transformer.py: the
    decoder concatenates content and spatial halves per head so attention
    runs at 2*head_dim (reference models/transformer.py:386-419 with the
    projection-free MultiheadAttention of models/attention.py).

All masks follow the NestedTensor convention: True = padded/invalid key.
"""

from __future__ import annotations

from typing import Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

from spe_tpu.models.layers import trunc_normal_init

_NEG = -1e9


def scaled_dot_attention(q, k, v, *, mask: Optional[jnp.ndarray] = None,
                         already_scaled: bool = False):
    """q: (B, H, Nq, Dh), k/v: (B, H, Nk, Dh); mask (B, Nk) True=pad."""
    if not already_scaled:
        q = q / jnp.sqrt(q.shape[-1]).astype(q.dtype)
    logits = jnp.einsum("bhqd,bhkd->bhqk", q, k)
    if mask is not None:
        logits = jnp.where(mask[:, None, None, :], _NEG, logits)
    attn = jax.nn.softmax(logits.astype(jnp.float32), axis=-1).astype(q.dtype)
    out = jnp.einsum("bhqk,bhkd->bhqd", attn, v)
    return out, attn


def _split_heads(x, num_heads):
    B, N, D = x.shape
    return x.reshape(B, N, num_heads, D // num_heads).transpose(0, 2, 1, 3)


def _merge_heads(x):
    B, H, N, Dh = x.shape
    return x.transpose(0, 2, 1, 3).reshape(B, N, H * Dh)


class TalkingHeadsAttention(nn.Module):
    """CaiT talking-heads self-attention (reference cait.py:344-393).

    attn_logits -> proj_l (head mixing) -> softmax -> proj_w (head mixing)
    -> attn_drop -> @v. Note the reference scales q BEFORE the logits
    (cait.py:377), which we match.
    """

    num_heads: int
    attn_drop: float = 0.0
    proj_drop: float = 0.0
    qkv_bias: bool = True
    use_pallas: bool = False  # fused kernel on the deterministic path
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, *, deterministic: bool = True):
        B, N, D = x.shape
        qkv = nn.Dense(3 * D, use_bias=self.qkv_bias, dtype=self.dtype,
                       kernel_init=trunc_normal_init, name="qkv")(x)
        q, k, v = jnp.split(qkv, 3, axis=-1)

        wl = self.param("proj_l", nn.initializers.truncated_normal(0.02),
                        (self.num_heads, self.num_heads), jnp.float32)
        bl = self.param("proj_l_bias", nn.initializers.zeros, (self.num_heads,), jnp.float32)
        ww = self.param("proj_w", nn.initializers.truncated_normal(0.02),
                        (self.num_heads, self.num_heads), jnp.float32)
        bw = self.param("proj_w_bias", nn.initializers.zeros, (self.num_heads,), jnp.float32)

        if self.use_pallas:
            # fused VMEM-resident kernel with custom-VJP backward; attention
            # dropout runs in-kernel via the TPU PRNG (same seed + tiling
            # regenerate the identical mask in the backward kernel).
            # Interpret mode on non-TPU backends keeps the path testable.
            from spe_tpu.ops.pallas_attention_bwd import fused_talking_heads

            interpret = jax.default_backend() not in ("tpu", "axon")
            # q_tile must match between fwd and bwd (dropout mask identity);
            # prefer the largest dividing tile — fewer grid steps amortize
            # the resident K/V better, and the (batch, tile) bwd grid keeps
            # VMEM bounded at any tile choice
            q_tile = next((t for t in (512, 256, 128) if N % t == 0), N)
            rate = 0.0 if deterministic else float(self.attn_drop)
            if rate > 0.0:
                key = self.make_rng("dropout")
                seed = jax.random.randint(key, (1,), 0, 2**31 - 1).astype(jnp.float32)
            else:
                seed = None
            out = fused_talking_heads(
                _split_heads(q, self.num_heads), _split_heads(k, self.num_heads),
                _split_heads(v, self.num_heads), wl, bl, ww, bw, seed,
                q_tile, interpret, rate)
            out = _merge_heads(out)
            out = nn.Dense(D, dtype=self.dtype, kernel_init=trunc_normal_init,
                           name="proj")(out)
            return nn.Dropout(self.proj_drop)(out, deterministic=deterministic)

        q = _split_heads(q, self.num_heads) * (D // self.num_heads) ** -0.5
        k = _split_heads(k, self.num_heads)
        v = _split_heads(v, self.num_heads)

        logits = jnp.einsum("bhqd,bhkd->bhqk", q, k)
        # talking heads: mix across the head dimension (einsum keeps it fused)
        logits = jnp.einsum("bhqk,hg->bgqk", logits, wl.astype(logits.dtype))
        logits = logits + bl.astype(logits.dtype)[None, :, None, None]

        attn = jax.nn.softmax(logits.astype(jnp.float32), axis=-1).astype(x.dtype)

        attn2 = jnp.einsum("bhqk,hg->bgqk", attn, ww.astype(attn.dtype))
        attn2 = attn2 + bw.astype(attn2.dtype)[None, :, None, None]
        attn2 = nn.Dropout(self.attn_drop)(attn2, deterministic=deterministic)

        out = jnp.einsum("bhqk,bhkd->bhqd", attn2, v)
        out = _merge_heads(out)
        out = nn.Dense(D, dtype=self.dtype, kernel_init=trunc_normal_init, name="proj")(out)
        out = nn.Dropout(self.proj_drop)(out, deterministic=deterministic)
        return out


def _use_interpret() -> bool:
    return jax.default_backend() not in ("tpu", "axon")


class MultiClassAttention(nn.Module):
    """Class attention with `num_tokens` query tokens over the full sequence
    (reference Multi_Class_Attention, cait.py:91-139).

    Returns (out, attn): attn is (B, H, num_tokens, N) — the CAM source.
    use_pallas routes through the fused kernel (ops/pallas_mha.py) which
    emits the attention map as a second kernel output.
    """

    num_heads: int
    num_tokens: int
    attn_drop: float = 0.0
    proj_drop: float = 0.0
    qkv_bias: bool = True
    use_pallas: bool = False
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, *, deterministic: bool = True):
        B, N, D = x.shape
        t = self.num_tokens
        q = nn.Dense(D, use_bias=self.qkv_bias, dtype=self.dtype,
                     kernel_init=trunc_normal_init, name="q")(x[:, :t])
        k = nn.Dense(D, use_bias=self.qkv_bias, dtype=self.dtype,
                     kernel_init=trunc_normal_init, name="k")(x)
        v = nn.Dense(D, use_bias=self.qkv_bias, dtype=self.dtype,
                     kernel_init=trunc_normal_init, name="v")(x)
        if self.use_pallas:
            from spe_tpu.ops.pallas_mha import fused_mha

            out, attn = fused_mha(_split_heads(q, self.num_heads),
                                  _split_heads(k, self.num_heads),
                                  _split_heads(v, self.num_heads),
                                  interpret=_use_interpret(), return_attn=True)
            out = out.astype(x.dtype)
        else:
            qh = _split_heads(q, self.num_heads) * (D // self.num_heads) ** -0.5
            out, attn = scaled_dot_attention(qh, _split_heads(k, self.num_heads),
                                             _split_heads(v, self.num_heads),
                                             already_scaled=True)
        out = _merge_heads(out)
        out = nn.Dense(D, dtype=self.dtype, kernel_init=trunc_normal_init, name="proj")(out)
        out = nn.Dropout(self.proj_drop)(out, deterministic=deterministic)
        return out, attn


class MultiheadAttention(nn.Module):
    """Standard MHA with in/out projections (encoder self-attention;
    reference uses nn.MultiheadAttention at transformer.py:258).
    use_pallas fuses logits/softmax/dropout/@V into one VMEM-resident kernel
    (attention dropout then runs in-kernel via the TPU PRNG).

    kv_shard_axis: name of a mesh axis the keys/values are sharded over
    (sequence parallelism for >2k-token configs, SURVEY §5.7). Only valid
    under shard_map; routes through ops/seq_parallel.kv_sharded_attention
    and takes precedence over use_pallas (the fused kernel assumes the full
    key rows are chip-local)."""

    num_heads: int
    dropout: float = 0.0
    use_pallas: bool = False
    kv_shard_axis: Optional[str] = None
    # tensor parallelism: a Mesh whose 'model' axis splits the HEAD dim of
    # the fused kernel via shard_map (ops/pallas_mha.fused_mha tp_mesh)
    tp_mesh: Optional[object] = None
    dtype: jnp.dtype = jnp.float32

    def _kernel_seed(self, deterministic):
        rate = 0.0 if deterministic else float(self.dropout)
        if rate > 0.0:
            key = self.make_rng("dropout")
            return jax.random.randint(key, (1,), 0, 2**31 - 1).astype(jnp.float32), rate
        return None, 0.0

    @nn.compact
    def __call__(self, query, key, value, *, key_padding_mask=None,
                 deterministic: bool = True):
        D = query.shape[-1]
        q = nn.Dense(D, dtype=self.dtype, name="q_proj")(query)
        k = nn.Dense(D, dtype=self.dtype, name="k_proj")(key)
        v = nn.Dense(D, dtype=self.dtype, name="v_proj")(value)
        if self.kv_shard_axis is not None:
            from spe_tpu.ops.seq_parallel import kv_sharded_attention

            # the sharded-KV path applies no attention dropout (the merged
            # softmax spans chips; a per-chip mask would change semantics).
            # Refuse rather than silently alter the training recipe.
            if self.dropout > 0.0 and not deterministic:
                raise ValueError(
                    "kv_shard_axis does not support attention dropout "
                    f"(dropout={self.dropout}); set dropout=0 for "
                    "sequence-parallel training")
            out = kv_sharded_attention(
                _split_heads(q, self.num_heads), _split_heads(k, self.num_heads),
                _split_heads(v, self.num_heads), axis_name=self.kv_shard_axis,
                key_padding_mask_local=key_padding_mask)
        elif self.use_pallas:
            from spe_tpu.ops.pallas_mha import fused_mha

            seed, rate = self._kernel_seed(deterministic)
            out = fused_mha(_split_heads(q, self.num_heads),
                            _split_heads(k, self.num_heads),
                            _split_heads(v, self.num_heads),
                            key_padding_mask=key_padding_mask, seed=seed,
                            dropout_rate=rate, interpret=_use_interpret(),
                            tp_mesh=self.tp_mesh)
            out = out.astype(q.dtype)
        else:
            qh = _split_heads(q, self.num_heads) / jnp.sqrt(
                D // self.num_heads).astype(q.dtype)
            kh = _split_heads(k, self.num_heads)
            vh = _split_heads(v, self.num_heads)
            logits = jnp.einsum("bhqd,bhkd->bhqk", qh, kh)
            if key_padding_mask is not None:
                logits = jnp.where(key_padding_mask[:, None, None, :], _NEG, logits)
            attn = jax.nn.softmax(logits.astype(jnp.float32), axis=-1).astype(q.dtype)
            # dropout on attention weights, like torch MultiheadAttention
            attn = nn.Dropout(self.dropout)(attn, deterministic=deterministic)
            out = jnp.einsum("bhqk,bhkd->bhqd", attn, vh)
        out = _merge_heads(out)
        out = nn.Dense(D, dtype=self.dtype, name="out_proj")(out)
        return out


class ProjectionFreeAttention(nn.Module):
    """Attention WITHOUT input projections — the caller pre-projects q/k/v
    (reference models/attention.py:55-175: its fork of nn.MultiheadAttention
    strips in-projections so the decoder can build q/k by concatenating
    content and positional halves). q/k may have a different feature dim
    than v (the conditional cross-attention runs q/k at 2*d_model).
    """

    num_heads: int
    dropout: float = 0.0
    use_pallas: bool = False
    tp_mesh: Optional[object] = None  # head-sharded kernel TP (see MultiheadAttention)
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, q, k, v, *, key_padding_mask=None, deterministic: bool = True):
        Dv = v.shape[-1]
        Dq = q.shape[-1]
        if self.use_pallas:
            from spe_tpu.ops.pallas_mha import fused_mha

            rate = 0.0 if deterministic else float(self.dropout)
            seed = None
            if rate > 0.0:
                key = self.make_rng("dropout")
                seed = jax.random.randint(key, (1,), 0, 2**31 - 1).astype(jnp.float32)
            out = fused_mha(_split_heads(q, self.num_heads),
                            _split_heads(k, self.num_heads),
                            _split_heads(v, self.num_heads),
                            key_padding_mask=key_padding_mask, seed=seed,
                            dropout_rate=rate, interpret=_use_interpret(),
                            tp_mesh=self.tp_mesh)
            out = out.astype(q.dtype)
        else:
            qh = _split_heads(q, self.num_heads) / jnp.sqrt(
                Dq // self.num_heads).astype(q.dtype)
            kh = _split_heads(k, self.num_heads)
            vh = _split_heads(v, self.num_heads)
            logits = jnp.einsum("bhqd,bhkd->bhqk", qh, kh)
            if key_padding_mask is not None:
                logits = jnp.where(key_padding_mask[:, None, None, :], _NEG, logits)
            attn = jax.nn.softmax(logits.astype(jnp.float32), axis=-1).astype(q.dtype)
            attn = nn.Dropout(self.dropout)(attn, deterministic=deterministic)
            out = jnp.einsum("bhqk,bhkd->bhqd", attn, vh)
        out = _merge_heads(out)
        out = nn.Dense(Dv, dtype=self.dtype, name="out_proj")(out)
        return out
