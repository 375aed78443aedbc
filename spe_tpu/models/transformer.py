"""Conditional DETR transformer (flax.linen, batch-first).

Rebuild of reference models/transformer.py (encoder :253-310, conditional
decoder layer :313-466, decoder :192-250, Transformer.forward_refine
:122-160): one encoder pass over the patch sequence, then the SAME decoder
run once per query-embedding set (base + each refinement set) over shared
encoder memory.

Conditional cross-attention (the core trick, transformer.py:386-419): at
each decoder layer queries/keys are formed by concatenating a content half
and a spatial half PER HEAD, so attention logits run at 2*d_model with
head_dim doubled; values stay at d_model. The spatial half of q is
sine(reference_point) scaled by an MLP of the decoder state (except layer 0
where the transformation is identity, transformer.py:222-226).
"""

from __future__ import annotations

import flax.linen as nn
import jax.numpy as jnp

from spe_tpu.models.attention import MultiheadAttention, ProjectionFreeAttention
from spe_tpu.models.cait import _LNShell
from spe_tpu.ops.embeds import gen_sineembed_for_position


class _DShell(nn.Module):
    """Declares nn.Dense-shaped params (lecun_normal kernel, zero bias)
    without executing — the fused layer kernels consume the raw arrays;
    param paths and init streams stay identical to the unfused tree."""

    fin: int
    fout: int

    @nn.compact
    def __call__(self):
        k = self.param("kernel", nn.initializers.lecun_normal(),
                       (self.fin, self.fout), jnp.float32)
        b = self.param("bias", nn.initializers.zeros, (self.fout,), jnp.float32)
        return k, b


class _MHAShell(nn.Module):
    """Param shell matching MultiheadAttention's tree (q/k/v/out projs)."""

    dim: int

    @nn.compact
    def __call__(self):
        return tuple(_DShell(self.dim, self.dim, name=n)()
                     for n in ("q_proj", "k_proj", "v_proj", "out_proj"))


class _OutShell(nn.Module):
    """Param shell matching ProjectionFreeAttention's tree (out_proj only)."""

    dim: int

    @nn.compact
    def __call__(self):
        return _DShell(self.dim, self.dim, name="out_proj")()


def _fused_allowed() -> bool:
    import os

    import jax

    return (jax.default_backend() in ("tpu", "axon")
            or os.environ.get("SPE_FUSED_INTERPRET") == "1")


class MLP(nn.Module):
    """num_layers-deep ReLU MLP (reference transformer.py:21-33)."""

    hidden_dim: int
    out_dim: int
    num_layers: int
    dtype: jnp.dtype = jnp.float32
    final_zero_init: bool = False  # bbox head zero-init, conditional_detr.py:63-66

    @nn.compact
    def __call__(self, x):
        for i in range(self.num_layers):
            last = i == self.num_layers - 1
            init = {}
            if last and self.final_zero_init:
                init = dict(kernel_init=nn.initializers.zeros,
                            bias_init=nn.initializers.zeros)
            x = nn.Dense(self.out_dim if last else self.hidden_dim,
                         dtype=self.dtype, name=f"layers_{i}", **init)(x)
            if not last:
                x = nn.relu(x)
        return x


class TransformerEncoderLayer(nn.Module):
    """Encoder layer with additive positional q/k. Post-norm by default
    (reference transformer.py:253-310, normalize_before=False); pre-norm
    reproduces forward_pre (transformer.py:278-295) when normalize_before."""

    num_heads: int
    dim_feedforward: int
    dropout: float = 0.1
    normalize_before: bool = False
    use_pallas: bool = False
    use_fused: bool = False  # whole-layer Pallas kernel (ops/pallas_encoder.py)
    tp_mesh: object = None  # head-sharded kernel TP (attention.py)
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, src, pos, *, key_padding_mask=None, deterministic=True):
        if self.use_fused and not self.normalize_before and _fused_allowed():
            return self._fused(src, pos, key_padding_mask, deterministic)
        norm1 = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="norm1")
        norm2 = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="norm2")
        src2 = norm1(src) if self.normalize_before else src
        q = k = src2 + pos
        h = MultiheadAttention(self.num_heads, dropout=self.dropout,
                               use_pallas=self.use_pallas, dtype=self.dtype,
                               tp_mesh=self.tp_mesh,
                               name="self_attn")(q, k, src2,
                                                 key_padding_mask=key_padding_mask,
                                                 deterministic=deterministic)
        src = src + nn.Dropout(self.dropout)(h, deterministic=deterministic)
        if not self.normalize_before:
            src = norm1(src)
        src2 = norm2(src) if self.normalize_before else src
        h = nn.Dense(self.dim_feedforward, dtype=self.dtype, name="linear1")(src2)
        h = nn.Dropout(self.dropout)(nn.relu(h), deterministic=deterministic)
        h = nn.Dense(src.shape[-1], dtype=self.dtype, name="linear2")(h)
        src = src + nn.Dropout(self.dropout)(h, deterministic=deterministic)
        if not self.normalize_before:
            src = norm2(src)
        return src

    def _fused(self, src, pos, key_padding_mask, deterministic):
        import jax

        from spe_tpu.ops.pallas_encoder import fused_encoder_layer

        D = src.shape[-1]
        (wq, bq), (wk, bk), (wv, bv), (wo, bo) = _MHAShell(
            D, name="self_attn")()
        g1, b1 = _LNShell(D, name="norm1")()
        g2, b2 = _LNShell(D, name="norm2")()
        w1, bb1 = _DShell(D, self.dim_feedforward, name="linear1")()
        w2, bb2 = _DShell(self.dim_feedforward, D, name="linear2")()

        rate = 0.0 if deterministic else float(self.dropout)
        if rate > 0.0:
            key = self.make_rng("dropout")
            seed = jax.random.randint(key, (1,), 0, 2**31 - 1).astype(jnp.float32)
        else:
            seed = jnp.zeros((1,), jnp.float32)

        B, N, _ = src.shape
        if key_padding_mask is not None:
            bias = jnp.where(key_padding_mask, -1e9, 0.0).astype(
                jnp.float32).reshape(B, 1, N)
        else:
            bias = jnp.zeros((B, 1, N), jnp.float32)

        dt = self.dtype
        params = (
            wq.astype(dt), bq.reshape(1, D), wk.astype(dt), bk.reshape(1, D),
            wv.astype(dt), bv.reshape(1, D), wo.astype(dt), bo.reshape(1, D),
            g1.reshape(1, D), b1.reshape(1, D),
            w1.astype(dt), bb1.reshape(1, self.dim_feedforward),
            w2.astype(dt), bb2.reshape(1, D),
            g2.reshape(1, D), b2.reshape(1, D),
            bias, seed,
        )
        interpret = jax.default_backend() not in ("tpu", "axon")
        return fused_encoder_layer(src.astype(dt), pos.astype(dt), params,
                                   self.num_heads, interpret, rate)


class ConditionalDecoderLayer(nn.Module):
    """Decoder layer: content/pos-projected self-attn + conditional
    cross-attn at 2*d_model + FFN (reference transformer.py:313-427).

    use_pallas fuses the CROSS-attention (300 queries x ~1024 keys at
    2*d_model); the 300x300 self-attention stays on the einsum path —
    it is too small for a kernel round trip to pay off.

    num_sets > 1: tgt/query_pos/query_sine_embed carry `num_sets` stacked
    independent query sets along the query axis (B, S*Q, D) — the base +
    refinement decoder passes batched into ONE call (they share encoder
    memory; the reference loops instead, transformer.py:147-155, but a jit
    program needn't). Self-attention folds the set dim into the batch so
    sets never attend to each other; cross-attention and all elementwise
    ops are per-query and need no masking. Identical math to looping."""

    num_heads: int
    dim_feedforward: int
    dropout: float = 0.1
    use_pallas: bool = False
    use_fused: bool = False  # whole-layer Pallas kernel (ops/pallas_decoder.py)
    num_sets: int = 1
    tp_mesh: object = None  # head-sharded kernel TP (attention.py)
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, tgt, memory, pos, query_pos, query_sine_embed, *,
                 is_first: bool, key_padding_mask=None, deterministic=True,
                 fused_qbias=None):
        if self.use_fused and fused_qbias is not None and _fused_allowed():
            return self._fused(tgt, memory, pos, query_pos, query_sine_embed,
                               is_first, key_padding_mask, fused_qbias,
                               deterministic)
        D = tgt.shape[-1]
        nh = self.num_heads

        # ---- self-attention with separate content/pos projections ----
        q = (nn.Dense(D, dtype=self.dtype, name="sa_qcontent_proj")(tgt)
             + nn.Dense(D, dtype=self.dtype, name="sa_qpos_proj")(query_pos))
        k = (nn.Dense(D, dtype=self.dtype, name="sa_kcontent_proj")(tgt)
             + nn.Dense(D, dtype=self.dtype, name="sa_kpos_proj")(query_pos))
        v = nn.Dense(D, dtype=self.dtype, name="sa_v_proj")(tgt)
        if self.num_sets > 1:
            # (B, S*Q, D) -> (B*S, Q, D): each set self-attends in isolation
            fold = lambda x: x.reshape(x.shape[0] * self.num_sets,
                                       x.shape[1] // self.num_sets, D)
            B0 = tgt.shape[0]
            h = ProjectionFreeAttention(nh, dropout=self.dropout, dtype=self.dtype,
                                        name="self_attn")(
                fold(q), fold(k), fold(v), deterministic=deterministic)
            h = h.reshape(B0, -1, D)
        else:
            h = ProjectionFreeAttention(nh, dropout=self.dropout, dtype=self.dtype,
                                        name="self_attn")(q, k, v,
                                                          deterministic=deterministic)
        tgt = tgt + nn.Dropout(self.dropout)(h, deterministic=deterministic)
        tgt = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="norm1")(tgt)

        # ---- conditional cross-attention ----
        q_content = nn.Dense(D, dtype=self.dtype, name="ca_qcontent_proj")(tgt)
        k_content = nn.Dense(D, dtype=self.dtype, name="ca_kcontent_proj")(memory)
        v = nn.Dense(D, dtype=self.dtype, name="ca_v_proj")(memory)
        k_pos = nn.Dense(D, dtype=self.dtype, name="ca_kpos_proj")(pos)
        if is_first:
            # ca_qpos_proj exists only on the first layer (transformer.py:203-204)
            q_pos = nn.Dense(D, dtype=self.dtype, name="ca_qpos_proj")(query_pos)
            q_content = q_content + q_pos
            k_content = k_content + k_pos

        B, Q, _ = q_content.shape
        hw = memory.shape[1]
        sine = nn.Dense(D, dtype=self.dtype, name="ca_qpos_sine_proj")(query_sine_embed)
        # concat per head: (B, N, nh, Dh) ++ (B, N, nh, Dh) -> (B, N, 2*D)
        qq = jnp.concatenate([
            q_content.reshape(B, Q, nh, D // nh), sine.reshape(B, Q, nh, D // nh)
        ], axis=3).reshape(B, Q, 2 * D)
        kk = jnp.concatenate([
            k_content.reshape(B, hw, nh, D // nh), k_pos.reshape(B, hw, nh, D // nh)
        ], axis=3).reshape(B, hw, 2 * D)
        h = ProjectionFreeAttention(nh, dropout=self.dropout,
                                    use_pallas=self.use_pallas, dtype=self.dtype,
                                    tp_mesh=self.tp_mesh,
                                    name="cross_attn")(qq, kk, v,
                                                       key_padding_mask=key_padding_mask,
                                                       deterministic=deterministic)
        tgt = tgt + nn.Dropout(self.dropout)(h, deterministic=deterministic)
        tgt = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="norm2")(tgt)

        # ---- FFN ----
        h = nn.Dense(self.dim_feedforward, dtype=self.dtype, name="linear1")(tgt)
        h = nn.Dropout(self.dropout)(nn.relu(h), deterministic=deterministic)
        h = nn.Dense(D, dtype=self.dtype, name="linear2")(h)
        tgt = tgt + nn.Dropout(self.dropout)(h, deterministic=deterministic)
        tgt = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="norm3")(tgt)
        return tgt

    def _fused(self, tgt, memory, pos, query_pos, sine, is_first,
               key_padding_mask, qbias, deterministic):
        import jax

        from spe_tpu.ops.pallas_decoder import fused_decoder_layer

        D = tgt.shape[-1]
        dt = self.dtype

        def dense(name):
            w, bb = _DShell(D, D, name=name)()
            return w.astype(dt), bb.reshape(1, D)

        ps = []
        for n in ("sa_qcontent_proj", "sa_qpos_proj", "sa_kcontent_proj",
                  "sa_kpos_proj", "sa_v_proj"):
            ps += list(dense(n))
        wo_sa, bo_sa = _OutShell(D, name="self_attn")()
        ps += [wo_sa.astype(dt), bo_sa.reshape(1, D)]
        g1, b1 = _LNShell(D, name="norm1")()
        ps += [g1.reshape(1, D), b1.reshape(1, D)]
        for n in ("ca_qcontent_proj", "ca_kcontent_proj", "ca_v_proj",
                  "ca_kpos_proj"):
            ps += list(dense(n))
        if is_first:
            ps += list(dense("ca_qpos_proj"))
        ps += list(dense("ca_qpos_sine_proj"))
        wo_ca, bo_ca = _OutShell(D, name="cross_attn")()
        ps += [wo_ca.astype(dt), bo_ca.reshape(1, D)]
        g2, b2 = _LNShell(D, name="norm2")()
        ps += [g2.reshape(1, D), b2.reshape(1, D)]
        w1, bb1 = _DShell(D, self.dim_feedforward, name="linear1")()
        w2, bb2 = _DShell(self.dim_feedforward, D, name="linear2")()
        ps += [w1.astype(dt), bb1.reshape(1, self.dim_feedforward),
               w2.astype(dt), bb2.reshape(1, D)]
        g3, b3 = _LNShell(D, name="norm3")()
        ps += [g3.reshape(1, D), b3.reshape(1, D)]

        rate = 0.0 if deterministic else float(self.dropout)
        if rate > 0.0:
            key = self.make_rng("dropout")
            seed = jax.random.randint(key, (1,), 0, 2**31 - 1).astype(jnp.float32)
        else:
            seed = jnp.zeros((1,), jnp.float32)

        B, N, _ = memory.shape
        if key_padding_mask is not None:
            bias = jnp.where(key_padding_mask, -1e9, 0.0).astype(
                jnp.float32).reshape(B, 1, N)
        else:
            bias = jnp.zeros((B, 1, N), jnp.float32)

        params = tuple(ps) + (bias, qbias, seed)
        interpret = jax.default_backend() not in ("tpu", "axon")
        return fused_decoder_layer(tgt.astype(dt), memory.astype(dt),
                                   pos.astype(dt), query_pos.astype(dt),
                                   sine.astype(dt), self.num_heads,
                                   self.num_sets, interpret, rate, params)


class ConditionalDecoder(nn.Module):
    """Decoder stack returning per-layer normed states + reference points
    (reference TransformerDecoder, transformer.py:192-250)."""

    num_layers: int
    num_heads: int
    dim_feedforward: int
    d_model: int
    dropout: float = 0.1
    use_pallas: bool = False
    use_fused: bool = False  # whole-layer kernels (ops/pallas_decoder.py)
    num_sets: int = 1  # stacked query sets along the query axis (see layer)
    tp_mesh: object = None  # head-sharded kernel TP (attention.py)
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, tgt, memory, pos, query_pos, *, key_padding_mask=None,
                 deterministic=True):
        # Whole-layer fusion pads each query set to a sublane multiple (Qp)
        # ONCE for the entire stack; padded query keys are masked with -1e9
        # in self-attention (qbias) and padded rows are dropped on return.
        B, SQ, _ = tgt.shape
        S = self.num_sets
        Q = SQ // S
        fused = self.use_fused and _fused_allowed()
        qbias = None
        if fused:
            Qp = -(-Q // 8) * 8
            if Qp != Q:
                tgt = _pad_sets(tgt, S, Q, Qp)
                query_pos = _pad_sets(query_pos, S, Q, Qp)
            qbias = jnp.where(jnp.arange(Qp) < Q, 0.0, -1e9).astype(
                jnp.float32).reshape(1, Qp)
        else:
            Qp = Q

        # reference points from query embeddings (transformer.py:216-217)
        ref_before_sigmoid = MLP(self.d_model, 2, 2, dtype=self.dtype,
                                 name="ref_point_head")(query_pos)
        reference_points = nn.sigmoid(ref_before_sigmoid)  # (B, S*Qp, 2)

        query_scale = MLP(self.d_model, self.d_model, 2, dtype=self.dtype,
                          name="query_scale")
        output = tgt
        intermediate = []
        final_norm = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="norm")
        for layer_id in range(self.num_layers):
            if layer_id == 0:
                pos_transformation = 1.0
            else:
                pos_transformation = query_scale(output)
            sine = gen_sineembed_for_position(reference_points, self.d_model)
            sine = sine.astype(output.dtype) * pos_transformation
            output = ConditionalDecoderLayer(
                self.num_heads, self.dim_feedforward, dropout=self.dropout,
                use_pallas=self.use_pallas, use_fused=self.use_fused,
                num_sets=self.num_sets, tp_mesh=self.tp_mesh,
                dtype=self.dtype, name=f"layers_{layer_id}")(
                output, memory, pos, query_pos, sine,
                is_first=(layer_id == 0), key_padding_mask=key_padding_mask,
                deterministic=deterministic, fused_qbias=qbias)
            intermediate.append(final_norm(output))

        hs = jnp.stack(intermediate)  # (L, B, S*Qp, D)
        if fused and Qp != Q:
            L = hs.shape[0]
            hs = hs.reshape(L, B, S, Qp, -1)[:, :, :, :Q].reshape(
                L, B, S * Q, -1)
            reference_points = reference_points.reshape(B, S, Qp, 2)[
                :, :, :Q].reshape(B, S * Q, 2)
        return hs, reference_points


def _pad_sets(x, S, Q, Qp):
    """(B, S*Q, D) -> (B, S*Qp, D), zero-padding each set's query rows."""
    B, _, D = x.shape
    x = x.reshape(B, S, Q, D)
    x = jnp.pad(x, ((0, 0), (0, 0), (0, Qp - Q), (0, 0)))
    return x.reshape(B, S * Qp, D)


class ConditionalTransformer(nn.Module):
    """Encoder once + decoder per query set (reference forward_refine,
    transformer.py:122-160)."""

    d_model: int
    num_heads: int = 8
    num_queries: int = 300
    num_encoder_layers: int = 6
    num_decoder_layers: int = 6
    dim_feedforward: int = 2048
    dropout: float = 0.1
    num_refines: int = 1
    normalize_before: bool = False  # --pre_norm (reference main.py:83)
    use_pallas: bool = False
    use_fused_layers: bool = False  # whole-layer Pallas kernels
    tp_mesh: object = None  # head-sharded kernel TP (attention.py)
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, src, pos_embed, *, key_padding_mask=None, deterministic=True):
        """src: (B, HW, D); pos_embed: (B, HW, D); mask (B, HW) True=pad.

        Returns (hs_list, references_list), one entry per query set:
          hs: (L, B, Q, D); references: (B, Q, 2).
        """
        B = src.shape[0]
        memory = src
        for i in range(self.num_encoder_layers):
            memory = TransformerEncoderLayer(
                self.num_heads, self.dim_feedforward, dropout=self.dropout,
                normalize_before=self.normalize_before,
                use_pallas=self.use_pallas, use_fused=self.use_fused_layers,
                tp_mesh=self.tp_mesh,
                dtype=self.dtype, name=f"encoder_layers_{i}")(
                memory, pos_embed, key_padding_mask=key_padding_mask,
                deterministic=deterministic)
        if self.normalize_before:
            # pre-norm encoders carry a final norm (reference
            # transformer.py:482: encoder_norm when normalize_before)
            memory = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype,
                                  name="encoder_norm")(memory)

        query_embeds = [self.param("query_embed", nn.initializers.normal(1.0),
                                   (self.num_queries, self.d_model), jnp.float32)]
        for r in range(self.num_refines):
            query_embeds.append(self.param(
                f"query_embed_refine_{r}", nn.initializers.normal(1.0),
                (self.num_queries, self.d_model), jnp.float32))

        # ONE decoder call over all query sets stacked along the query axis:
        # the sets share encoder memory, so batching them halves kernel
        # launches and computes the per-layer memory projections
        # (ca_kcontent/ca_v/ca_kpos) once instead of once per set. The
        # reference loops the decoder per set (transformer.py:147-155); the
        # math is identical (see ConditionalDecoderLayer.num_sets).
        S = len(query_embeds)
        decoder = ConditionalDecoder(
            self.num_decoder_layers, self.num_heads, self.dim_feedforward,
            self.d_model, dropout=self.dropout, use_pallas=self.use_pallas,
            use_fused=self.use_fused_layers, tp_mesh=self.tp_mesh,
            num_sets=S, dtype=self.dtype, name="decoder")

        qe_all = jnp.concatenate(query_embeds, axis=0)  # (S*Q, D)
        query_pos = jnp.broadcast_to(qe_all[None], (B,) + qe_all.shape).astype(src.dtype)
        tgt = jnp.zeros_like(query_pos)
        hs, refs = decoder(tgt, memory, pos_embed, query_pos,
                           key_padding_mask=key_padding_mask,
                           deterministic=deterministic)
        # split back into the per-set contract: hs (L, B, S*Q, D) -> S x
        # (L, B, Q, D); refs (B, S*Q, 2) -> S x (B, Q, 2)
        Q = self.num_queries
        hs_all = [hs[:, :, s * Q:(s + 1) * Q, :] for s in range(S)]
        ref_all = [refs[:, s * Q:(s + 1) * Q, :] for s in range(S)]
        return hs_all, ref_all
