"""CaiT two-branch backbone with multi-class-token CAMs (flax.linen).

TPU-native rebuild of the reference's live backbone family
(models/cait.py: `cait_models` base :421-516, `TSCAM_cait_two_branch`
:674-831 — the published config): a LayerScale patch-block stack with
talking-heads attention; a detection branch forked at `layer_to_det`
(duplicated tail blocks, weight-initialized from the classification tail);
class-attention blocks over [CLS ++ per-class tokens ++ patches]; heads
producing per-class-token logits + CLS multilabel logits; and CAMs taken
from the FIRST class-attention block's token->patch attention with
std-reweighting across heads (cait.py:801-806,818-828).

Differences from the reference (deliberate, TPU-first):
  * batch-first (B, N, D) everywhere; CAM output is (B, C, h, w) like the
    reference's final shape;
  * per-forward pos-embed interpolation is two precomputed bicubic
    matmuls matching torch align_corners=False exactly (layers.py);
  * patch embed is a reshaped matmul, not a conv (see layers.PatchEmbed).
"""

from __future__ import annotations

import dataclasses
import flax.linen as nn
import jax.numpy as jnp

from spe_tpu.models.attention import MultiClassAttention, TalkingHeadsAttention
from spe_tpu.models.layers import (DropPath, Mlp, PatchEmbed,
                                   interpolate_pos_embed, trunc_normal_init)


class _DenseShell(nn.Module):
    """Declares Dense-shaped params (kernel/bias) without executing — the
    fused whole-block kernel consumes the raw arrays; param paths stay
    identical to the unfused tree so checkpoints/converters are unaffected."""

    fin: int
    fout: int

    @nn.compact
    def __call__(self):
        k = self.param("kernel", trunc_normal_init, (self.fin, self.fout),
                       jnp.float32)
        b = self.param("bias", nn.initializers.zeros, (self.fout,), jnp.float32)
        return k, b


class _LNShell(nn.Module):
    dim: int

    @nn.compact
    def __call__(self):
        s = self.param("scale", nn.initializers.ones, (self.dim,), jnp.float32)
        b = self.param("bias", nn.initializers.zeros, (self.dim,), jnp.float32)
        return s, b


class _AttnShell(nn.Module):
    """Param shell matching TalkingHeadsAttention's tree."""

    dim: int
    num_heads: int

    @nn.compact
    def __call__(self):
        H = self.num_heads
        qkv = _DenseShell(self.dim, 3 * self.dim, name="qkv")()
        wl = self.param("proj_l", nn.initializers.truncated_normal(0.02),
                        (H, H), jnp.float32)
        bl = self.param("proj_l_bias", nn.initializers.zeros, (H,), jnp.float32)
        ww = self.param("proj_w", nn.initializers.truncated_normal(0.02),
                        (H, H), jnp.float32)
        bw = self.param("proj_w_bias", nn.initializers.zeros, (H,), jnp.float32)
        proj = _DenseShell(self.dim, self.dim, name="proj")()
        return qkv, wl, bl, ww, bw, proj


class _CAttnShell(nn.Module):
    """Param shell matching MultiClassAttention's tree."""

    dim: int

    @nn.compact
    def __call__(self):
        q = _DenseShell(self.dim, self.dim, name="q")()
        k = _DenseShell(self.dim, self.dim, name="k")()
        v = _DenseShell(self.dim, self.dim, name="v")()
        proj = _DenseShell(self.dim, self.dim, name="proj")()
        return q, k, v, proj


class _MlpShell(nn.Module):
    dim: int
    hidden: int

    @nn.compact
    def __call__(self):
        fc1 = _DenseShell(self.dim, self.hidden, name="fc1")()
        fc2 = _DenseShell(self.hidden, self.dim, name="fc2")()
        return fc1, fc2


class LayerScaleBlock(nn.Module):
    """Pre-norm block with LayerScale (reference LayerScale_Block,
    cait.py:396-416): x += dp(gamma1*attn(norm(x))); x += dp(gamma2*mlp(...)).

    use_fused routes the WHOLE block through one Pallas kernel per direction
    (ops/pallas_block.py): LN1 -> qkv -> talking-heads attention -> proj ->
    LayerScale residual -> LN2 -> MLP -> LayerScale residual, with all three
    dropouts in-kernel. Param tree is identical either way."""

    num_heads: int
    mlp_ratio: float = 4.0
    drop: float = 0.0
    attn_drop: float = 0.0
    drop_path: float = 0.0
    init_scale: float = 1e-4
    qkv_bias: bool = True
    use_pallas: bool = False
    use_fused: bool = False
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        # NB: deterministic is positional-or-keyword (not kw-only) so
        # nn.remat can mark it static (jax.checkpoint has no static kwargs)
        import os

        import jax

        D = x.shape[-1]
        gamma1 = self.param("gamma_1", nn.initializers.constant(self.init_scale), (D,), jnp.float32)
        gamma2 = self.param("gamma_2", nn.initializers.constant(self.init_scale), (D,), jnp.float32)
        # fused kernel only where it can actually run compiled: on non-TPU
        # backends the interpret-mode emulation is an io_callback that
        # cannot be SPMD-partitioned (and is test-only anyway), so fall back
        # to the standard path unless a test forces interpret via env.
        # qkv_bias=False also falls back: _AttnShell always declares the qkv
        # bias and the kernel adds it, so the fused path only matches the
        # flax block (params AND math) for qkv_bias=True.
        if self.use_fused and self.qkv_bias and (
                jax.default_backend() in ("tpu", "axon")
                or os.environ.get("SPE_FUSED_INTERPRET") == "1"):
            return self._fused(x, gamma1, gamma2, deterministic)
        h = nn.LayerNorm(epsilon=1e-6, dtype=self.dtype, name="norm1")(x)
        h = TalkingHeadsAttention(self.num_heads, attn_drop=self.attn_drop,
                                  proj_drop=self.drop, qkv_bias=self.qkv_bias,
                                  use_pallas=self.use_pallas,
                                  dtype=self.dtype, name="attn")(h, deterministic=deterministic)
        x = x + DropPath(self.drop_path)(gamma1.astype(x.dtype) * h, deterministic=deterministic)
        h = nn.LayerNorm(epsilon=1e-6, dtype=self.dtype, name="norm2")(x)
        h = Mlp(int(D * self.mlp_ratio), dropout=self.drop, dtype=self.dtype,
                name="mlp")(h, deterministic=deterministic)
        x = x + DropPath(self.drop_path)(gamma2.astype(x.dtype) * h, deterministic=deterministic)
        return x

    def _fused(self, x, gamma1, gamma2, deterministic: bool):
        import os

        import jax

        from spe_tpu.ops.pallas_block import fused_layer_scale_block

        D = x.shape[-1]
        H = self.num_heads
        (wqkv, bqkv), wl, bl, ww, bw, (wp, bp) = _AttnShell(
            D, H, name="attn")()
        g1, b1 = _LNShell(D, name="norm1")()
        g2, b2 = _LNShell(D, name="norm2")()
        (w1, bb1), (w2, bb2) = _MlpShell(D, int(D * self.mlp_ratio),
                                         name="mlp")()

        attn_drop = 0.0 if deterministic else float(self.attn_drop)
        proj_drop = 0.0 if deterministic else float(self.drop)
        path_drop = 0.0 if deterministic else float(self.drop_path)
        if attn_drop > 0.0 or proj_drop > 0.0 or path_drop > 0.0:
            key = self.make_rng("dropout")
            seed = jax.random.randint(key, (1,), 0, 2**31 - 1).astype(jnp.float32)
        else:
            seed = jnp.zeros((1,), jnp.float32)

        dt = self.dtype
        params = (
            g1.reshape(1, D), b1.reshape(1, D),
            wqkv.astype(dt), bqkv.reshape(1, 3 * D),
            wl, bl.reshape(H, 1), ww, bw.reshape(H, 1),
            wp.astype(dt), bp.reshape(1, D),
            gamma1.reshape(1, D),
            g2.reshape(1, D), b2.reshape(1, D),
            w1.astype(dt), bb1.reshape(1, int(D * self.mlp_ratio)),
            w2.astype(dt), bb2.reshape(1, D),
            gamma2.reshape(1, D),
            seed,
        )
        x = x.astype(dt)
        N = x.shape[1]
        q_tile = next((t for t in (512, 256, 128) if N % t == 0), N)
        # A/B knob: SPE_BLOCK_QTILE overrides the tile (must divide N) —
        # e.g. 1024 runs the whole sequence as one tile, halving the
        # per-tile dot count at 2x the per-dot area (latency-bound regime)
        qt_env = os.environ.get("SPE_BLOCK_QTILE")
        if qt_env and N % int(qt_env) == 0:
            q_tile = int(qt_env)
        interpret = jax.default_backend() not in ("tpu", "axon")
        return fused_layer_scale_block(x, params, q_tile, interpret,
                                       attn_drop, proj_drop, path_drop)


class LayerScaleBlockClassAttn(nn.Module):
    """Class-attention block over u=[cls_tokens ++ patches] updating only the
    class tokens (reference LayerScale_Block_CA_MultiClass, cait.py:311-328).
    Returns (new_cls_tokens, attn_map).

    use_fused routes the WHOLE block through one Pallas kernel per direction
    (ops/pallas_ca_block.py); the attention map stays a first-class output
    (the CAM source). Param tree is identical either way. These blocks carry
    no dropout in the recipe (none is passed here), so the fused kernel
    needs no PRNG."""

    num_heads: int
    num_tokens: int
    mlp_ratio: float = 4.0
    init_scale: float = 1e-4
    qkv_bias: bool = True
    use_pallas: bool = False
    use_fused: bool = False
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, cls_tokens, *, deterministic: bool = True):
        import os

        import jax

        D = x.shape[-1]
        gamma1 = self.param("gamma_1", nn.initializers.constant(self.init_scale), (D,), jnp.float32)
        gamma2 = self.param("gamma_2", nn.initializers.constant(self.init_scale), (D,), jnp.float32)
        # the fused kernel's param shell always creates q/k/v biases and the
        # kernel adds them unconditionally — with qkv_bias=False both the
        # param tree and the math would silently diverge from the flax path,
        # so only route qkv_bias=True configs through it
        if self.use_fused and self.qkv_bias and (
                jax.default_backend() in ("tpu", "axon")
                or os.environ.get("SPE_FUSED_INTERPRET") == "1"):
            return self._fused(x, cls_tokens, gamma1, gamma2)
        u = jnp.concatenate([cls_tokens, x], axis=1)
        u = nn.LayerNorm(epsilon=1e-6, dtype=self.dtype, name="norm1")(u)
        h, attn = MultiClassAttention(self.num_heads, num_tokens=self.num_tokens,
                                      qkv_bias=self.qkv_bias,
                                      use_pallas=self.use_pallas, dtype=self.dtype,
                                      name="attn")(u, deterministic=deterministic)
        cls_tokens = cls_tokens + gamma1.astype(h.dtype) * h
        h = nn.LayerNorm(epsilon=1e-6, dtype=self.dtype, name="norm2")(cls_tokens)
        h = Mlp(int(D * self.mlp_ratio), dtype=self.dtype, name="mlp")(
            h, deterministic=deterministic)
        cls_tokens = cls_tokens + gamma2.astype(h.dtype) * h
        return cls_tokens, attn

    def _fused(self, x, cls_tokens, gamma1, gamma2):
        import jax

        from spe_tpu.ops.pallas_ca_block import fused_class_attn_block

        D = x.shape[-1]
        g1, b1 = _LNShell(D, name="norm1")()
        (wq, bq), (wk, bk), (wv, bv), (wp, bp) = _CAttnShell(
            D, name="attn")()
        g2, b2 = _LNShell(D, name="norm2")()
        (w1, bb1), (w2, bb2) = _MlpShell(D, int(D * self.mlp_ratio),
                                         name="mlp")()
        dt = self.dtype
        params = (
            g1.reshape(1, D), b1.reshape(1, D),
            wq.astype(dt), bq.reshape(1, D),
            wk.astype(dt), bk.reshape(1, D),
            wv.astype(dt), bv.reshape(1, D),
            wp.astype(dt), bp.reshape(1, D),
            gamma1.reshape(1, D),
            g2.reshape(1, D), b2.reshape(1, D),
            w1.astype(dt), bb1.reshape(1, int(D * self.mlp_ratio)),
            w2.astype(dt), bb2.reshape(1, D),
            gamma2.reshape(1, D),
        )
        interpret = jax.default_backend() not in ("tpu", "axon")
        return fused_class_attn_block(cls_tokens.astype(dt), x.astype(dt),
                                      params, self.num_heads, interpret)


def std_reweighting(cam: jnp.ndarray) -> jnp.ndarray:
    """Reweight per-head CAMs by normalized per-head std and sum over heads
    (reference cait.py:801-806; torch.std is unbiased/ddof=1).

    cam: (B, H, C, P) -> (B, C, P).
    """
    cam32 = cam.astype(jnp.float32)
    std = jnp.std(cam32, axis=-1, keepdims=True, ddof=1)
    std = std - jnp.min(std, axis=1, keepdims=True)
    std = std / jnp.maximum(jnp.max(std, axis=1, keepdims=True), 1e-12)
    return (cam32 * std).sum(axis=1)


@dataclasses.dataclass(frozen=True)
class CaiTConfig:
    img_size: int = 384
    patch_size: int = 16
    embed_dim: int = 192
    depth: int = 36
    num_heads: int = 4
    mlp_ratio: float = 4.0
    num_classes: int = 20
    layer_to_det: int = 24
    depth_token_only: int = 2
    init_scale: float = 1e-5
    drop_rate: float = 0.0
    attn_drop_rate: float = 0.0
    drop_path_rate: float = 0.0
    qkv_bias: bool = True
    use_pallas: bool = False
    # whole-block fused Pallas kernel (ops/pallas_block.py) for the patch
    # blocks: one kernel per block per direction instead of ~10 XLA ops +
    # an attention kernel. Takes precedence over use_pallas for the patch
    # stack (class-attention blocks keep their own kernels).
    use_fused_block: bool = False
    # fused CLASS-ATTENTION token blocks (ops/pallas_ca_block.py) — the CAM
    # source. Split from use_fused_block (VERDICT r4 #2) so it can be A/B'd
    # and earn its default independently; None = follow use_fused_block.
    use_fused_ca: "bool | None" = None
    # rematerialize each patch block under autodiff (jax.checkpoint):
    # activations are recomputed in the backward pass instead of stored —
    # the standard TPU memory/FLOPs trade for deep stacks (M48@448) and a
    # prerequisite for fitting large configs on a 16GB v5e chip
    remat: bool = False
    # True = TSCAM_cait_two_branch (duplicate det block stack forked at
    # layer_to_det, std-reweighted CAM, cait.py:674-831). False = the
    # single-branch TSCAM_cait (det features = norm_to_det(x) captured at
    # block index layer_to_det, CAM = head-MEAN of the first class-attention
    # block, cait.py:531-670).
    two_branch: bool = True


class CaiTTwoBranch(nn.Module):
    """TSCAM_cait_two_branch (reference cait.py:674-831), or — when
    cfg.two_branch=False — the single-branch TSCAM_cait (cait.py:531-670).

    __call__(images, mask) -> dict:
      x_logits:     (B, C)   per-class-token scalars (weak multilabel head)
      x_cls_logits: (B, C)   CLS-token multilabel head
      cams_cls:     (B, C, h, w) class-attention maps (std-reweighted heads
                    for two-branch; head mean for single-branch)
      x_patch:      (B, h, w, D) detection patch features (norm_det'd two-
                    branch stack, or norm_to_det'd mid-stack capture)
    """

    cfg: CaiTConfig
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, images, *, deterministic: bool = True):
        cfg = self.cfg
        B, H, W, _ = images.shape
        p = cfg.patch_size
        gh, gw = H // p, W // p
        n_grid = cfg.img_size // p

        x = PatchEmbed(p, cfg.embed_dim, dtype=self.dtype,
                       name="patch_embed")(images.astype(self.dtype))

        pos_embed = self.param("pos_embed", trunc_normal_init,
                               (1, n_grid * n_grid, cfg.embed_dim), jnp.float32)
        cls_token = self.param("cls_token", trunc_normal_init,
                               (1, 1, cfg.embed_dim), jnp.float32)
        extra_cls_token = self.param("extra_cls_token", trunc_normal_init,
                                     (1, cfg.num_classes, cfg.embed_dim), jnp.float32)

        pos = interpolate_pos_embed(pos_embed, (n_grid, n_grid), (gh, gw))
        x = x + pos.astype(x.dtype)
        x = nn.Dropout(cfg.drop_rate)(x, deterministic=deterministic)

        cls_tokens = jnp.concatenate([
            jnp.broadcast_to(cls_token, (B, 1, cfg.embed_dim)),
            jnp.broadcast_to(extra_cls_token, (B, cfg.num_classes, cfg.embed_dim)),
        ], axis=1).astype(x.dtype)

        # patch stack. Two-branch: fork the det branch AFTER block
        # layer_to_det-1 (reference forks at `i + 1 == layer_to_det`,
        # cait.py:776-777) into a duplicate block stack. Single-branch:
        # det features = norm_to_det(x) captured at block INDEX
        # layer_to_det (`if i == self.layer_to_det`, cait.py:627-629).
        # deterministic is passed POSITIONALLY so nn.remat can mark it
        # static (index 2 after flax's scope arg)
        block_cls = (nn.remat(LayerScaleBlock, static_argnums=(2,))
                     if cfg.remat else LayerScaleBlock)
        x_feat = None
        for i in range(cfg.depth):
            x = block_cls(cfg.num_heads, cfg.mlp_ratio, drop=cfg.drop_rate,
                          attn_drop=cfg.attn_drop_rate, drop_path=cfg.drop_path_rate,
                          init_scale=cfg.init_scale, qkv_bias=cfg.qkv_bias,
                          use_pallas=cfg.use_pallas,
                          use_fused=cfg.use_fused_block,
                          dtype=self.dtype, name=f"blocks_{i}")(
                x, deterministic)
            if cfg.two_branch and i + 1 == cfg.layer_to_det:
                x_feat = x
            if not cfg.two_branch and i == min(cfg.layer_to_det, cfg.depth - 1):
                x_feat = x

        if cfg.two_branch:
            for i in range(cfg.depth - cfg.layer_to_det):
                x_feat = block_cls(cfg.num_heads, cfg.mlp_ratio, drop=cfg.drop_rate,
                                   attn_drop=cfg.attn_drop_rate, drop_path=cfg.drop_path_rate,
                                   init_scale=cfg.init_scale, qkv_bias=cfg.qkv_bias,
                                   use_pallas=cfg.use_pallas,
                                   use_fused=cfg.use_fused_block,
                                   dtype=self.dtype, name=f"blocks_det_{i}")(
                    x_feat, deterministic)
            x_feat = nn.LayerNorm(epsilon=1e-6, dtype=self.dtype, name="norm_det")(x_feat)
        else:
            x_feat = nn.LayerNorm(epsilon=1e-6, dtype=self.dtype,
                                  name="norm_to_det")(x_feat)

        # class-attention token blocks; first block's attention map = CAM
        first_attn = None
        num_tokens = 1 + cfg.num_classes
        for i in range(cfg.depth_token_only):
            fused_ca = (cfg.use_fused_block if cfg.use_fused_ca is None
                        else cfg.use_fused_ca)
            cls_tokens, attn = LayerScaleBlockClassAttn(
                cfg.num_heads, num_tokens=num_tokens, mlp_ratio=cfg.mlp_ratio,
                init_scale=cfg.init_scale, qkv_bias=cfg.qkv_bias,
                use_pallas=cfg.use_pallas, use_fused=fused_ca,
                dtype=self.dtype,
                name=f"blocks_token_only_{i}")(x, cls_tokens, deterministic=deterministic)
            if i == 0:
                first_attn = attn

        tokens = jnp.concatenate([cls_tokens, x], axis=1)
        tokens = nn.LayerNorm(epsilon=1e-6, dtype=self.dtype, name="norm")(tokens)

        x_logits = nn.Dense(1, dtype=self.dtype, kernel_init=trunc_normal_init,
                            name="cls_head")(tokens[:, 1:1 + cfg.num_classes])[..., 0]
        x_cls_logits = nn.Dense(cfg.num_classes, dtype=self.dtype,
                                kernel_init=trunc_normal_init,
                                name="cls_head_multi_cls")(tokens[:, 0])

        # CAM: first token block's attn (B, H, 1+C, 1+C+P) — class-token
        # queries (1..C) attending to the patch keys (1+C..end). Two-branch
        # reweights heads by their normalized std (cait.py:801-806,827);
        # single-branch takes the plain head mean (cait.py:660-664).
        cam = first_attn[:, :, 1:1 + cfg.num_classes, num_tokens:]
        if cfg.two_branch:
            cam = std_reweighting(cam)  # (B, C, P)
        else:
            cam = cam.astype(jnp.float32).mean(axis=1)
        cams_cls = cam.reshape(B, cfg.num_classes, gh, gw)

        return {
            "x_logits": x_logits.astype(jnp.float32),
            "x_cls_logits": x_cls_logits.astype(jnp.float32),
            "cams_cls": cams_cls,
            "x_patch": x_feat.reshape(B, gh, gw, cfg.embed_dim),
        }


# ---------------------------------------------------------------------------
# Registry (replaces the reference's ~20 timm @register_model factories,
# cait.py:1335-1948; each returns (config, embed_dim))
# ---------------------------------------------------------------------------

def _cait(img_size, embed_dim, depth, num_heads, init_scale=1e-5, **kw) -> CaiTConfig:
    return CaiTConfig(img_size=img_size, embed_dim=embed_dim, depth=depth,
                      num_heads=num_heads, init_scale=init_scale, **kw)


BACKBONE_REGISTRY = {
    # the published recipe (cait.py:1631-1664)
    "TSCAM_cait_XXS36_Two_Branch": lambda **kw: _cait(384, 192, 36, 4, **kw),
    "TSCAM_cait_XXS24_Two_Branch": lambda **kw: _cait(384, 192, 24, 4, **kw),
    "TSCAM_cait_XS24_Two_Branch": lambda **kw: _cait(384, 288, 24, 6, **kw),
    "TSCAM_cait_S24_Two_Branch": lambda **kw: _cait(384, 384, 24, 8, **kw),
    "TSCAM_cait_S36_Two_Branch": lambda **kw: _cait(384, 384, 36, 8, init_scale=1e-6, **kw),
    "TSCAM_cait_M36_Two_Branch": lambda **kw: _cait(384, 768, 36, 16, init_scale=1e-6, **kw),
    "TSCAM_cait_M48_Two_Branch": lambda **kw: _cait(448, 768, 48, 16, init_scale=1e-6, **kw),
    # single-branch TSCAM_cait variants (reference cait.py:1443-1664: no
    # duplicated det stack, det feats captured mid-stack, head-mean CAM)
    "TSCAM_cait_XXS24": lambda **kw: _cait(384, 192, 24, 4, two_branch=False, **kw),
    "TSCAM_cait_XXS36": lambda **kw: _cait(384, 192, 36, 4, two_branch=False, **kw),
    "TSCAM_cait_XXS24_224": lambda **kw: _cait(224, 192, 24, 4, two_branch=False, **kw),
    "TSCAM_cait_XXS36_224": lambda **kw: _cait(224, 192, 36, 4, two_branch=False, **kw),
    # 224px / larger two-branch size variants completing the reference's
    # size ladder (the reference builds these through the same two-branch
    # class with per-size pretrained checkpoints, cait.py:1335-1948)
    "TSCAM_cait_XXS24_224_Two_Branch": lambda **kw: _cait(224, 192, 24, 4, **kw),
    "TSCAM_cait_XS24": lambda **kw: _cait(384, 288, 24, 6, two_branch=False, **kw),
    "TSCAM_cait_S24_224": lambda **kw: _cait(224, 384, 24, 8, two_branch=False, **kw),
    "TSCAM_cait_S24": lambda **kw: _cait(384, 384, 24, 8, two_branch=False, **kw),
    "TSCAM_cait_S36": lambda **kw: _cait(384, 384, 36, 8, init_scale=1e-6,
                                         two_branch=False, **kw),
    "TSCAM_cait_M36": lambda **kw: _cait(384, 768, 36, 16, init_scale=1e-6,
                                         two_branch=False, **kw),
    "TSCAM_cait_M48": lambda **kw: _cait(448, 768, 48, 16, init_scale=1e-6,
                                         two_branch=False, **kw),
    # NOT implemented (dead upstream research variants, documented out of
    # scope): TSCAM_cait_conv_* (conv stem), *_two_attn, *_concat_heads,
    # *_woct0head_* — none reachable from the published recipes.
    # tiny config for smoke tests / CI (no reference analog)
    "TSCAM_cait_tiny": lambda **kw: _cait(64, 32, 4, 2, **kw),
    # mini config for the data-free accuracy rehearsal (no reference
    # analog): enough capacity to learn the 20-class mini-VOC from random
    # init, still CPU-trainable in minutes
    "TSCAM_cait_mini": lambda **kw: _cait(128, 64, 6, 2, **kw),
}


def build_cait_config(name: str, num_classes: int, layer_to_det: int,
                      drop_rate: float = 0.0, attn_drop_rate: float = 0.0,
                      drop_path_rate: float = 0.0,
                      use_pallas: bool = False,
                      use_fused_block: bool = False,
                      use_fused_ca=None,
                      remat: bool = False) -> CaiTConfig:
    if name not in BACKBONE_REGISTRY:
        raise KeyError(f"unknown backbone '{name}'; have {sorted(BACKBONE_REGISTRY)}")
    return BACKBONE_REGISTRY[name](
        num_classes=num_classes, layer_to_det=layer_to_det, drop_rate=drop_rate,
        attn_drop_rate=attn_drop_rate, drop_path_rate=drop_path_rate,
        use_pallas=use_pallas, use_fused_block=use_fused_block,
        use_fused_ca=use_fused_ca, remat=remat)
