"""Honest single-branch TSCAM_cait (reference cait.py:531-670): registry
routing, torch-oracle numerical parity, and the pretrained-weight path
(convert_backbone + merge_pretrained_backbone) end to end."""

import numpy as np
import pytest

torch = pytest.importorskip("torch")
import torch.nn as nn  # noqa: E402

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from spe_tpu.models.cait import CaiTConfig, CaiTTwoBranch, build_cait_config  # noqa: E402
from spe_tpu.models.convert import (convert_backbone,  # noqa: E402
                                    merge_pretrained_backbone)
from test_convert import (D, HEADS, NCLS, P, S,  # noqa: E402
                          TorchBlock, TorchCABlock)

DEPTH, L2D = 4, 2


def test_registry_single_branch_names_are_single_branch():
    cfg = build_cait_config("TSCAM_cait_XXS36", num_classes=20, layer_to_det=24)
    assert not cfg.two_branch
    cfg2 = build_cait_config("TSCAM_cait_XXS36_Two_Branch", num_classes=20,
                             layer_to_det=24)
    assert cfg2.two_branch


def test_single_branch_has_no_det_blocks():
    cfg = CaiTConfig(img_size=S, patch_size=P, embed_dim=D, depth=DEPTH,
                     num_heads=HEADS, num_classes=NCLS, layer_to_det=L2D,
                     depth_token_only=2, two_branch=False)
    model = CaiTTwoBranch(cfg)
    params = model.init(jax.random.PRNGKey(0), jnp.zeros((1, S, S, 3)))
    keys = set(params["params"])
    assert "norm_to_det" in keys
    assert not any(k.startswith("blocks_det") for k in keys)
    assert "norm_det" not in keys


class TorchSingleBranch(nn.Module):
    """Oracle of TSCAM_cait.forward_features/forward (cait.py:615-670):
    det feats = norm_to_det(x) at block INDEX layer_to_det; CAM = head MEAN
    of the first class-attention block."""

    def __init__(self):
        super().__init__()
        self.patch_embed = nn.Sequential()
        self.patch_embed.proj = nn.Conv2d(3, D, P, stride=P)
        n = (S // P) ** 2
        self.pos_embed = nn.Parameter(torch.randn(1, n, D) * 0.02)
        self.cls_token = nn.Parameter(torch.randn(1, 1, D) * 0.02)
        self.extra_cls_token = nn.Parameter(torch.randn(1, NCLS, D) * 0.02)
        self.blocks = nn.ModuleList([TorchBlock(D, HEADS) for _ in range(DEPTH)])
        self.blocks_token_only = nn.ModuleList(
            [TorchCABlock(D, HEADS, 1 + NCLS) for _ in range(2)])
        self.norm = nn.LayerNorm(D, eps=1e-6)
        self.norm_to_det = nn.LayerNorm(D, eps=1e-6)
        self.cls_head = nn.Linear(D, 1)
        self.cls_head_multi_cls = nn.Linear(D, NCLS)

    def forward(self, x):
        B = x.shape[0]
        x = self.patch_embed.proj(x).flatten(2).transpose(1, 2)
        cls = torch.cat([self.cls_token.expand(B, -1, -1),
                         self.extra_cls_token.expand(B, -1, -1)], dim=1)
        x = x + self.pos_embed
        x_feat = None
        for i, blk in enumerate(self.blocks):
            x = blk(x)
            if i == L2D:
                x_feat = self.norm_to_det(x.clone())
        attn0 = None
        for i, blk in enumerate(self.blocks_token_only):
            cls = blk(x, cls)
            if i == 0:
                attn0 = blk.attn.attn_map
        tokens = self.norm(torch.cat([cls, x], dim=1))
        x_logits = self.cls_head(tokens[:, 1:1 + NCLS]).squeeze(-1)
        x_cls_logits = self.cls_head_multi_cls(tokens[:, 0])
        cam = attn0[..., 1:1 + NCLS, 1 + NCLS:].mean(dim=1)
        g = S // P
        return x_logits, x_cls_logits, cam.reshape(B, NCLS, g, g), x_feat


def test_single_branch_parity_with_torch_oracle(rng):
    torch.manual_seed(0)
    oracle = TorchSingleBranch().eval()
    sd = {k: v.detach().numpy() for k, v in oracle.state_dict().items()}

    cfg = CaiTConfig(img_size=S, patch_size=P, embed_dim=D, depth=DEPTH,
                     num_heads=HEADS, num_classes=NCLS, layer_to_det=L2D,
                     depth_token_only=2, two_branch=False)
    model = CaiTTwoBranch(cfg)
    x = rng.normal(size=(2, S, S, 3)).astype(np.float32)
    ref_params = model.init(jax.random.PRNGKey(0), jnp.array(x))

    conv = convert_backbone(sd, depth=DEPTH, layer_to_det=L2D, two_branch=False)
    import flax

    ref_flat = flax.traverse_util.flatten_dict(ref_params["params"])
    conv_flat = flax.traverse_util.flatten_dict(conv)
    assert set(ref_flat) == set(conv_flat), set(ref_flat) ^ set(conv_flat)

    out = model.apply({"params": conv}, jnp.array(x))
    with torch.no_grad():
        tx = torch.from_numpy(x.transpose(0, 3, 1, 2))
        t_logits, t_cls, t_cam, t_feat = oracle(tx)
    np.testing.assert_allclose(np.asarray(out["x_logits"]), t_logits.numpy(), atol=2e-5)
    np.testing.assert_allclose(np.asarray(out["x_cls_logits"]), t_cls.numpy(), atol=2e-5)
    np.testing.assert_allclose(np.asarray(out["cams_cls"]), t_cam.numpy(), atol=2e-5)
    g = S // P
    np.testing.assert_allclose(np.asarray(out["x_patch"]).reshape(2, g * g, D),
                               t_feat.numpy(), atol=2e-5)


def test_pretrained_backbone_merge_end_to_end(rng, tmp_path):
    """A (fixture) plain-CaiT classification .pth initializes the flagship
    two-branch backbone through the driver path: blocks copied, det branch
    cloned from tail blocks (init_blocks_det_weight), pos_embed interpolated
    to the recipe grid, heads left at init."""
    torch.manual_seed(1)
    # classification checkpoint: blocks + norm + cls tokens, NO det branch,
    # NO extra_cls_token/cls heads, smaller pos-embed grid (half resolution)
    class TorchPlainCait(nn.Module):
        def __init__(self):
            super().__init__()
            self.patch_embed = nn.Sequential()
            self.patch_embed.proj = nn.Conv2d(3, D, P, stride=P)
            n = (S // P // 2) ** 2  # 2x2 grid vs the model's 4x4... -> interp
            self.pos_embed = nn.Parameter(torch.randn(1, n, D) * 0.02)
            self.cls_token = nn.Parameter(torch.randn(1, 1, D) * 0.02)
            self.blocks = nn.ModuleList([TorchBlock(D, HEADS) for _ in range(DEPTH)])
            self.norm = nn.LayerNorm(D, eps=1e-6)

    ckpt_path = tmp_path / "pretrained.pth"
    torch.save({"model": TorchPlainCait().state_dict()}, ckpt_path)

    cfg = CaiTConfig(img_size=2 * S, patch_size=P, embed_dim=D, depth=DEPTH,
                     num_heads=HEADS, num_classes=NCLS, layer_to_det=L2D,
                     depth_token_only=2)
    model = CaiTTwoBranch(cfg)
    params = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 2 * S, 2 * S, 3)))

    from spe_tpu.models.convert import load_torch_checkpoint

    sd = load_torch_checkpoint(ckpt_path)
    conv = convert_backbone(sd, depth=DEPTH, layer_to_det=L2D)
    merged = merge_pretrained_backbone(params["params"], conv, verbose=False)

    # block weights copied
    np.testing.assert_allclose(
        np.asarray(merged["blocks_0"]["attn"]["qkv"]["kernel"]),
        np.asarray(conv["blocks_0"]["attn"]["qkv"]["kernel"]))
    # det branch cloned from tail blocks (blocks_det_0 == blocks.{L2D})
    np.testing.assert_allclose(
        np.asarray(merged["blocks_det_0"]["attn"]["qkv"]["kernel"]),
        np.asarray(conv[f"blocks_{L2D}"]["attn"]["qkv"]["kernel"]))
    # pos_embed interpolated to the init grid shape
    assert merged["pos_embed"].shape == params["params"]["pos_embed"].shape
    # heads absent from the checkpoint keep their init
    np.testing.assert_allclose(
        np.asarray(merged["cls_head"]["kernel"]),
        np.asarray(params["params"]["cls_head"]["kernel"]))
    # and the merged tree still powers a forward pass
    out = model.apply({"params": merged}, jnp.zeros((1, 2 * S, 2 * S, 3)))
    assert np.isfinite(np.asarray(out["x_logits"], np.float32)).all()
