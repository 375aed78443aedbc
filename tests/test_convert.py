"""Numerical parity: torch oracle of the reference backbone math ->
convert_backbone -> CaiTTwoBranch must reproduce the same outputs.

The torch modules below reimplement the reference formulas
(models/cait.py: Attention_talking_head :344-393, LayerScale_Block :396-416,
Multi_Class_Attention :91-139, LayerScale_Block_CA :284-328,
TSCAM_cait_two_branch :674-831) as a test oracle.
"""

import math

import numpy as np
import pytest

torch = pytest.importorskip("torch")
import torch.nn as nn  # noqa: E402
import torch.nn.functional as F  # noqa: E402

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from spe_tpu.models.cait import CaiTConfig, CaiTTwoBranch  # noqa: E402
from spe_tpu.models.convert import convert_backbone  # noqa: E402

D, HEADS, DEPTH, L2D, NCLS, P, S = 32, 2, 4, 3, 5, 16, 64


class TorchTalkingHeads(nn.Module):
    def __init__(self, dim, num_heads):
        super().__init__()
        self.num_heads = num_heads
        self.scale = (dim // num_heads) ** -0.5
        self.qkv = nn.Linear(dim, dim * 3, bias=True)
        self.proj = nn.Linear(dim, dim)
        self.proj_l = nn.Linear(num_heads, num_heads)
        self.proj_w = nn.Linear(num_heads, num_heads)

    def forward(self, x):
        B, N, C = x.shape
        qkv = self.qkv(x).reshape(B, N, 3, self.num_heads, C // self.num_heads).permute(2, 0, 3, 1, 4)
        q, k, v = qkv[0] * self.scale, qkv[1], qkv[2]
        attn = q @ k.transpose(-2, -1)
        attn = self.proj_l(attn.permute(0, 2, 3, 1)).permute(0, 3, 1, 2)
        attn = attn.softmax(dim=-1)
        attn = self.proj_w(attn.permute(0, 2, 3, 1)).permute(0, 3, 1, 2)
        x = (attn @ v).transpose(1, 2).reshape(B, N, C)
        return self.proj(x)


class TorchBlock(nn.Module):
    def __init__(self, dim, heads, init_scale=1e-5):
        super().__init__()
        self.norm1 = nn.LayerNorm(dim, eps=1e-6)
        self.attn = TorchTalkingHeads(dim, heads)
        self.norm2 = nn.LayerNorm(dim, eps=1e-6)
        self.mlp = nn.Sequential()
        self.mlp.fc1 = nn.Linear(dim, dim * 4)
        self.mlp.fc2 = nn.Linear(dim * 4, dim)
        self.gamma_1 = nn.Parameter(init_scale * torch.ones(dim))
        self.gamma_2 = nn.Parameter(init_scale * torch.ones(dim))

    def forward(self, x):
        x = x + self.gamma_1 * self.attn(self.norm1(x))
        h = self.mlp.fc2(F.gelu(self.mlp.fc1(self.norm2(x))))
        return x + self.gamma_2 * h


class TorchMultiClassAttn(nn.Module):
    def __init__(self, dim, heads, num_tokens):
        super().__init__()
        self.num_heads = heads
        self.num_tokens = num_tokens
        self.scale = (dim // heads) ** -0.5
        self.q = nn.Linear(dim, dim, bias=True)
        self.k = nn.Linear(dim, dim, bias=True)
        self.v = nn.Linear(dim, dim, bias=True)
        self.proj = nn.Linear(dim, dim)

    def forward(self, x):
        B, N, C = x.shape
        t = self.num_tokens
        q = self.q(x[:, :t]).reshape(B, t, self.num_heads, C // self.num_heads).permute(0, 2, 1, 3)
        k = self.k(x).reshape(B, N, self.num_heads, C // self.num_heads).permute(0, 2, 1, 3)
        v = self.v(x).reshape(B, N, self.num_heads, C // self.num_heads).permute(0, 2, 1, 3)
        attn = ((q * self.scale) @ k.transpose(-2, -1)).softmax(dim=-1)
        self.attn_map = attn
        out = (attn @ v).transpose(1, 2).reshape(B, t, C)
        return self.proj(out)


class TorchCABlock(nn.Module):
    def __init__(self, dim, heads, num_tokens, init_scale=1e-5):
        super().__init__()
        self.norm1 = nn.LayerNorm(dim, eps=1e-6)
        self.attn = TorchMultiClassAttn(dim, heads, num_tokens)
        self.norm2 = nn.LayerNorm(dim, eps=1e-6)
        self.mlp = nn.Sequential()
        self.mlp.fc1 = nn.Linear(dim, dim * 4)
        self.mlp.fc2 = nn.Linear(dim * 4, dim)
        self.gamma_1 = nn.Parameter(init_scale * torch.ones(dim))
        self.gamma_2 = nn.Parameter(init_scale * torch.ones(dim))

    def forward(self, x, cls):
        u = torch.cat([cls, x], dim=1)
        cls = cls + self.gamma_1 * self.attn(self.norm1(u))
        h = self.mlp.fc2(F.gelu(self.mlp.fc1(self.norm2(cls))))
        return cls + self.gamma_2 * h


class TorchTwoBranch(nn.Module):
    def __init__(self):
        super().__init__()
        self.patch_embed = nn.Sequential()
        self.patch_embed.proj = nn.Conv2d(3, D, P, stride=P)
        n = (S // P) ** 2
        self.pos_embed = nn.Parameter(torch.randn(1, n, D) * 0.02)
        self.cls_token = nn.Parameter(torch.randn(1, 1, D) * 0.02)
        self.extra_cls_token = nn.Parameter(torch.randn(1, NCLS, D) * 0.02)
        self.blocks = nn.ModuleList([TorchBlock(D, HEADS) for _ in range(DEPTH)])
        self.blocks_det = nn.ModuleList([TorchBlock(D, HEADS) for _ in range(DEPTH - L2D)])
        self.blocks_token_only = nn.ModuleList(
            [TorchCABlock(D, HEADS, 1 + NCLS) for _ in range(2)])
        self.norm = nn.LayerNorm(D, eps=1e-6)
        self.norm_det = nn.LayerNorm(D, eps=1e-6)
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
            if i + 1 == L2D:
                x_feat = x.clone()
        for blk in self.blocks_det:
            x_feat = blk(x_feat)
        x_feat = self.norm_det(x_feat)
        attn0 = None
        for i, blk in enumerate(self.blocks_token_only):
            cls = blk(x, cls)
            if i == 0:
                attn0 = blk.attn.attn_map
        tokens = self.norm(torch.cat([cls, x], dim=1))
        x_logits = self.cls_head(tokens[:, 1:1 + NCLS]).squeeze(-1)
        x_cls_logits = self.cls_head_multi_cls(tokens[:, 0])
        cam = attn0[..., 1:1 + NCLS, 1 + NCLS:]
        std = torch.std(cam, dim=-1, keepdim=True)
        std = std - std.min(dim=1, keepdim=True)[0]
        std = std / std.max(dim=1, keepdim=True)[0]
        cam = (cam * std).sum(1)
        g = S // P
        return x_logits, x_cls_logits, cam.reshape(B, NCLS, g, g), x_feat


def test_backbone_parity_with_torch_oracle(rng):
    torch.manual_seed(0)
    oracle = TorchTwoBranch().eval()
    sd = {k: v.detach().numpy() for k, v in oracle.state_dict().items()}

    cfg = CaiTConfig(img_size=S, patch_size=P, embed_dim=D, depth=DEPTH,
                     num_heads=HEADS, num_classes=NCLS, layer_to_det=L2D,
                     depth_token_only=2)
    model = CaiTTwoBranch(cfg)
    x = rng.normal(size=(2, S, S, 3)).astype(np.float32)
    ref_params = model.init(jax.random.PRNGKey(0), jnp.array(x))

    conv = convert_backbone(sd, depth=DEPTH, layer_to_det=L2D)
    # structure must match what init produced
    import flax

    ref_flat = flax.traverse_util.flatten_dict(ref_params["params"])
    conv_flat = flax.traverse_util.flatten_dict(conv)
    assert set(ref_flat) == set(conv_flat), (
        set(ref_flat) ^ set(conv_flat))
    for k in ref_flat:
        assert ref_flat[k].shape == np.asarray(conv_flat[k]).shape, k

    out = model.apply({"params": conv}, jnp.array(x))
    with torch.no_grad():
        tx = torch.from_numpy(x.transpose(0, 3, 1, 2))
        t_logits, t_cls, t_cam, t_feat = oracle(tx)

    np.testing.assert_allclose(np.asarray(out["x_logits"]), t_logits.numpy(),
                               atol=2e-5)
    np.testing.assert_allclose(np.asarray(out["x_cls_logits"]), t_cls.numpy(),
                               atol=2e-5)
    np.testing.assert_allclose(np.asarray(out["cams_cls"]), t_cam.numpy(),
                               atol=2e-5)
    g = S // P
    np.testing.assert_allclose(
        np.asarray(out["x_patch"]).reshape(2, g * g, D), t_feat.numpy(), atol=2e-5)


def test_convert_detector_structure(rng):
    """convert_detector output matches SPEDetector.init param tree."""
    from spe_tpu.models.detector import SPEDetector

    cfg = CaiTConfig(img_size=S, patch_size=P, embed_dim=D, depth=DEPTH,
                     num_heads=HEADS, num_classes=NCLS, layer_to_det=L2D,
                     depth_token_only=2)
    det = SPEDetector(backbone_cfg=cfg, num_det_classes=NCLS + 1, num_queries=8,
                      num_refines=1, enc_layers=2, dec_layers=2,
                      dim_feedforward=64, nheads=2)
    x = jnp.array(rng.normal(size=(1, S, S, 3)).astype(np.float32))
    ref = det.init(jax.random.PRNGKey(0), x)

    # build a torch-style state dict by INVERTING our tree (shape-wise)
    import flax

    flat = flax.traverse_util.flatten_dict(ref["params"])
    torch.manual_seed(1)
    oracle = TorchTwoBranch()
    sd = {}
    for k, v in oracle.state_dict().items():
        sd[f"backbone.0.body.{k}"] = v.numpy()
    dmodel = D
    def lin(shape_out, shape_in):
        return np.random.default_rng(0).normal(size=(shape_out, shape_in)).astype(np.float32)
    for i in range(2):
        p = f"transformer.encoder.layers.{i}"
        sd[f"{p}.self_attn.in_proj_weight"] = lin(3 * dmodel, dmodel)
        sd[f"{p}.self_attn.in_proj_bias"] = np.zeros(3 * dmodel, np.float32)
        sd[f"{p}.self_attn.out_proj.weight"] = lin(dmodel, dmodel)
        sd[f"{p}.self_attn.out_proj.bias"] = np.zeros(dmodel, np.float32)
        sd[f"{p}.linear1.weight"] = lin(64, dmodel)
        sd[f"{p}.linear1.bias"] = np.zeros(64, np.float32)
        sd[f"{p}.linear2.weight"] = lin(dmodel, 64)
        sd[f"{p}.linear2.bias"] = np.zeros(dmodel, np.float32)
        for nrm in ("norm1", "norm2"):
            sd[f"{p}.{nrm}.weight"] = np.ones(dmodel, np.float32)
            sd[f"{p}.{nrm}.bias"] = np.zeros(dmodel, np.float32)
    for i in range(2):
        p = f"transformer.decoder.layers.{i}"
        for proj in ("sa_qcontent_proj", "sa_qpos_proj", "sa_kcontent_proj",
                     "sa_kpos_proj", "sa_v_proj", "ca_qcontent_proj",
                     "ca_kcontent_proj", "ca_kpos_proj", "ca_v_proj",
                     "ca_qpos_sine_proj") + (("ca_qpos_proj",) if i == 0 else ()):
            sd[f"{p}.{proj}.weight"] = lin(dmodel, dmodel)
            sd[f"{p}.{proj}.bias"] = np.zeros(dmodel, np.float32)
        sd[f"{p}.self_attn.out_proj.weight"] = lin(dmodel, dmodel)
        sd[f"{p}.self_attn.out_proj.bias"] = np.zeros(dmodel, np.float32)
        sd[f"{p}.cross_attn.out_proj.weight"] = lin(dmodel, dmodel)
        sd[f"{p}.cross_attn.out_proj.bias"] = np.zeros(dmodel, np.float32)
        sd[f"{p}.linear1.weight"] = lin(64, dmodel)
        sd[f"{p}.linear1.bias"] = np.zeros(64, np.float32)
        sd[f"{p}.linear2.weight"] = lin(dmodel, 64)
        sd[f"{p}.linear2.bias"] = np.zeros(dmodel, np.float32)
        for nrm in ("norm1", "norm2", "norm3"):
            sd[f"{p}.{nrm}.weight"] = np.ones(dmodel, np.float32)
            sd[f"{p}.{nrm}.bias"] = np.zeros(dmodel, np.float32)
    for head, layers in (("transformer.decoder.query_scale", [dmodel, dmodel]),
                         ("transformer.decoder.ref_point_head", [dmodel, 2])):
        inp = dmodel
        for li, outp in enumerate(layers):
            sd[f"{head}.layers.{li}.weight"] = lin(outp, inp)
            sd[f"{head}.layers.{li}.bias"] = np.zeros(outp, np.float32)
            inp = outp
    sd["transformer.decoder.norm.weight"] = np.ones(dmodel, np.float32)
    sd["transformer.decoder.norm.bias"] = np.zeros(dmodel, np.float32)
    sd["query_embed.weight"] = lin(8, dmodel)
    sd["queries_embed_refine.0.weight"] = lin(8, dmodel)
    for r in range(2):
        sd[f"class_embed.{r}.weight"] = lin(NCLS + 1, dmodel)
        sd[f"class_embed.{r}.bias"] = np.zeros(NCLS + 1, np.float32)
        inp = dmodel
        for li, outp in enumerate([dmodel, dmodel, 4]):
            sd[f"bbox_embed.{r}.layers.{li}.weight"] = lin(outp, inp)
            sd[f"bbox_embed.{r}.layers.{li}.bias"] = np.zeros(outp, np.float32)
            inp = outp

    from spe_tpu.models.convert import convert_detector

    conv = convert_detector(sd, depth=DEPTH, layer_to_det=L2D, enc_layers=2,
                            dec_layers=2, num_refines=1)
    conv_flat = flax.traverse_util.flatten_dict(conv)
    ref_flat = flax.traverse_util.flatten_dict(ref["params"])
    assert set(conv_flat) == set(ref_flat), sorted(set(ref_flat) ^ set(conv_flat))[:8]
    for k in ref_flat:
        assert ref_flat[k].shape == np.asarray(conv_flat[k]).shape, k
    # converted params run
    out = det.apply({"params": conv}, x)
    assert np.isfinite(np.asarray(out["stages"][0]["pred_logits"])).all()
