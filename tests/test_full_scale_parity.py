"""Full-recipe-scale torch-oracle parity for the WHOLE SPEDetector + loss.

The round-1 oracle (test_convert.py) ran at toy dims (D=32, depth 4). This
test reimplements the reference's full forward math in torch at the
published VOC recipe scale — TSCAM_cait_XXS36_Two_Branch (embed 192,
depth 36, heads 4, layer_to_det 24) + Conditional DETR (3 enc, 6 dec,
300 queries, 1 refine) at 512x512 — converts the torch state dict through
models/convert.convert_detector, and requires the JAX detector to reproduce
logits/boxes/CAMs, then the criterion losses, end to end.

Oracle sources (test-side reimplementations, not copies):
  backbone     reference models/cait.py:674-831 (+ InterpolateInitPosEmbed
               :744-759 — exercised here because 512 input != 384 pos grid)
  sine pos     models/position_encoding.py:21-57
  encoder      models/transformer.py:253-310 (post-norm path)
  decoder      models/transformer.py:192-250,313-466 (conditional cross-attn
               at 2*d_model, query_scale, ca_qpos_proj first-layer-only)
  heads        models/conditional_detr.py:68-124
  criterion    via tests/test_criterion._np_reference_losses (scipy exact)
"""

import math

import numpy as np
import pytest

torch = pytest.importorskip("torch")
import torch.nn as nn  # noqa: E402
import torch.nn.functional as F  # noqa: E402

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from spe_tpu.models.cait import CaiTConfig  # noqa: E402
from spe_tpu.models.convert import convert_detector  # noqa: E402
from spe_tpu.models.detector import SPEDetector  # noqa: E402
from test_convert import TorchBlock, TorchCABlock  # noqa: E402

# published VOC recipe scale (scripts/run_voc0712.py:15-41)
D, HEADS, DEPTH, L2D = 192, 4, 36, 24
NCLS, K = 20, 21
P, S = 16, 512
ENC, DEC, NQ, REFINES, FFN = 3, 6, 300, 1, 2048
GRID = S // P  # 32; pos-embed grid is 384//16=24 -> per-forward interp


class TorchBackboneFull(nn.Module):
    """TSCAM_cait_two_branch at recipe scale (cait.py:674-831)."""

    def __init__(self):
        super().__init__()
        self.patch_embed = nn.Sequential()
        self.patch_embed.proj = nn.Conv2d(3, D, P, stride=P)
        n = (384 // P) ** 2
        self.pos_embed = nn.Parameter(torch.randn(1, n, D) * 0.02)
        self.cls_token = nn.Parameter(torch.randn(1, 1, D) * 0.02)
        self.extra_cls_token = nn.Parameter(torch.randn(1, NCLS, D) * 0.02)
        self.blocks = nn.ModuleList([TorchBlock(D, HEADS) for _ in range(DEPTH)])
        self.blocks_det = nn.ModuleList(
            [TorchBlock(D, HEADS) for _ in range(DEPTH - L2D)])
        self.blocks_token_only = nn.ModuleList(
            [TorchCABlock(D, HEADS, 1 + NCLS) for _ in range(2)])
        self.norm = nn.LayerNorm(D, eps=1e-6)
        self.norm_det = nn.LayerNorm(D, eps=1e-6)
        self.cls_head = nn.Linear(D, 1)
        self.cls_head_multi_cls = nn.Linear(D, NCLS)

    def forward(self, x):
        B = x.shape[0]
        x = self.patch_embed.proj(x).flatten(2).transpose(1, 2)
        # per-forward pos-embed interpolation (InterpolateInitPosEmbed,
        # cait.py:744-759): 24x24 grid -> 32x32, bicubic align_corners=False
        n0 = 384 // P
        pos = self.pos_embed.transpose(1, 2).reshape(1, D, n0, n0)
        pos = F.interpolate(pos, size=(GRID, GRID), mode="bicubic",
                            align_corners=False)
        pos = pos.flatten(2).transpose(1, 2)
        x = x + pos
        cls = torch.cat([self.cls_token.expand(B, -1, -1),
                         self.extra_cls_token.expand(B, -1, -1)], dim=1)
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
        return x_logits, x_cls_logits, cam.reshape(B, NCLS, GRID, GRID), x_feat


class OracleMHA(nn.Module):
    """nn.MultiheadAttention-compatible state dict + math (encoder)."""

    def __init__(self, d, nh):
        super().__init__()
        self.nh = nh
        self.in_proj_weight = nn.Parameter(torch.randn(3 * d, d) * 0.02)
        self.in_proj_bias = nn.Parameter(torch.zeros(3 * d))
        self.out_proj = nn.Linear(d, d)

    def forward(self, q, k, v):
        d = q.shape[-1]
        w_q, w_k, w_v = self.in_proj_weight.chunk(3)
        b_q, b_k, b_v = self.in_proj_bias.chunk(3)
        q = F.linear(q, w_q, b_q)
        k = F.linear(k, w_k, b_k)
        v = F.linear(v, w_v, b_v)
        B, Nq, _ = q.shape
        Nk = k.shape[1]
        dh = d // self.nh
        q = q.reshape(B, Nq, self.nh, dh).transpose(1, 2) / math.sqrt(dh)
        k = k.reshape(B, Nk, self.nh, dh).transpose(1, 2)
        v = v.reshape(B, Nk, self.nh, dh).transpose(1, 2)
        attn = (q @ k.transpose(-2, -1)).softmax(-1)
        out = (attn @ v).transpose(1, 2).reshape(B, Nq, d)
        return self.out_proj(out)


class OracleProjFreeMHA(nn.Module):
    """Projection-free MHA (reference models/attention.py:55-175): q/k may
    run at 2*d_model while v/out stay at d_model."""

    def __init__(self, dv, nh):
        super().__init__()
        self.nh = nh
        self.out_proj = nn.Linear(dv, dv)

    def forward(self, q, k, v):
        B, Nq, dq = q.shape
        Nk, dv = k.shape[1], v.shape[-1]
        dqh, dvh = dq // self.nh, dv // self.nh
        qh = q.reshape(B, Nq, self.nh, dqh).transpose(1, 2) / math.sqrt(dqh)
        kh = k.reshape(B, Nk, self.nh, dqh).transpose(1, 2)
        vh = v.reshape(B, Nk, self.nh, dvh).transpose(1, 2)
        attn = (qh @ kh.transpose(-2, -1)).softmax(-1)
        out = (attn @ vh).transpose(1, 2).reshape(B, Nq, dv)
        return self.out_proj(out)


class OracleMLP(nn.Module):
    def __init__(self, dims):  # [in, hidden..., out]
        super().__init__()
        self.layers = nn.ModuleList(
            [nn.Linear(a, b) for a, b in zip(dims[:-1], dims[1:])])

    def forward(self, x):
        for i, l in enumerate(self.layers):
            x = l(x)
            if i < len(self.layers) - 1:
                x = F.relu(x)
        return x


class OracleEncLayer(nn.Module):
    def __init__(self):
        super().__init__()
        self.self_attn = OracleMHA(D, HEADS)
        self.linear1 = nn.Linear(D, FFN)
        self.linear2 = nn.Linear(FFN, D)
        self.norm1 = nn.LayerNorm(D)
        self.norm2 = nn.LayerNorm(D)

    def forward(self, src, pos):
        q = k = src + pos
        src = self.norm1(src + self.self_attn(q, k, src))
        h = self.linear2(F.relu(self.linear1(src)))
        return self.norm2(src + h)


class OracleDecLayer(nn.Module):
    def __init__(self, first):
        super().__init__()
        for name in ("sa_qcontent_proj", "sa_qpos_proj", "sa_kcontent_proj",
                     "sa_kpos_proj", "sa_v_proj", "ca_qcontent_proj",
                     "ca_kcontent_proj", "ca_kpos_proj", "ca_v_proj",
                     "ca_qpos_sine_proj"):
            setattr(self, name, nn.Linear(D, D))
        if first:
            self.ca_qpos_proj = nn.Linear(D, D)
        self.first = first
        self.self_attn = OracleProjFreeMHA(D, HEADS)
        self.cross_attn = OracleProjFreeMHA(D, HEADS)
        self.linear1 = nn.Linear(D, FFN)
        self.linear2 = nn.Linear(FFN, D)
        self.norm1 = nn.LayerNorm(D)
        self.norm2 = nn.LayerNorm(D)
        self.norm3 = nn.LayerNorm(D)

    def forward(self, tgt, memory, pos, query_pos, query_sine_embed):
        q = self.sa_qcontent_proj(tgt) + self.sa_qpos_proj(query_pos)
        k = self.sa_kcontent_proj(tgt) + self.sa_kpos_proj(query_pos)
        tgt = self.norm1(tgt + self.self_attn(q, k, self.sa_v_proj(tgt)))

        q_content = self.ca_qcontent_proj(tgt)
        k_content = self.ca_kcontent_proj(memory)
        v = self.ca_v_proj(memory)
        k_pos = self.ca_kpos_proj(pos)
        if self.first:
            q_content = q_content + self.ca_qpos_proj(query_pos)
            k_content = k_content + k_pos
        B, NQ_, _ = q_content.shape
        HW = memory.shape[1]
        sine = self.ca_qpos_sine_proj(query_sine_embed)
        qq = torch.cat([q_content.reshape(B, NQ_, HEADS, D // HEADS),
                        sine.reshape(B, NQ_, HEADS, D // HEADS)], dim=3
                       ).reshape(B, NQ_, 2 * D)
        kk = torch.cat([k_content.reshape(B, HW, HEADS, D // HEADS),
                        k_pos.reshape(B, HW, HEADS, D // HEADS)], dim=3
                       ).reshape(B, HW, 2 * D)
        tgt = self.norm2(tgt + self.cross_attn(qq, kk, v))
        h = self.linear2(F.relu(self.linear1(tgt)))
        return self.norm3(tgt + h)


def torch_gen_sineembed(pos):
    """gen_sineembed_for_position (transformer.py:35-49, /128 quirk)."""
    scale = 2 * math.pi
    dim_t = torch.arange(D // 2, dtype=torch.float32)
    dim_t = 10000.0 ** (2 * (dim_t // 2) / 128.0)
    out = []
    for j in (1, 0):  # y first, then x (reference cat order)
        e = pos[..., j] * scale
        p = e[..., None] / dim_t
        p = torch.stack([p[..., 0::2].sin(), p[..., 1::2].cos()], dim=-1
                        ).flatten(-2)
        out.append(p)
    return torch.cat(out, dim=-1)


def torch_pos_embedding_sine(B, h, w):
    """PositionEmbeddingSine over an all-valid grid (position_encoding.py:
    21-57, normalize=True)."""
    scale = 2 * math.pi
    not_mask = torch.ones(B, h, w)
    y = not_mask.cumsum(1)
    x = not_mask.cumsum(2)
    y = y / (y[:, -1:, :] + 1e-6) * scale
    x = x / (x[:, :, -1:] + 1e-6) * scale
    npf = D // 2
    dim_t = torch.arange(npf, dtype=torch.float32)
    dim_t = 10000.0 ** (2 * (dim_t // 2) / npf)
    px = x[..., None] / dim_t
    py = y[..., None] / dim_t
    px = torch.stack([px[..., 0::2].sin(), px[..., 1::2].cos()], dim=-1).flatten(-2)
    py = torch.stack([py[..., 0::2].sin(), py[..., 1::2].cos()], dim=-1).flatten(-2)
    return torch.cat([py, px], dim=-1).reshape(B, h * w, D)


class OracleDetector(nn.Module):
    """State-dict layout matches the reference checkpoint keys that
    convert_detector expects (conditional_detr.py:33-124)."""

    def __init__(self):
        super().__init__()
        tr = nn.Module()
        enc = nn.Module()
        enc.layers = nn.ModuleList([OracleEncLayer() for _ in range(ENC)])
        dec = nn.Module()
        dec.layers = nn.ModuleList([OracleDecLayer(i == 0) for i in range(DEC)])
        dec.query_scale = OracleMLP([D, D, D])
        dec.ref_point_head = OracleMLP([D, D, 2])
        dec.norm = nn.LayerNorm(D)
        tr.encoder = enc
        tr.decoder = dec
        self.transformer = tr
        self.query_embed = nn.Embedding(NQ, D)
        self.queries_embed_refine = nn.ModuleList(
            [nn.Embedding(NQ, D) for _ in range(REFINES)])
        self.class_embed = nn.ModuleList(
            [nn.Linear(D, K) for _ in range(REFINES + 1)])
        self.bbox_embed = nn.ModuleList(
            [OracleMLP([D, D, D, 4]) for _ in range(REFINES + 1)])

    def forward(self, feat):
        """feat: (B, HW, D) backbone det features. Returns per-stage
        (logits (L,B,Q,K), boxes (L,B,Q,4))."""
        B, HW, _ = feat.shape
        pos = torch_pos_embedding_sine(B, GRID, GRID)
        memory = feat
        for layer in self.transformer.encoder.layers:
            memory = layer(memory, pos)

        stages = []
        for qe in [self.query_embed.weight] + [
                e.weight for e in self.queries_embed_refine]:
            query_pos = qe[None].expand(B, -1, -1)
            ref = self.transformer.decoder.ref_point_head(query_pos).sigmoid()
            output = torch.zeros_like(query_pos)
            inter = []
            for li, layer in enumerate(self.transformer.decoder.layers):
                pt = 1.0 if li == 0 else self.transformer.decoder.query_scale(output)
                sine = torch_gen_sineembed(ref) * pt
                output = layer(output, memory, pos, query_pos, sine)
                inter.append(self.transformer.decoder.norm(output))
            hs = torch.stack(inter)  # (L, B, Q, D)
            stages.append((hs, ref))

        outs = []
        for r, (hs, ref) in enumerate(stages):
            logits = self.class_embed[r](hs)
            tmp = self.bbox_embed[r](hs)
            ref_inv = torch.log(ref.clamp(1e-5) / (1 - ref).clamp(1e-5))
            tmp = torch.cat([tmp[..., :2] + ref_inv[None], tmp[..., 2:]], dim=-1)
            outs.append((logits, tmp.sigmoid()))
        return outs


@pytest.mark.slow
def test_full_scale_detector_parity(rng):
    torch.manual_seed(7)
    bb = TorchBackboneFull().eval()
    det = OracleDetector().eval()

    sd = {f"backbone.0.body.{k}": v for k, v in bb.state_dict().items()}
    sd.update(det.state_dict())

    params = convert_detector(
        {k: v.detach().numpy() for k, v in sd.items()},
        depth=DEPTH, layer_to_det=L2D, enc_layers=ENC, dec_layers=DEC,
        num_refines=REFINES)

    cfg = CaiTConfig(img_size=384, patch_size=P, embed_dim=D, depth=DEPTH,
                     num_heads=HEADS, num_classes=NCLS, layer_to_det=L2D,
                     depth_token_only=2)
    model = SPEDetector(backbone_cfg=cfg, num_det_classes=K, num_queries=NQ,
                        num_refines=REFINES, enc_layers=ENC, dec_layers=DEC,
                        dim_feedforward=FFN, nheads=HEADS, dropout=0.0)

    x = rng.normal(size=(1, S, S, 3)).astype(np.float32) * 0.5
    out = jax.jit(lambda p, im: model.apply(p, im))({"params": params},
                                                    jnp.asarray(x))

    with torch.no_grad():
        tx = torch.from_numpy(x.transpose(0, 3, 1, 2))
        t_xlog, t_xcls, t_cam, t_feat = bb(tx)
        t_stages = det(t_feat)

    # backbone heads + CAM (exercises the 24->32 pos-embed interpolation)
    np.testing.assert_allclose(np.asarray(out["backbone"]["x_logits"]),
                               t_xlog.numpy(), atol=5e-4)
    np.testing.assert_allclose(np.asarray(out["backbone"]["cams_cls"]),
                               t_cam.numpy(), atol=5e-4)

    for r in range(REFINES + 1):
        t_logits, t_boxes = t_stages[r]
        st = out["stages"][r]
        got_logits = np.concatenate([np.asarray(st["aux_pred_logits"]),
                                     np.asarray(st["pred_logits"])[None]])
        got_boxes = np.concatenate([np.asarray(st["aux_pred_boxes"]),
                                    np.asarray(st["pred_boxes"])[None]])
        np.testing.assert_allclose(got_logits, t_logits.numpy(), atol=2e-3)
        np.testing.assert_allclose(got_boxes, t_boxes.numpy(), atol=2e-4)

    # ---- loss parity on the full-scale outputs (scipy-exact matching) ----
    from test_criterion import _np_reference_losses

    from spe_tpu.train.criterion import set_criterion

    tgt_rng = np.random.default_rng(3)
    T = 8
    targets = {
        "boxes": jnp.asarray(tgt_rng.uniform(0.3, 0.6, (1, T, 4)).astype(np.float32)),
        "labels": jnp.asarray(tgt_rng.integers(1, K - 1, (1, T)).astype(np.int32)),
        "mask": jnp.asarray(np.ones((1, T), bool)),
        "scores": jnp.asarray(np.ones((1, T), np.float32)),
    }
    st0 = out["stages"][0]
    got = set_criterion(
        {k: jnp.asarray(np.asarray(v)) for k, v in st0.items()},
        targets, None, jnp.float32(float(T)),
        assignment="hungarian_cpu", training=False, focal_gamma=2.0)
    want = _np_reference_losses(
        {"pred_logits": st0["pred_logits"], "pred_boxes": st0["pred_boxes"]},
        targets, float(T), K=K)
    for k in ("loss_ce", "loss_bbox", "loss_giou"):
        np.testing.assert_allclose(float(got[k]), want[k], rtol=5e-3)
