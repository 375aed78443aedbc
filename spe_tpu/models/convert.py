"""Torch checkpoint -> JAX params converter.

Converts the reference's released weights into this framework's param tree:
  * DeiT/CaiT pretrained backbones (XXS36_384.pth etc., loaded by the
    reference's timm factories at models/cait.py:1631-1664, with 'module.'
    prefixes stripped) -> CaiTTwoBranch params, including the
    `init_blocks_det_weight` cloning of tail blocks into the det branch
    (cait.py:724-726) when the checkpoint has no det branch;
  * full SPE checkpoints (torch.save {'model': state_dict}, main.py:259-269)
    -> SPEDetector params.

Layout rules:
  * torch Linear weight (out, in) -> flax Dense kernel (in, out): transpose;
  * patch-embed Conv2d weight (D, C, p, p) -> the reshaped-matmul kernel
    (p*p*C, D) with (py, px, c) flattening (see layers.PatchEmbed);
  * talking-heads proj_l/proj_w Linear (H, H) -> transposed mixing matrix
    (our einsum contracts the first index);
  * torch nn.MultiheadAttention in_proj_weight (3D, D) -> q/k/v Dense.
"""

from __future__ import annotations

from typing import Dict

import numpy as np


def _t(w):
    return np.ascontiguousarray(np.asarray(w).T)


def _dense(sd, prefix):
    out = {"kernel": _t(sd[f"{prefix}.weight"])}
    if f"{prefix}.bias" in sd:
        out["bias"] = np.asarray(sd[f"{prefix}.bias"])
    return out


def _layernorm(sd, prefix):
    return {"scale": np.asarray(sd[f"{prefix}.weight"]),
            "bias": np.asarray(sd[f"{prefix}.bias"])}


def _mlp(sd, prefix):
    return {"fc1": _dense(sd, f"{prefix}.fc1"), "fc2": _dense(sd, f"{prefix}.fc2")}


def _talking_heads_attn(sd, prefix):
    return {
        "qkv": _dense(sd, f"{prefix}.qkv"),
        "proj": _dense(sd, f"{prefix}.proj"),
        "proj_l": _t(sd[f"{prefix}.proj_l.weight"]),
        "proj_l_bias": np.asarray(sd[f"{prefix}.proj_l.bias"]),
        "proj_w": _t(sd[f"{prefix}.proj_w.weight"]),
        "proj_w_bias": np.asarray(sd[f"{prefix}.proj_w.bias"]),
    }


def _layerscale_block(sd, prefix):
    return {
        "norm1": _layernorm(sd, f"{prefix}.norm1"),
        "norm2": _layernorm(sd, f"{prefix}.norm2"),
        "attn": _talking_heads_attn(sd, f"{prefix}.attn"),
        "mlp": _mlp(sd, f"{prefix}.mlp"),
        "gamma_1": np.asarray(sd[f"{prefix}.gamma_1"]),
        "gamma_2": np.asarray(sd[f"{prefix}.gamma_2"]),
    }


def _class_attn_block(sd, prefix):
    return {
        "norm1": _layernorm(sd, f"{prefix}.norm1"),
        "norm2": _layernorm(sd, f"{prefix}.norm2"),
        "attn": {
            "q": _dense(sd, f"{prefix}.attn.q"),
            "k": _dense(sd, f"{prefix}.attn.k"),
            "v": _dense(sd, f"{prefix}.attn.v"),
            "proj": _dense(sd, f"{prefix}.attn.proj"),
        },
        "mlp": _mlp(sd, f"{prefix}.mlp"),
        "gamma_1": np.asarray(sd[f"{prefix}.gamma_1"]),
        "gamma_2": np.asarray(sd[f"{prefix}.gamma_2"]),
    }


def _patch_embed(sd, prefix):
    w = np.asarray(sd[f"{prefix}.proj.weight"])  # (D, C, p, p)
    d, c, p, _ = w.shape
    kernel = w.transpose(2, 3, 1, 0).reshape(p * p * c, d)
    out = {"proj": {"kernel": kernel}}
    if f"{prefix}.proj.bias" in sd:
        out["proj"]["bias"] = np.asarray(sd[f"{prefix}.proj.bias"])
    return out


def convert_backbone(sd: Dict[str, "np.ndarray"], depth: int, layer_to_det: int,
                     depth_token_only: int = 2,
                     strip_module_prefix: bool = True,
                     two_branch: bool = True) -> Dict:
    """Torch TSCAM_cait_two_branch (or plain CaiT) state dict -> CaiTTwoBranch
    params['params'] subtree."""
    if strip_module_prefix:
        sd = {k[len("module."):] if k.startswith("module.") else k: v
              for k, v in sd.items()}
    sd = {k: np.asarray(v) for k, v in sd.items()}

    params: Dict = {
        "patch_embed": _patch_embed(sd, "patch_embed"),
        "pos_embed": np.asarray(sd["pos_embed"]),
        "cls_token": np.asarray(sd["cls_token"]),
        "norm": _layernorm(sd, "norm"),
    }
    for i in range(depth):
        params[f"blocks_{i}"] = _layerscale_block(sd, f"blocks.{i}")
    n_det = (depth - layer_to_det) if two_branch else 0
    for i in range(n_det):
        src = (f"blocks_det.{i}" if f"blocks_det.{i}.norm1.weight" in sd
               # pretrained classification checkpoints have no det branch:
               # clone from the tail blocks (init_blocks_det_weight,
               # cait.py:724-726: blocks_det[-j] <- blocks[-j])
               else f"blocks.{layer_to_det + i}")
        params[f"blocks_det_{i}"] = _layerscale_block(sd, src)
    if two_branch and "norm_det.weight" in sd:
        params["norm_det"] = _layernorm(sd, "norm_det")
    if not two_branch and "norm_to_det.weight" in sd:
        params["norm_to_det"] = _layernorm(sd, "norm_to_det")
    if not two_branch and "norm_to_det.weight" not in sd and "norm.weight" in sd:
        # pretrained classification checkpoints: seed norm_to_det from norm
        params["norm_to_det"] = _layernorm(sd, "norm")
    for i in range(depth_token_only):
        if f"blocks_token_only.{i}.norm1.weight" in sd:
            params[f"blocks_token_only_{i}"] = _class_attn_block(
                sd, f"blocks_token_only.{i}")
    for name in ("extra_cls_token",):
        if name in sd:
            params[name] = np.asarray(sd[name])
    if "cls_head.weight" in sd:
        params["cls_head"] = _dense(sd, "cls_head")
    if "cls_head_multi_cls.weight" in sd:
        params["cls_head_multi_cls"] = _dense(sd, "cls_head_multi_cls")
    return params


def _torch_mha(sd, prefix):
    """nn.MultiheadAttention -> our MultiheadAttention (q/k/v/out Dense)."""
    w = np.asarray(sd[f"{prefix}.in_proj_weight"])  # (3D, D)
    b = np.asarray(sd[f"{prefix}.in_proj_bias"])
    d = w.shape[1]
    out = {}
    for i, name in enumerate(("q_proj", "k_proj", "v_proj")):
        out[name] = {"kernel": _t(w[i * d:(i + 1) * d]),
                     "bias": b[i * d:(i + 1) * d]}
    out["out_proj"] = _dense(sd, f"{prefix}.out_proj")
    return out


def _proj_free_attn_out(sd, prefix):
    """reference models/attention.py MultiheadAttention (projection-free):
    only out_proj carries weights."""
    return {"out_proj": _dense(sd, f"{prefix}.out_proj")}


def _mlp_layers(sd, prefix, n):
    return {f"layers_{i}": _dense(sd, f"{prefix}.layers.{i}") for i in range(n)}


def convert_detector(sd: Dict[str, "np.ndarray"], *, depth: int, layer_to_det: int,
                     enc_layers: int, dec_layers: int, num_refines: int,
                     depth_token_only: int = 2) -> Dict:
    """Full SPE checkpoint state dict -> SPEDetector params['params']."""
    sd = {k: np.asarray(v) for k, v in sd.items()}
    bb_sd = {k[len("backbone.0.body."):]: v for k, v in sd.items()
             if k.startswith("backbone.0.body.")}
    params: Dict = {
        "backbone": convert_backbone(bb_sd, depth, layer_to_det,
                                     depth_token_only, strip_module_prefix=False),
    }

    tr: Dict = {}
    for i in range(enc_layers):
        p = f"transformer.encoder.layers.{i}"
        tr[f"encoder_layers_{i}"] = {
            "self_attn": _torch_mha(sd, f"{p}.self_attn"),
            "linear1": _dense(sd, f"{p}.linear1"),
            "linear2": _dense(sd, f"{p}.linear2"),
            "norm1": _layernorm(sd, f"{p}.norm1"),
            "norm2": _layernorm(sd, f"{p}.norm2"),
        }
    dec: Dict = {
        "query_scale": _mlp_layers(sd, "transformer.decoder.query_scale", 2),
        "ref_point_head": _mlp_layers(sd, "transformer.decoder.ref_point_head", 2),
        "norm": _layernorm(sd, "transformer.decoder.norm"),
    }
    for i in range(dec_layers):
        p = f"transformer.decoder.layers.{i}"
        layer = {
            "self_attn": _proj_free_attn_out(sd, f"{p}.self_attn"),
            "cross_attn": _proj_free_attn_out(sd, f"{p}.cross_attn"),
            "linear1": _dense(sd, f"{p}.linear1"),
            "linear2": _dense(sd, f"{p}.linear2"),
            "norm1": _layernorm(sd, f"{p}.norm1"),
            "norm2": _layernorm(sd, f"{p}.norm2"),
            "norm3": _layernorm(sd, f"{p}.norm3"),
        }
        for proj in ("sa_qcontent_proj", "sa_qpos_proj", "sa_kcontent_proj",
                     "sa_kpos_proj", "sa_v_proj", "ca_qcontent_proj",
                     "ca_kcontent_proj", "ca_kpos_proj", "ca_v_proj",
                     "ca_qpos_sine_proj"):
            layer[proj] = _dense(sd, f"{p}.{proj}")
        if i == 0:  # ca_qpos_proj exists only on the first layer
            layer["ca_qpos_proj"] = _dense(sd, f"{p}.ca_qpos_proj")
        dec[f"layers_{i}"] = layer
    tr["decoder"] = dec
    tr["query_embed"] = np.asarray(sd["query_embed.weight"])
    for r in range(num_refines):
        tr[f"query_embed_refine_{r}"] = np.asarray(sd[f"queries_embed_refine.{r}.weight"])
    params["transformer"] = tr

    for r in range(num_refines + 1):
        params[f"class_embed_{r}"] = _dense(sd, f"class_embed.{r}")
        params[f"bbox_embed_{r}"] = _mlp_layers(sd, f"bbox_embed.{r}", 3)
    return params


def load_torch_checkpoint(path) -> Dict[str, "np.ndarray"]:
    """torch.load on CPU -> {key: np.ndarray}; accepts {'model': sd} dumps."""
    import torch

    ckpt = torch.load(path, map_location="cpu", weights_only=False)
    sd = ckpt.get("model", ckpt) if isinstance(ckpt, dict) else ckpt
    return {k: v.numpy() if hasattr(v, "numpy") else np.asarray(v)
            for k, v in sd.items()}


def merge_pretrained_backbone(init_backbone: Dict, converted: Dict,
                              verbose: bool = True) -> Dict:
    """Merge a converted (possibly classification-pretrained) backbone tree
    into freshly initialized backbone params.

    Semantics of the reference's timm `pretrained=True` + finetune_det
    (cait.py:1676-1700, 728-742): copy every leaf whose path exists in both
    trees; interpolate pos_embed bicubically when the grids differ; keep the
    init for everything the checkpoint lacks (extra_cls_token, cls heads,
    Multi_Class_Attention blocks of a plain CaiT checkpoint). Shape-mismatched
    leaves other than pos_embed are skipped with a warning.
    """
    import flax

    from spe_tpu.models.layers import interpolate_pos_embed

    flat_init = flax.traverse_util.flatten_dict(init_backbone)
    flat_new = flax.traverse_util.flatten_dict(converted)
    merged, copied, skipped = {}, 0, []
    for k, v in flat_init.items():
        if k not in flat_new:
            merged[k] = v
            continue
        cand = np.asarray(flat_new[k])
        if cand.shape == v.shape:
            merged[k] = cand.astype(np.asarray(v).dtype)
            copied += 1
        elif k == ("pos_embed",):
            n_src = int(round(cand.shape[1] ** 0.5))
            n_dst = int(round(v.shape[1] ** 0.5))
            merged[k] = np.asarray(interpolate_pos_embed(
                cand, (n_src, n_src), (n_dst, n_dst))).astype(
                np.asarray(v).dtype).reshape(v.shape)
            copied += 1
        else:
            merged[k] = v
            skipped.append(("/".join(k), cand.shape, np.asarray(v).shape))
    if verbose:
        print(f"pretrained backbone: copied {copied}/{len(flat_init)} leaves"
              + (f", skipped shape-mismatched {skipped}" if skipped else ""))
    return flax.traverse_util.unflatten_dict(merged)


# ---------------------------------------------------------------------------
# Known pretrained-checkpoint URLs (reference models/cait.py:1335-1948: each
# timm factory downloads its DeiT/CaiT classification checkpoint from
# fbaipublicfiles). `--backbone_weights auto` resolves through this table so
# an environment with egress needs zero manual steps.
# ---------------------------------------------------------------------------

PRETRAINED_URLS = {
    # two-branch factories init from the same classification checkpoints
    # (the det branch is then cloned from the tail blocks, cait.py:724-726)
    "TSCAM_cait_XXS24_Two_Branch": "https://dl.fbaipublicfiles.com/deit/XXS24_384.pth",
    "TSCAM_cait_XXS36_Two_Branch": "https://dl.fbaipublicfiles.com/deit/XXS36_384.pth",
    "TSCAM_cait_XS24_Two_Branch": "https://dl.fbaipublicfiles.com/deit/XS24_384.pth",
    "TSCAM_cait_S24_Two_Branch": "https://dl.fbaipublicfiles.com/deit/S24_384.pth",
    "TSCAM_cait_S36_Two_Branch": "https://dl.fbaipublicfiles.com/deit/S36_384.pth",
    "TSCAM_cait_M36_Two_Branch": "https://dl.fbaipublicfiles.com/deit/M36_384.pth",
    "TSCAM_cait_M48_Two_Branch": "https://dl.fbaipublicfiles.com/deit/M48_448.pth",
    "TSCAM_cait_XXS24": "https://dl.fbaipublicfiles.com/deit/XXS24_384.pth",
    "TSCAM_cait_XXS36": "https://dl.fbaipublicfiles.com/deit/XXS36_384.pth",
    "TSCAM_cait_XXS24_224": "https://dl.fbaipublicfiles.com/deit/XXS24_224.pth",
    "TSCAM_cait_XXS36_224": "https://dl.fbaipublicfiles.com/deit/XXS36_224.pth",
    "TSCAM_cait_XXS24_224_Two_Branch": "https://dl.fbaipublicfiles.com/deit/XXS24_224.pth",
    "TSCAM_cait_XS24": "https://dl.fbaipublicfiles.com/deit/XS24_384.pth",
    "TSCAM_cait_S24_224": "https://dl.fbaipublicfiles.com/deit/S24_224.pth",
    "TSCAM_cait_S24": "https://dl.fbaipublicfiles.com/deit/S24_384.pth",
    "TSCAM_cait_S36": "https://dl.fbaipublicfiles.com/deit/S36_384.pth",
    "TSCAM_cait_M36": "https://dl.fbaipublicfiles.com/deit/M36_384.pth",
    "TSCAM_cait_M48": "https://dl.fbaipublicfiles.com/deit/M48_448.pth",
}


def resolve_backbone_weights(backbone_weights: str, backbone: str) -> str:
    """'auto' -> the published URL for `backbone`; anything else unchanged."""
    if backbone_weights != "auto":
        return backbone_weights
    if backbone not in PRETRAINED_URLS:
        raise KeyError(
            f"no known pretrained checkpoint for backbone '{backbone}'; "
            f"have {sorted(PRETRAINED_URLS)} — pass an explicit path/URL")
    return PRETRAINED_URLS[backbone]
