"""Torch-checkpoint conversion for the DepthSplat variant.

Maps reference UniMatchDepthSplat state_dict keys (including the torch.hub
DINOv2 ViT under 'pretrained.*') onto unimatch_tpu's flax tree. The base
model's keys (backbone/transformer) reuse unimatch_tpu.convert.

No DepthSplat .pth can be downloaded in this build environment (and the
reference model itself cannot even be constructed offline — its __init__
calls torch.hub), so this mapping is validated structurally: the converted
key set must exactly cover the flax init tree (tests/test_depthsplat.py).
"""

from __future__ import annotations

import re
from typing import Any, Dict, Mapping, Optional, Tuple

import numpy as np

from unimatch_tpu.convert import torch_key_to_flax as base_map, _conv, _linear, _set


def _convtranspose(w: np.ndarray) -> np.ndarray:
    # torch ConvTranspose2d [in, out, kh, kw] -> our [kh, kw, in, out]
    return np.transpose(w, (2, 3, 0, 1))


def _unet_block_map(num_res_blocks: int = 1, num_levels: int = 3, attn_level: int = 2):
    """Map torch UNet sequential indices -> our named modules.

    With channel_mult=[1]*num_levels, num_res_blocks=1, attention at the
    deepest down level (ds==4): torch input_blocks are
      0: conv | per level: ResBlock(+Attn at deepest) | Downsample between.
    """
    down = {}  # torch input_blocks index -> (kind, ourname)
    down[0] = ("conv", "in_conv")
    idx = 1
    blk = 0
    ds = 1
    for level in range(num_levels):
        for _ in range(num_res_blocks):
            down[idx] = ("res", f"down_res_{blk}", "attn" if ds in (4,) else None, f"down_attn_{blk}")
            idx += 1
            blk += 1
        if level != num_levels - 1:
            down[idx] = ("downsample", f"downsample_{level}")
            idx += 1
            ds *= 2
    up = {}
    blk = 0
    for level in reversed(range(num_levels)):
        for i in range(num_res_blocks + 1):
            has_up = level > 0 and i == num_res_blocks
            up[blk] = (f"up_res_{blk}", "attn" if ds in (4,) else None, f"up_attn_{blk}",
                       f"upsample_{level}" if has_up else None)
            if has_up:
                ds //= 2
            blk += 1
    return down, up


def _map_resblock(rest: str, base: str) -> Optional[Tuple[str, str]]:
    m = re.match(r"in_layers\.0\.(weight|bias)$", rest)
    if m:
        return f"{base}/in_norm/{'scale' if m.group(1)=='weight' else 'bias'}", "raw"
    m = re.match(r"in_layers\.2\.(weight|bias)$", rest)
    if m:
        return f"{base}/in_conv/{'kernel' if m.group(1)=='weight' else 'bias'}", (
            "conv" if m.group(1) == "weight" else "raw")
    m = re.match(r"out_layers\.0\.(weight|bias)$", rest)
    if m:
        return f"{base}/out_norm/{'scale' if m.group(1)=='weight' else 'bias'}", "raw"
    m = re.match(r"out_layers\.3\.(weight|bias)$", rest)
    if m:
        return f"{base}/out_conv/{'kernel' if m.group(1)=='weight' else 'bias'}", (
            "conv" if m.group(1) == "weight" else "raw")
    m = re.match(r"skip_connection\.(weight|bias)$", rest)
    if m:
        return f"{base}/skip/{'kernel' if m.group(1)=='weight' else 'bias'}", (
            "conv" if m.group(1) == "weight" else "raw")
    return None


def _map_attnblock(rest: str, base: str) -> Optional[Tuple[str, str]]:
    m = re.match(r"norm\.(weight|bias)$", rest)
    if m:
        return f"{base}/norm/{'scale' if m.group(1)=='weight' else 'bias'}", "raw"
    m = re.match(r"qkv\.(weight|bias)$", rest)
    if m:
        # torch conv1d [3C, C, 1] -> dense [C, 3C]
        return f"{base}/qkv/{'kernel' if m.group(1)=='weight' else 'bias'}", (
            "conv1d" if m.group(1) == "weight" else "raw")
    m = re.match(r"proj_out\.(weight|bias)$", rest)
    if m:
        return f"{base}/proj_out/{'kernel' if m.group(1)=='weight' else 'bias'}", (
            "conv1d" if m.group(1) == "weight" else "raw")
    return None


def _map_unet(rest: str, base: str) -> Optional[Tuple[str, str]]:
    down, up = _unet_block_map()
    m = re.match(r"input_blocks\.0\.0\.(weight|bias)$", rest)
    if m:
        return f"{base}/in_conv/{'kernel' if m.group(1)=='weight' else 'bias'}", (
            "conv" if m.group(1) == "weight" else "raw")
    m = re.match(r"input_blocks\.(\d+)\.(\d+)\.(.*)$", rest)
    if m:
        bi, sub, tail = int(m.group(1)), int(m.group(2)), m.group(3)
        entry = down.get(bi)
        if entry is None:
            return None
        if entry[0] == "downsample":
            mm = re.match(r"op\.(weight|bias)$", tail)
            if mm:
                return f"{base}/{entry[1]}/op/{'kernel' if mm.group(1)=='weight' else 'bias'}", (
                    "conv" if mm.group(1) == "weight" else "raw")
            return None
        if sub == 0:
            return _map_resblock(tail, f"{base}/{entry[1]}")
        return _map_attnblock(tail, f"{base}/{entry[3]}")
    m = re.match(r"middle_block\.(0|2)\.(.*)$", rest)
    if m:
        return _map_resblock(m.group(2), f"{base}/mid_res_{0 if m.group(1)=='0' else 1}")
    m = re.match(r"output_blocks\.(\d+)\.(\d+)\.(.*)$", rest)
    if m:
        bi, sub, tail = int(m.group(1)), int(m.group(2)), m.group(3)
        res_name, has_attn, attn_name, up_name = up[bi]
        if sub == 0:
            return _map_resblock(tail, f"{base}/{res_name}")
        if has_attn and sub == 1:
            return _map_attnblock(tail, f"{base}/{attn_name}")
        # upsample module
        mm = re.match(r"conv\.(weight|bias)$", tail)
        if mm and up_name:
            return f"{base}/{up_name}/conv/{'kernel' if mm.group(1)=='weight' else 'bias'}", (
                "conv" if mm.group(1) == "weight" else "raw")
        return None
    m = re.match(r"out\.0\.(weight|bias)$", rest)
    if m:
        return f"{base}/out_norm/{'scale' if m.group(1)=='weight' else 'bias'}", "raw"
    m = re.match(r"out\.2\.(weight|bias)$", rest)
    if m:
        return f"{base}/out_conv/{'kernel' if m.group(1)=='weight' else 'bias'}", (
            "conv" if m.group(1) == "weight" else "raw")
    return None


def _map_vit(rest: str, base: str = "pretrained") -> Optional[Tuple[str, str]]:
    if rest == "cls_token":
        return f"{base}/cls_token", "raw"
    if rest == "pos_embed":
        return f"{base}/pos_embed", "raw"
    m = re.match(r"patch_embed\.proj\.(weight|bias)$", rest)
    if m:
        # conv14x14 [C, 3, 14, 14] -> matmul kernel [(14*14*3), C] with
        # (ph_pixel, pw_pixel, rgb) row ordering (see DinoViT patch packing)
        return f"{base}/patch_{'kernel' if m.group(1)=='weight' else 'bias'}", (
            "patch" if m.group(1) == "weight" else "raw")
    m = re.match(r"blocks\.(\d+)\.(.*)$", rest)
    if m:
        i, tail = m.group(1), m.group(2)
        bb = f"{base}/block_{i}"
        mm = re.match(r"norm(\d)\.(weight|bias)$", tail)
        if mm:
            return f"{bb}/norm{mm.group(1)}/{'scale' if mm.group(2)=='weight' else 'bias'}", "raw"
        mm = re.match(r"attn\.qkv\.(weight|bias)$", tail)
        if mm:
            return f"{bb}/attn/qkv/{'kernel' if mm.group(1)=='weight' else 'bias'}", (
                "linear" if mm.group(1) == "weight" else "raw")
        mm = re.match(r"attn\.proj\.(weight|bias)$", tail)
        if mm:
            return f"{bb}/attn/proj/{'kernel' if mm.group(1)=='weight' else 'bias'}", (
                "linear" if mm.group(1) == "weight" else "raw")
        mm = re.match(r"ls(\d)\.gamma$", tail)
        if mm:
            return f"{bb}/ls{mm.group(1)}_gamma", "raw"
        mm = re.match(r"mlp\.fc(\d)\.(weight|bias)$", tail)
        if mm:
            return f"{bb}/mlp/fc{mm.group(1)}/{'kernel' if mm.group(2)=='weight' else 'bias'}", (
                "linear" if mm.group(2) == "weight" else "raw")
        return None
    m = re.match(r"norm\.(weight|bias)$", rest)
    if m:
        return f"{base}/norm/{'scale' if m.group(1)=='weight' else 'bias'}", "raw"
    return None


def _map_fpn(rest: str, base: str) -> Optional[Tuple[str, str]]:
    # torch stages.{i} Sequential: deconvs at 0 (and 2 for x4), conv3x3 last
    m = re.match(r"stages\.(\d+)\.(\d+)\.(weight|bias)$", rest)
    if not m:
        return None
    stage, li, wb = int(m.group(1)), int(m.group(2)), m.group(3)
    suffix = "kernel" if wb == "weight" else "bias"
    # sequence layouts: scale2 -> [deconv, gelu, conv]; scale4 -> [deconv, gelu, deconv, gelu, conv]
    if li == 0:
        return f"{base}/stage{stage}_deconv0/{suffix}", ("convT" if wb == "weight" else "raw")
    if li == 2 and wb:  # could be conv (scale2) or second deconv (scale4)
        return f"{base}/stage{stage}_conv/{suffix}", ("conv" if wb == "weight" else "raw")
    if li == 4:
        return f"{base}/stage{stage}_conv/{suffix}", ("conv" if wb == "weight" else "raw")
    return None


def _map_dpt(rest: str, base: str = "upsampler") -> Optional[Tuple[str, str]]:
    m = re.match(r"projects\.(\d)\.(weight|bias)$", rest)
    if m:
        return f"{base}/project_{m.group(1)}/{'kernel' if m.group(2)=='weight' else 'bias'}", (
            "conv" if m.group(2) == "weight" else "raw")
    m = re.match(r"resize_layers\.(\d)\.(weight|bias)$", rest)
    if m:
        i, wb = int(m.group(1)), m.group(2)
        suffix = "kernel" if wb == "weight" else "bias"
        kind = "convT" if wb == "weight" else "raw"
        if i == 0:
            # torch uses ONE ConvTranspose k=4 s=4; ours is two k=2 s=2 —
            # handled specially in convert_depthsplat_state_dict
            return f"{base}/resize_0/{suffix}", kind
        if i == 1:
            return f"{base}/resize_1/{suffix}", kind
        if i == 3:
            return f"{base}/resize_3/{suffix}", ("conv" if wb == "weight" else "raw")
        return None
    m = re.match(r"concat_projects\.(\d)\.(weight|bias)$", rest)
    if m:
        return f"{base}/concat_project_{m.group(1)}/{'kernel' if m.group(2)=='weight' else 'bias'}", (
            "conv" if m.group(2) == "weight" else "raw")
    m = re.match(r"scratch\.layer(\d)_rn\.weight$", rest)
    if m:
        return f"{base}/layer{m.group(1)}_rn/kernel", "conv"
    m = re.match(r"scratch\.refinenet(\d)\.(resConfUnit\d)\.(conv\d)\.(weight|bias)$", rest)
    if m:
        return (
            f"{base}/refinenet{m.group(1)}/{m.group(2)}/{m.group(3)}/"
            f"{'kernel' if m.group(4)=='weight' else 'bias'}",
            "conv" if m.group(4) == "weight" else "raw",
        )
    m = re.match(r"scratch\.refinenet(\d)\.out_conv\.(weight|bias)$", rest)
    if m:
        return f"{base}/refinenet{m.group(1)}/out_conv/{'kernel' if m.group(2)=='weight' else 'bias'}", (
            "conv" if m.group(2) == "weight" else "raw")
    m = re.match(r"scratch\.output_conv\.(0|2)\.(weight|bias)$", rest)
    if m:
        return (
            f"{base}/output_conv_{m.group(1)}/conv/{'kernel' if m.group(2)=='weight' else 'bias'}",
            "conv" if m.group(2) == "weight" else "raw",
        )
    m = re.match(r"scratch\.output_conv\.4\.(weight|bias)$", rest)
    if m:
        return f"{base}/output_conv_4/{'kernel' if m.group(1)=='weight' else 'bias'}", (
            "conv" if m.group(1) == "weight" else "raw")
    return None


def depthsplat_key_to_flax(key: str) -> Optional[Tuple[str, str]]:
    k = key[len("module.") :] if key.startswith("module.") else key

    if k.startswith("backbone.") or k.startswith("transformer."):
        return base_map(k)
    if k.startswith("pretrained."):
        return _map_vit(k[len("pretrained.") :])
    if k.startswith("mv_pyramid."):
        return _map_fpn(k[len("mv_pyramid.") :], "mv_pyramid")
    if k.startswith("mono_pyramid."):
        return _map_fpn(k[len("mono_pyramid.") :], "mono_pyramid")
    m = re.match(r"regressor\.(\d)\.(\d+)\.(.*)$", k)
    if m:
        i, li, tail = m.group(1), int(m.group(2)), m.group(3)
        base = f"regressor_{i}"
        if li == 0:
            wb = tail
            return f"{base}/in_conv/{'kernel' if wb=='weight' else 'bias'}", (
                "conv" if wb == "weight" else "raw")
        if li == 1:
            wb = tail
            return f"{base}/in_norm/{'scale' if wb=='weight' else 'bias'}", "raw"
        if li == 3:
            return _map_unet(tail, f"{base}/unet")
        if li == 4:
            wb = tail
            return f"{base}/out_conv/{'kernel' if wb=='weight' else 'bias'}", (
                "conv" if wb == "weight" else "raw")
        return None
    m = re.match(r"regressor_residual\.(\d)\.(weight|bias)$", k)
    if m:
        return f"regressor_residual_{m.group(1)}/{'kernel' if m.group(2)=='weight' else 'bias'}", (
            "conv" if m.group(2) == "weight" else "raw")
    m = re.match(r"depth_head\.(\d)\.(0|2)\.(weight|bias)$", k)
    if m:
        return (
            f"depth_head_{m.group(1)}/conv_{m.group(2)}/conv/"
            f"{'kernel' if m.group(3)=='weight' else 'bias'}",
            "conv" if m.group(3) == "weight" else "raw",
        )
    if k.startswith("upsampler."):
        return _map_dpt(k[len("upsampler.") :])
    return None


def convert_depthsplat_state_dict(state_dict: Mapping[str, Any]) -> Dict[str, Any]:
    params: Dict[str, Any] = {}
    unmapped = []
    for key, value in state_dict.items():
        arr = value.detach().cpu().numpy() if hasattr(value, "detach") else np.asarray(value)
        mapped = depthsplat_key_to_flax(key)
        if mapped is None:
            unmapped.append(key)
            continue
        path, kind = mapped
        if kind == "conv":
            arr = _conv(arr)
        elif kind == "linear":
            arr = _linear(arr)
        elif kind == "convT":
            arr = _convtranspose(arr)
        elif kind == "conv1d":
            arr = np.transpose(arr[:, :, 0], (1, 0))  # [out, in, 1] -> [in, out]
        elif kind == "patch":
            # [C, 3, 14, 14] -> [(14*14*3), C] with (py, px, rgb) ordering
            c = arr.shape[0]
            arr = np.transpose(arr, (2, 3, 1, 0)).reshape(-1, c)
        _set(params, path, arr)
    if unmapped:
        raise ValueError(f"unmapped torch keys: {unmapped[:20]} (+{max(0,len(unmapped)-20)} more)")
    return params
