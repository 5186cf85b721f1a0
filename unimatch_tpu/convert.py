"""Convert reference PyTorch UniMatch checkpoints (.pth) to flax param pytrees.

The reference ships checkpoints as torch state_dicts (MODEL_ZOO.md). This
module maps those tensors onto unimatch_tpu's NHWC/flax parameter tree:

  conv weights   OIHW -> HWIO
  linear weights [out, in] -> [in, out]
  layer norms    weight/bias -> scale/bias

Torch is only needed when actually loading a .pth file; the name mapping is
pure. Conversion is exact (no re-training), enabling activation-level parity
tests and checkpoint reuse (the reference's cross-task warm-start workflow).
"""

from __future__ import annotations

import re
from typing import Any, Dict, Mapping

import numpy as np

def _conv(w: np.ndarray) -> np.ndarray:
    return np.transpose(w, (2, 3, 1, 0))  # OIHW -> HWIO


def _linear(w: np.ndarray) -> np.ndarray:
    return np.transpose(w, (1, 0))


def _set(tree: Dict[str, Any], path: str, value: np.ndarray) -> None:
    parts = path.split("/")
    node = tree
    for p in parts[:-1]:
        node = node.setdefault(p, {})
    node[parts[-1]] = value


def torch_key_to_flax(key: str) -> tuple[str, str] | None:
    """Map one torch state_dict key to (flax_path, kind).

    kind is one of 'conv', 'linear', 'norm', 'bias', 'raw'.
    Returns None for keys with no parameters on our side.
    """
    k = key
    # DDP prefix
    if k.startswith("module."):
        k = k[len("module.") :]

    # --- backbone ---
    m = re.match(r"backbone\.conv1\.(weight|bias)$", k)
    if m:
        return f"backbone/conv1/{'kernel' if m.group(1) == 'weight' else 'bias'}", (
            "conv" if m.group(1) == "weight" else "bias"
        )
    m = re.match(r"backbone\.layer(\d)\.(\d)\.(conv1|conv2)\.(weight)$", k)
    if m:
        return f"backbone/layer{m.group(1)}_{m.group(2)}/{m.group(3)}/kernel", "conv"
    m = re.match(r"backbone\.layer(\d)\.(\d)\.downsample\.0\.(weight|bias)$", k)
    if m:
        suffix = "kernel" if m.group(3) == "weight" else "bias"
        return f"backbone/layer{m.group(1)}_{m.group(2)}/downsample/{suffix}", (
            "conv" if m.group(3) == "weight" else "bias"
        )
    m = re.match(r"backbone\.conv2\.(weight|bias)$", k)
    if m:
        suffix = "kernel" if m.group(1) == "weight" else "bias"
        return f"backbone/conv2/{suffix}", ("conv" if m.group(1) == "weight" else "bias")
    if k == "backbone.trident_conv.weight":
        return "backbone/trident_conv/kernel", "conv"

    # --- transformer ---
    m = re.match(
        r"transformer\.layers\.(\d+)\.(self_attn|cross_attn_ffn)\.(q_proj|k_proj|v_proj|merge)\.weight$",
        k,
    )
    if m:
        return f"transformer/block_{m.group(1)}/{m.group(2)}/{m.group(3)}/kernel", "linear"
    m = re.match(
        r"transformer\.layers\.(\d+)\.(self_attn|cross_attn_ffn)\.norm(\d)\.(weight|bias)$", k
    )
    if m:
        suffix = "scale" if m.group(4) == "weight" else "bias"
        return f"transformer/block_{m.group(1)}/{m.group(2)}/norm{m.group(3)}/{suffix}", (
            "norm" if m.group(4) == "weight" else "bias"
        )
    m = re.match(r"transformer\.layers\.(\d+)\.(self_attn|cross_attn_ffn)\.mlp\.(0|2)\.weight$", k)
    if m:
        return f"transformer/block_{m.group(1)}/{m.group(2)}/mlp_{m.group(3)}/kernel", "linear"

    # --- propagation ---
    m = re.match(r"feature_flow_attn\.(q_proj|k_proj)\.(weight|bias)$", k)
    if m:
        suffix = "kernel" if m.group(2) == "weight" else "bias"
        return f"feature_flow_attn/{m.group(1)}/{suffix}", (
            "linear" if m.group(2) == "weight" else "bias"
        )

    # --- upsampler head ---
    m = re.match(r"upsampler\.(0|2)\.(weight|bias)$", k)
    if m:
        suffix = "kernel" if m.group(2) == "weight" else "bias"
        return f"upsampler/conv_{m.group(1)}/{suffix}", (
            "conv" if m.group(2) == "weight" else "bias"
        )

    # --- refinement ---
    m = re.match(r"refine_proj\.(weight|bias)$", k)
    if m:
        suffix = "kernel" if m.group(1) == "weight" else "bias"
        return f"refine_proj/{suffix}", ("conv" if m.group(1) == "weight" else "bias")
    m = re.match(
        r"refine\.encoder\.(convc1|convc2|convf1|convf2|conv)\.(weight|bias)$", k
    )
    if m:
        suffix = "kernel" if m.group(2) == "weight" else "bias"
        return f"refine/encoder/{m.group(1)}/{suffix}", (
            "conv" if m.group(2) == "weight" else "bias"
        )
    m = re.match(r"refine\.gru\.(conv[zrq][12])\.(weight|bias)$", k)
    if m:
        suffix = "kernel" if m.group(2) == "weight" else "bias"
        return f"refine/gru/{m.group(1)}/{suffix}", ("conv" if m.group(2) == "weight" else "bias")
    m = re.match(r"refine\.flow_head\.(conv1|conv2)\.(weight|bias)$", k)
    if m:
        suffix = "kernel" if m.group(2) == "weight" else "bias"
        return f"refine/flow_head/{m.group(1)}/{suffix}", (
            "conv" if m.group(2) == "weight" else "bias"
        )
    m = re.match(r"refine\.mask\.(0|2)\.(weight|bias)$", k)
    if m:
        suffix = "kernel" if m.group(2) == "weight" else "bias"
        return f"refine/mask_{m.group(1)}/{suffix}", ("conv" if m.group(2) == "weight" else "bias")

    return None


def convert_state_dict(state_dict: Mapping[str, Any]) -> Dict[str, Any]:
    """torch state_dict (tensors or numpy arrays) -> flax params dict."""
    params: Dict[str, Any] = {}
    unmapped = []
    for key, value in state_dict.items():
        arr = value.detach().cpu().numpy() if hasattr(value, "detach") else np.asarray(value)
        mapped = torch_key_to_flax(key)
        if mapped is None:
            unmapped.append(key)
            continue
        path, kind = mapped
        if kind == "conv":
            arr = _conv(arr)
        elif kind == "linear":
            arr = _linear(arr)
        _set(params, path, arr)
    if unmapped:
        raise ValueError(f"unmapped torch keys: {unmapped}")
    return params


def load_torch_checkpoint(path: str) -> Dict[str, Any]:
    """Load a reference .pth checkpoint file into a flax params dict."""
    import torch

    ckpt = torch.load(path, map_location="cpu", weights_only=False)
    state = ckpt.get("model", ckpt) if isinstance(ckpt, dict) else ckpt
    return convert_state_dict(state)
