"""Typed configuration for unimatch_tpu.

The reference drives everything with argparse flags (main_flow.py:23-134).
Two families exist there and are kept distinct here:

  * ModelConfig — *learnable-architecture* flags that must match a checkpoint
    (num_scales, feature_channels, upsample_factor, num_transformer_layers,
    reg_refine, task).
  * InferenceConfig — *parameter-free* runtime flags tunable per call
    (attn_type, attn_splits_list, corr_radius_list, prop_radius_list,
    num_reg_refine, inference sizes) — cf. reference main_flow.py:60-84.

Both are hashable frozen dataclasses so they can be static jit arguments.
"""

from __future__ import annotations

import dataclasses
from typing import Tuple


@dataclasses.dataclass(frozen=True)
class ModelConfig:
    """Architecture hyper-parameters (reference unimatch.py:17-26)."""

    task: str = "flow"  # 'flow' | 'stereo' | 'depth'
    num_scales: int = 1
    feature_channels: int = 128
    upsample_factor: int = 8
    num_head: int = 1
    ffn_dim_expansion: int = 4
    num_transformer_layers: int = 6
    reg_refine: bool = False

    def __post_init__(self):
        if self.task not in ("flow", "stereo", "depth"):
            raise ValueError(f"unknown task: {self.task}")
        if self.num_head != 1:
            # single-head kept deliberately: reference transformer.py:63-66
            raise NotImplementedError("multi-head attention is not supported")


@dataclasses.dataclass(frozen=True)
class InferenceConfig:
    """Runtime matching parameters (reference main_flow.py:60-84).

    All tuples are per-scale, low-res scale first (matching the reference's
    attn_splits_list / corr_radius_list / prop_radius_list CLI flags).
    """

    attn_type: str = "swin"  # 'swin' | 'self_swin2d_cross_1d' | 'self_swin2d_cross_swin1d' | 'full'
    attn_splits_list: Tuple[int, ...] = (2,)
    corr_radius_list: Tuple[int, ...] = (-1,)
    prop_radius_list: Tuple[int, ...] = (-1,)
    num_reg_refine: int = 1
    # depth-task options. Both bounds are *inverse* depths with min < max:
    # call sites pass min_depth=1/metric_max, max_depth=1/metric_min
    # (reference main_depth.py:369-370; the forward's own defaults are unused).
    min_depth: float = 1.0 / 10.0
    max_depth: float = 1.0 / 0.5
    num_depth_candidates: int = 64
    depth_from_argmax: bool = False


# Canonical flagship configurations, mirroring the reference's MODEL_ZOO
# and scripts/*.sh hyper-parameters.
GMFLOW_SCALE1 = (
    ModelConfig(task="flow", num_scales=1),
    InferenceConfig(attn_splits_list=(2,), corr_radius_list=(-1,), prop_radius_list=(-1,)),
)
GMFLOW_SCALE2 = (
    ModelConfig(task="flow", num_scales=2, upsample_factor=4),
    InferenceConfig(attn_splits_list=(2, 8), corr_radius_list=(-1, 4), prop_radius_list=(-1, 1)),
)
GMFLOW_SCALE2_REGREFINE6 = (
    ModelConfig(task="flow", num_scales=2, upsample_factor=4, reg_refine=True),
    InferenceConfig(
        attn_splits_list=(2, 8),
        corr_radius_list=(-1, 4),
        prop_radius_list=(-1, 1),
        num_reg_refine=6,
    ),
)
GMSTEREO_SCALE1 = (
    ModelConfig(task="stereo", num_scales=1),
    InferenceConfig(
        attn_type="self_swin2d_cross_1d",
        attn_splits_list=(2,),
        corr_radius_list=(-1,),
        prop_radius_list=(-1,),
    ),
)
GMSTEREO_SCALE2_REGREFINE3 = (
    ModelConfig(task="stereo", num_scales=2, upsample_factor=4, reg_refine=True),
    InferenceConfig(
        attn_type="self_swin2d_cross_swin1d",
        attn_splits_list=(2, 8),
        corr_radius_list=(-1, 4),
        prop_radius_list=(-1, 1),
        num_reg_refine=3,
    ),
)
GMDEPTH_SCALE1 = (
    ModelConfig(task="depth", num_scales=1),
    InferenceConfig(attn_splits_list=(2,), corr_radius_list=(-1,), prop_radius_list=(-1,)),
)
GMDEPTH_SCALE1_REGREFINE1 = (
    ModelConfig(task="depth", num_scales=1, reg_refine=True),
    InferenceConfig(
        attn_splits_list=(2,),
        corr_radius_list=(-1,),
        prop_radius_list=(-1,),
        num_reg_refine=1,
    ),
)
