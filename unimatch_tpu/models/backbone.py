"""CNN feature extractor (flax.linen, NHWC).

Capability parity with the reference encoder (unimatch/backbone.py:39-133):
a 7x7 stride-2 stem + three 2-residual-block stages [64, 96, 128] with
instance norm, a 1x1 projection, and — for multi-scale models — a
weight-shared multi-stride "trident" conv (trident_conv.py:10-91) emitting
one feature map per scale from the single highest-resolution map.

TPU-native choices: NHWC layout throughout (XLA's preferred conv layout);
the trident conv is one parameter applied N times with different strides,
each application an MXU-tiled convolution.
"""

from __future__ import annotations

import os
from typing import List, Sequence

import jax
import jax.numpy as jnp
import flax.linen as nn

from unimatch_tpu.models.layers import conv2d, instance_norm, conv_kaiming_init


def _fused_in() -> bool:
    """Fused conv+IN(+relu) (f32-accumulator statistics, no bf16 round-trip
    between conv and norm). Default OFF: the on-chip interleaved A/B
    (round 3, docs/PERF_NOTES.md) measured the fused form ~9% slower for the
    full backbone — handing the f32 accumulator to the norm doubles the
    conv's output write traffic, which costs more than the saved bf16
    round-trip. Numerics are identical in f32 either way; UNIMATCH_FUSE_IN=1
    re-enables the fused form (slightly more accurate in bf16 since the norm
    sees the un-rounded accumulator) for measurement."""
    return os.environ.get("UNIMATCH_FUSE_IN", "0") != "0"


def _conv_in(x, planes, *, stride=1, kernel=3, padding=1, dilation=1,
             use_bias=False, act=None, name=None):
    """conv -> instance norm -> act, fused when enabled (dilation 1 only —
    the dilated path runs lax.conv which keeps its own layout)."""
    if _fused_in() and dilation == 1:
        return conv2d(planes, kernel, stride=stride, padding=padding,
                      use_bias=use_bias, norm="instance", act=act,
                      prefer_lax=True, name=name)(x)
    y = conv2d(planes, kernel, stride=stride, padding=padding, dilation=dilation,
               use_bias=use_bias, prefer_lax=True, name=name)(x)
    y = instance_norm(y)
    return jax.nn.relu(y) if act == "relu" else y


class ResidualBlock(nn.Module):
    """conv3x3 -> IN -> relu -> conv3x3 -> IN -> relu, additive skip.

    Reference semantics: backbone.py:6-36 (norms have no affine params).

    Two fused Pallas forms of this block were built and measured-negative on
    chip (round 3 conv_banded: 15.3 vs 10.5 ms full backbone; round 5
    conv_in_fused: 15.3 vs 11.4 flagship, 9.2 vs 6.0 depth — the norm
    statistics side-outputs break the grid pipeline's overlap). Both deleted;
    docs/PERF_NOTES.md keeps the records.
    """

    planes: int
    stride: int = 1
    dilation: int = 1

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        in_planes = x.shape[-1]
        y = _conv_in(x, self.planes, stride=self.stride, padding=self.dilation,
                     dilation=self.dilation, act="relu", name="conv1")
        y = _conv_in(y, self.planes, padding=self.dilation,
                     dilation=self.dilation, act="relu", name="conv2")

        if self.stride != 1 or in_planes != self.planes:
            x = _conv_in(x, self.planes, kernel=1, stride=self.stride,
                         padding=0, use_bias=True, name="downsample")
        return jax.nn.relu(x + y)


class TridentConv(nn.Module):
    """One shared 3x3 kernel applied at multiple strides (multi-scale branches).

    Reference semantics: trident_conv.py:52-72 (weight shared across branches,
    no bias, same padding).
    """

    features: int
    strides: Sequence[int]

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> List[jnp.ndarray]:
        in_ch = x.shape[-1]
        kernel = self.param("kernel", conv_kaiming_init, (3, 3, in_ch, self.features))
        outs = []
        for s in self.strides:
            outs.append(
                jax.lax.conv_general_dilated(
                    x,
                    kernel.astype(x.dtype),
                    window_strides=(s, s),
                    padding=[(1, 1), (1, 1)],
                    dimension_numbers=("NHWC", "HWIO", "NHWC"),
                )
            )
        return outs  # high resolution to low


class CNNEncoder(nn.Module):
    """6-residual-block encoder; returns per-scale features, low-res first.

    output scales: num_output_scales==1 -> [1/8]; ==2 -> [1/8, 1/4] via
    trident conv on the 1/4 map. return_all_scales -> [1/2, 1/4, 1/8 proj]
    (high->low, used by the DepthSplat variant).
    """

    output_dim: int = 128
    num_output_scales: int = 1
    return_all_scales: bool = False

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> List[jnp.ndarray]:
        feature_dims = (64, 96, 128)
        all_scales: List[jnp.ndarray] = []

        x = _conv_in(x, feature_dims[0], kernel=7, stride=2, padding=3,
                     act="relu", name="conv1")

        # stage 1 (1/2)
        x = ResidualBlock(feature_dims[0], stride=1, name="layer1_0")(x)
        x = ResidualBlock(feature_dims[0], stride=1, name="layer1_1")(x)
        if self.return_all_scales:
            all_scales.append(x)

        # stage 2 (1/4)
        x = ResidualBlock(feature_dims[1], stride=2, name="layer2_0")(x)
        x = ResidualBlock(feature_dims[1], stride=1, name="layer2_1")(x)
        if self.return_all_scales:
            all_scales.append(x)

        # stage 3: highest output res is 1/4 for multi-scale, else 1/8
        stride3 = 2 if (self.num_output_scales == 1 or self.return_all_scales) else 1
        x = ResidualBlock(feature_dims[2], stride=stride3, name="layer3_0")(x)
        x = ResidualBlock(feature_dims[2], stride=1, name="layer3_1")(x)

        x = conv2d(self.output_dim, 1, name="conv2")(x)

        if self.return_all_scales:
            all_scales.append(x)
            return all_scales  # high -> low resolution

        if self.num_output_scales > 1:
            strides = {2: (1, 2), 3: (1, 2, 4), 4: (1, 2, 4, 8)}[self.num_output_scales]
            out = TridentConv(self.output_dim, strides, name="trident_conv")(x)
        else:
            out = [x]
        # reverse: low resolution first (matches UniMatch's scale loop order)
        return out[::-1]
