"""DPT fusion head adapted for DepthSplat (flax.linen, NHWC).

Capability parity with reference unimatch/dpt_head.py:220-563: per-level 1x1
projections + resize layers over the 4 ViT intermediate maps, concat
projections that mix in CNN/MV/depth features at matching scales (branch
keyed on downsample_factor x num_scales, :245-343), ResidualConvUnit +
FeatureFusionBlock refinement pyramid (:62-207), and a 3-conv output head
producing the residual depth.
"""

from __future__ import annotations

from typing import List, Optional, Sequence

import jax
import jax.numpy as jnp
import flax.linen as nn

from unimatch_tpu.models.layers import conv2d, gelu_exact
from unimatch_tpu.models.vit_fpn import ConvTransposeK
from unimatch_tpu.ops.geometry import resize_bilinear_align_corners


def _replicate_pad_conv(features: int, name: str):
    """3x3 conv with replicate padding (torch padding_mode='replicate')."""

    class _RepConv(nn.Module):
        @nn.compact
        def __call__(self, x):
            xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)), mode="edge")
            return conv2d(features, 3, padding=0, name="conv")(xp)

    return _RepConv(name=name)


class ResidualConvUnit(nn.Module):
    features: int

    @nn.compact
    def __call__(self, x):
        y = jax.nn.relu(x)
        y = conv2d(self.features, 3, padding=1, name="conv1")(y)
        y = jax.nn.relu(y)
        y = conv2d(self.features, 3, padding=1, name="conv2")(y)
        return x + y


class FeatureFusionBlock(nn.Module):
    features: int
    with_res1: bool = True  # refinenet4 deletes resConfUnit1 (reference :418)

    @nn.compact
    def __call__(self, x0, x1=None, size=None):
        out = x0
        if x1 is not None:
            out = out + ResidualConvUnit(self.features, name="resConfUnit1")(x1)
        out = ResidualConvUnit(self.features, name="resConfUnit2")(out)
        b, h, w, c = out.shape
        if size is None:
            nh, nw = 2 * h, 2 * w
        else:
            nh, nw = size
        out = resize_bilinear_align_corners(out, nh, nw)
        return conv2d(self.features, 1, name="out_conv")(out)


class DPTHead(nn.Module):
    in_channels: int
    features: int = 256
    out_channels: Sequence[int] = (256, 512, 1024, 1024)
    cnn_feature_channels: Sequence[int] = (64, 96, 128)
    downsample_factor: int = 8
    num_scales: int = 1

    @nn.compact
    def __call__(
        self,
        out_features: List[jnp.ndarray],  # 4 ViT maps [B, H/8, W/8, C_vit]
        cnn_features: Optional[List[jnp.ndarray]] = None,  # high -> low res
        mv_features=None,  # [B, h, w, C] or list (high -> low) for num_scales > 1
        depth: Optional[jnp.ndarray] = None,  # [B, h, w, 1] lowest-res inverse depth
    ) -> jnp.ndarray:
        oc = list(self.out_channels)
        ds, ns = self.downsample_factor, self.num_scales

        out = []
        for i, x in enumerate(out_features):
            x = conv2d(oc[i], 1, name=f"project_{i}")(x)
            if i == 0:
                x = ConvTransposeK(oc[0], k=4, name="resize_0")(x)
            elif i == 1:
                x = ConvTransposeK(oc[1], k=2, name="resize_1")(x)
            elif i == 3:
                x = conv2d(oc[3], 3, stride=2, padding=1, name="resize_3")(x)
            out.append(x)
        layer_1, layer_2, layer_3, layer_4 = out  # 1/2, 1/4, 1/8, 1/16

        # concat projections (reference forward :467-523)
        assert depth is not None
        if ds == 4 and ns == 1:
            c1 = jnp.concatenate([cnn_features[0], cnn_features[1], layer_1], axis=-1)
            layer_1 = conv2d(oc[0], 1, name="concat_project_0")(c1)
            c2 = jnp.concatenate([cnn_features[2], layer_2, mv_features, depth], axis=-1)
            layer_2 = conv2d(oc[1], 1, name="concat_project_1")(c2)
            layer_3 = conv2d(oc[2], 1, name="concat_project_2")(layer_3)
        elif ds == 4 and ns == 2:
            c1 = jnp.concatenate([cnn_features[0], layer_1], axis=-1)
            layer_1 = conv2d(oc[0], 1, name="concat_project_0")(c1)
            c2 = jnp.concatenate([cnn_features[1], layer_2, mv_features[0], depth], axis=-1)
            layer_2 = conv2d(oc[1], 1, name="concat_project_1")(c2)
            c3 = jnp.concatenate([cnn_features[2], layer_3, mv_features[1]], axis=-1)
            layer_3 = conv2d(oc[2], 1, name="concat_project_2")(c3)
        elif ds == 2 and ns == 2:
            c1 = jnp.concatenate(
                [cnn_features[0], cnn_features[1], mv_features[0], depth, layer_1], axis=-1
            )
            layer_1 = conv2d(oc[0], 1, name="concat_project_0")(c1)
            c2 = jnp.concatenate([cnn_features[2], layer_2, mv_features[1]], axis=-1)
            layer_2 = conv2d(oc[1], 1, name="concat_project_1")(c2)
            layer_3 = conv2d(oc[2], 1, name="concat_project_2")(layer_3)
        elif ds == 2 and ns == 3:
            c1 = jnp.concatenate([cnn_features[0], mv_features[0], depth, layer_1], axis=-1)
            layer_1 = conv2d(oc[0], 1, name="concat_project_0")(c1)
            c2 = jnp.concatenate([cnn_features[1], layer_2, mv_features[1]], axis=-1)
            layer_2 = conv2d(oc[1], 1, name="concat_project_1")(c2)
            c3 = jnp.concatenate([cnn_features[2], layer_3, mv_features[2]], axis=-1)
            layer_3 = conv2d(oc[2], 1, name="concat_project_2")(c3)
        else:  # default branch (reference :325-343): depth mixed in at 1/8
            c1 = jnp.concatenate([cnn_features[0], layer_1], axis=-1)
            layer_1 = conv2d(oc[0], 1, name="concat_project_0")(c1)
            c2 = jnp.concatenate([cnn_features[1], layer_2], axis=-1)
            layer_2 = conv2d(oc[1], 1, name="concat_project_1")(c2)
            c3 = jnp.concatenate([cnn_features[2], layer_3, mv_features, depth], axis=-1)
            layer_3 = conv2d(oc[2], 1, name="concat_project_2")(c3)

        f = self.features
        l1 = conv2d(f, 3, padding=1, use_bias=False, name="layer1_rn")(layer_1)
        l2 = conv2d(f, 3, padding=1, use_bias=False, name="layer2_rn")(layer_2)
        l3 = conv2d(f, 3, padding=1, use_bias=False, name="layer3_rn")(layer_3)
        l4 = conv2d(f, 3, padding=1, use_bias=False, name="layer4_rn")(layer_4)

        path_4 = FeatureFusionBlock(f, with_res1=False, name="refinenet4")(
            l4, size=l3.shape[1:3]
        )
        path_3 = FeatureFusionBlock(f, name="refinenet3")(path_4, l3, size=l2.shape[1:3])
        path_2 = FeatureFusionBlock(f, name="refinenet2")(path_3, l2, size=l1.shape[1:3])
        path_1 = FeatureFusionBlock(f, name="refinenet1")(path_2, l1)

        y = _replicate_pad_conv(f // 2, name="output_conv_0")(path_1)
        y = gelu_exact(y)
        y = _replicate_pad_conv(16, name="output_conv_2")(y)
        y = gelu_exact(y)
        return conv2d(1, 1, name="output_conv_4")(y)
