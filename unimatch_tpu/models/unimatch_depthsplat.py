"""UniMatchDepthSplat: multi-view depth with a monocular (ViT) prior, NHWC.

Capability parity with reference unimatch/unimatch_depthsplat.py:18-530:
CNN (all scales) + multi-view transformer features at 1/8 (+ ViT feature
pyramids for multi-scale), DINOv2 intermediate layers as the monocular
branch (local JAX ViT — no torch.hub download), coarse-to-fine plane-sweep
cost volumes with per-scale halved depth intervals, concat(cost, cnn, mv,
mono) -> cross-view LDM UNet regressor + residual conv -> softmax depth
head, and a final DPT-head residual upsampler. Always bidirectional
(pred_bidir_depth=True, reference :250).
"""

from __future__ import annotations

import dataclasses
from typing import List, Optional

import jax
import jax.numpy as jnp
import flax.linen as nn

from unimatch_tpu.models.backbone import CNNEncoder
from unimatch_tpu.models.transformer import FeatureTransformer
from unimatch_tpu.models.dpt_head import DPTHead, _replicate_pad_conv
from unimatch_tpu.models.ldm_unet import UNetModel, _group_norm
from unimatch_tpu.models.layers import conv2d, gelu_exact
from unimatch_tpu.models.vit import DinoViT, INTERMEDIATE_LAYER_IDX, VIT_CONFIGS
from unimatch_tpu.models.vit_fpn import ViTFeaturePyramid
from unimatch_tpu.ops.correlation import warp_with_pose_depth_candidates
from unimatch_tpu.ops.geometry import resize_bilinear_align_corners
from unimatch_tpu.ops.position import feature_add_position

_VIT_CHANNELS = {"vits": 384, "vitb": 768, "vitl": 1024}

_DPT_CONFIGS = {
    "vits": dict(in_channels=384, features=32, out_channels=(48, 96, 192, 384)),
    "vitb": dict(in_channels=768, features=48, out_channels=(96, 192, 384, 768)),
    "vitl": dict(in_channels=1024, features=64, out_channels=(128, 256, 512, 1024)),
}


@dataclasses.dataclass(frozen=True)
class DepthSplatConfig:
    num_scales: int = 1
    feature_channels: int = 128
    upsample_factor: int = 8
    num_head: int = 1
    ffn_dim_expansion: int = 4
    num_transformer_layers: int = 6
    num_depth_candidates: int = 128
    vit_type: str = "vits"
    unet_channels: int = 128
    depth_interval_downsample: int = 2


def _interleave_views(x):
    """(v b) batch layout -> (b v): torch rearrange parity (reference :473)."""
    vb = x.shape[0]
    b = vb // 2
    y = x.reshape((2, b) + x.shape[1:])
    return jnp.swapaxes(y, 0, 1).reshape((vb,) + x.shape[1:])


def _deinterleave_views(x):
    vb = x.shape[0]
    b = vb // 2
    y = x.reshape((b, 2) + x.shape[1:])
    return jnp.swapaxes(y, 0, 1).reshape((vb,) + x.shape[1:])


class Regressor(nn.Module):
    """conv -> GN -> GELU -> cross-view UNet -> conv (reference :135-160)."""

    channels: int
    attention_resolutions: tuple
    channel_mult: tuple

    @nn.compact
    def __call__(self, x):
        y = conv2d(self.channels, 3, padding=1, name="in_conv")(x)
        y = _group_norm(self.channels, "in_norm")(y)
        y = gelu_exact(y)
        y = UNetModel(
            model_channels=self.channels,
            out_channels=self.channels,
            num_res_blocks=1,
            attention_resolutions=self.attention_resolutions,
            channel_mult=self.channel_mult,
            num_head_channels=32,
            num_frames=2,
            use_cross_view_self_attn=True,
            name="unet",
        )(y)
        return conv2d(self.channels, 3, padding=1, name="out_conv")(y)


class DepthHead(nn.Module):
    channels: int
    num_depth_candidates: int

    @nn.compact
    def __call__(self, x):
        y = _replicate_pad_conv(self.channels * 2, name="conv_0")(x)
        y = gelu_exact(y)
        return _replicate_pad_conv(self.num_depth_candidates, name="conv_2")(y)


class UniMatchDepthSplat(nn.Module):
    config: DepthSplatConfig = DepthSplatConfig()

    @nn.compact
    def __call__(
        self,
        img0: jnp.ndarray,  # [B, H, W, 3] ImageNet-normalized
        img1: jnp.ndarray,
        intrinsics: jnp.ndarray,  # [B, 3, 3]
        pose: jnp.ndarray,  # [B, 4, 4] relative ref->tgt
        attn_type: str = "swin",
        attn_splits_list=(2,),
        min_depth: float = 1.0 / 10.0,  # inverse depth
        max_depth: float = 1.0 / 0.5,
        training: bool = False,
    ):
        cfg = self.config
        vit_c = _VIT_CHANNELS[cfg.vit_type]
        b, ori_h, ori_w, _ = img0.shape

        # --- CNN features (all scales, high -> low from backbone) ---
        backbone = CNNEncoder(
            output_dim=cfg.feature_channels, num_output_scales=cfg.num_scales,
            return_all_scales=True, name="backbone",
        )
        feats = backbone(jnp.concatenate([img0, img1], axis=0))[::-1]  # low->high
        f0_all = [jnp.split(f, 2, axis=0)[0] for f in feats]
        f1_all = [jnp.split(f, 2, axis=0)[1] for f in feats]

        f0_cnn = f0_all[: cfg.num_scales]
        f1_cnn = f1_all[: cfg.num_scales]

        # --- multi-view transformer features at 1/8 ---
        attn_splits = attn_splits_list[0]
        f0p, f1p = feature_add_position(f0_cnn[0], f1_cnn[0], attn_splits, cfg.feature_channels)
        f0_mv, f1_mv = FeatureTransformer(
            num_layers=cfg.num_transformer_layers, d_model=cfg.feature_channels,
            ffn_dim_expansion=cfg.ffn_dim_expansion, name="transformer",
        )(f0p, f1p, attn_type=attn_type, attn_num_splits=attn_splits)

        if cfg.num_scales > 1:
            mv_pyr = ViTFeaturePyramid(
                cfg.feature_channels, [2.0**i for i in range(cfg.num_scales)], name="mv_pyramid"
            )
            f0_mv_list = mv_pyr(f0_mv)
            f1_mv_list = mv_pyr(f1_mv)
        else:
            f0_mv_list, f1_mv_list = [f0_mv], [f1_mv]

        # --- bidirectional stacking (always on, reference :250) ---
        f0_cnn = [jnp.concatenate([x, y], axis=0) for x, y in zip(f0_cnn, f1_cnn)]
        f0_mv_list, f1_mv_list = (
            [jnp.concatenate([x, y], axis=0) for x, y in zip(f0_mv_list, f1_mv_list)],
            [jnp.concatenate([y, x], axis=0) for x, y in zip(f0_mv_list, f1_mv_list)],
        )
        f0_all_bidir = [jnp.concatenate([x, y], axis=0) for x, y in zip(f0_all, f1_all)]

        # --- monocular ViT features ---
        rh, rw = ori_h // 14 * 14, ori_w // 14 * 14
        concat = jnp.concatenate([img0, img1], axis=0)
        concat = resize_bilinear_align_corners(concat, rh, rw)
        vit = DinoViT(name="pretrained", **VIT_CONFIGS[cfg.vit_type])
        mono_maps = vit(concat, INTERMEDIATE_LAYER_IDX[cfg.vit_type])
        mono_maps = [
            resize_bilinear_align_corners(m, ori_h // 8, ori_w // 8) for m in mono_maps
        ]
        mono = mono_maps[-1]
        if cfg.num_scales > 1:
            mono_list = ViTFeaturePyramid(
                vit_c, [2.0**i for i in range(cfg.num_scales)], name="mono_pyramid"
            )(mono)
        else:
            mono_list = [mono]

        bb = 2 * b  # bidirectional batch
        pose_bidir = jnp.concatenate([pose, jnp.linalg.inv(pose)], axis=0)

        depth = None
        depth_preds: List[jnp.ndarray] = []

        for i in range(cfg.num_scales):
            downsample = cfg.upsample_factor * (2 ** (cfg.num_scales - 1 - i))
            scalemat = jnp.asarray([[1.0 / downsample]] * 2 + [[1.0]], jnp.float32)
            K_curr = jnp.concatenate([intrinsics, intrinsics], axis=0) * scalemat[None]

            num_cand = cfg.num_depth_candidates // (4**i)
            h, w = f0_cnn[i].shape[1:3]

            if i == 0:
                cand = jnp.linspace(min_depth, max_depth, num_cand, dtype=jnp.float32)
                depth_candidates = jnp.broadcast_to(
                    cand[None, :, None, None], (bb, num_cand, h, w)
                )
            else:
                depth = jax.lax.stop_gradient(
                    resize_bilinear_align_corners(depth, h, w)
                )
                interval = (
                    (max_depth - min_depth)
                    / (cfg.num_depth_candidates - 1)
                    / (cfg.depth_interval_downsample**i)
                )
                dmin = jnp.maximum(depth[..., 0] - interval * (num_cand // 2), min_depth)
                dmax = jnp.minimum(depth[..., 0] + interval * (num_cand // 2 - 1), max_depth)
                lin = jnp.linspace(0.0, 1.0, num_cand, dtype=jnp.float32)[None, :, None, None]
                depth_candidates = dmin[:, None] + lin * (dmax - dmin)[:, None]

            warped = warp_with_pose_depth_candidates(
                f1_mv_list[i], K_curr, pose_bidir, 1.0 / depth_candidates
            )  # [2B, D, h, w, C]
            c = warped.shape[-1]
            cost = jnp.einsum(
                "bdhwc,bhwc->bdhw", warped, f0_mv_list[i], preferred_element_type=jnp.float32
            ) / jnp.sqrt(jnp.float32(c))
            cost = cost.transpose(0, 2, 3, 1).astype(f0_mv_list[i].dtype)  # [2B, h, w, D]

            concat_feat = jnp.concatenate(
                [cost, f0_cnn[i], f0_mv_list[i], mono_list[i]], axis=-1
            )

            # cross-view layout (b v) for the UNet's joint attention
            concat_feat = _interleave_views(concat_feat)

            channels = cfg.unet_channels // (2**i)
            attn_res = tuple(4 * (2**j) for j in range(1))  # [4] scaled per scale below
            attn_res = tuple(x * (2**i) for x in (4,))
            channel_mult = tuple([1] * (3 + i))
            out = Regressor(
                channels, attn_res, channel_mult, name=f"regressor_{i}"
            )(concat_feat) + conv2d(channels, 1, name=f"regressor_residual_{i}")(concat_feat)

            out = _deinterleave_views(out)

            logits = DepthHead(channels, num_cand, name=f"depth_head_{i}")(out)
            prob = jax.nn.softmax(logits.astype(jnp.float32), axis=-1)  # over D
            depth = jnp.sum(
                prob * depth_candidates.transpose(0, 2, 3, 1), axis=-1, keepdims=True
            )  # [2B, h, w, 1]

            if training:
                depth_preds.append(
                    resize_bilinear_align_corners(depth, h * downsample, w * downsample)
                )

            if i == cfg.num_scales - 1:
                residual = DPTHead(
                    downsample_factor=cfg.upsample_factor,
                    num_scales=cfg.num_scales,
                    name="upsampler",
                    **_DPT_CONFIGS[cfg.vit_type],
                )(
                    mono_maps,
                    cnn_features=f0_all_bidir[::-1],  # high -> low
                    mv_features=f0_mv_list[0] if cfg.num_scales == 1 else f0_mv_list[::-1],
                    depth=depth,
                )
                up = resize_bilinear_align_corners(
                    depth, h * cfg.upsample_factor, w * cfg.upsample_factor
                )
                depth = jnp.clip(up + residual, min_depth, max_depth)
                depth_preds.append(depth)

        return {"flow_preds": [1.0 / p[..., 0] for p in depth_preds]}
