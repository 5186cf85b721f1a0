"""Stable-Diffusion-style UNet (timestep-free) cost-volume regressor, NHWC.

Capability parity with reference unimatch/ldm_unet/unet.py as configured by
UniMatchDepthSplat (unimatch_depthsplat.py:141-156): pre-norm ResBlocks
(GroupNorm(8) + SiLU + conv3x3, zero-initialized second conv), conv
downsample / nearest-upsample+conv, self-attention at the configured
resolutions with **cross-view attention** — the two views' tokens are merged
into one sequence so both attend jointly (unet.py:536-569's
'(b v) n t -> b n (v t)' rearrange) — and a zero-initialized output conv.
"""

from __future__ import annotations

from typing import List, Sequence

import jax
import jax.numpy as jnp
import flax.linen as nn

from unimatch_tpu.models.layers import conv2d


def _group_norm(ch: int, name: str):
    groups = 8 if ch % 8 == 0 else 4
    return nn.GroupNorm(num_groups=groups, epsilon=1e-5, name=name)


class ResBlock(nn.Module):
    out_channels: int

    @nn.compact
    def __call__(self, x):
        cin = x.shape[-1]
        h = _group_norm(cin, "in_norm")(x)
        h = jax.nn.silu(h)
        h = conv2d(self.out_channels, 3, padding=1, name="in_conv")(h)
        h = _group_norm(self.out_channels, "out_norm")(h)
        h = jax.nn.silu(h)
        h = conv2d(self.out_channels, 3, padding=1,
                   kernel_init=nn.initializers.zeros, name="out_conv")(h)
        if cin != self.out_channels:
            x = conv2d(self.out_channels, 1, name="skip")(x)
        return x + h


class CrossViewAttentionBlock(nn.Module):
    """Multi-head self-attention; with cross_view, both views form one
    sequence (batch is [B*V, H, W, C] with V=2, view-major like the torch
    '(b v)' layout after UniMatchDepthSplat's rearrange)."""

    channels: int
    num_head_channels: int = 32
    num_frames: int = 2
    cross_view: bool = True

    @nn.compact
    def __call__(self, x):
        bv, h, w, c = x.shape
        heads = c // self.num_head_channels
        hd = self.num_head_channels

        y = _group_norm(c, "norm")(x).reshape(bv, h * w, c)
        qkv = nn.Dense(3 * c, name="qkv")(y)  # torch conv1d k=1 == dense

        if self.cross_view:
            v_ = self.num_frames
            b = bv // v_
            qkv = qkv.reshape(b, v_ * h * w, 3 * c)

        bs, t, _ = qkv.shape
        # torch QKVAttentionLegacy layout: width = heads * (3*hd), i.e. per-head qkv
        qkv = qkv.reshape(bs, t, heads, 3 * hd)
        q, k, v = qkv[..., :hd], qkv[..., hd : 2 * hd], qkv[..., 2 * hd :]
        scale = 1.0 / (hd**0.5)
        attn = jnp.einsum("bthd,bshd->bhts", q, k, preferred_element_type=jnp.float32) * scale
        attn = jax.nn.softmax(attn, axis=-1).astype(v.dtype)
        out = jnp.einsum("bhts,bshd->bthd", attn, v).reshape(bs, t, c)

        if self.cross_view:
            out = out.reshape(bv, h * w, c)

        out = nn.Dense(c, kernel_init=nn.initializers.zeros, name="proj_out")(out)
        return x + out.reshape(bv, h, w, c)


class Downsample(nn.Module):
    channels: int

    @nn.compact
    def __call__(self, x):
        return conv2d(self.channels, 3, stride=2, padding=1, name="op")(x)


class Upsample(nn.Module):
    channels: int

    @nn.compact
    def __call__(self, x):
        b, h, w, c = x.shape
        x = jnp.repeat(jnp.repeat(x, 2, axis=1), 2, axis=2)  # nearest 2x
        return conv2d(self.channels, 3, padding=1, name="conv")(x)


class UNetModel(nn.Module):
    """Timestep-free LDM UNet (reference unet.py:610-1219, configured form)."""

    model_channels: int
    out_channels: int
    num_res_blocks: int = 1
    attention_resolutions: Sequence[int] = (4,)
    channel_mult: Sequence[int] = (1, 1, 1)
    num_head_channels: int = 32
    num_frames: int = 2
    use_cross_view_self_attn: bool = True

    @nn.compact
    def __call__(self, x):
        mc = self.model_channels
        attn_res = set(self.attention_resolutions)

        def attn(ch, name):
            return CrossViewAttentionBlock(
                ch, num_head_channels=self.num_head_channels,
                num_frames=self.num_frames, cross_view=self.use_cross_view_self_attn,
                name=name,
            )

        hs = []
        h = conv2d(mc, 3, padding=1, name="in_conv")(x)
        hs.append(h)
        ch = mc
        ds = 1
        blk = 0
        for level, mult in enumerate(self.channel_mult):
            for _ in range(self.num_res_blocks):
                h = ResBlock(mult * mc, name=f"down_res_{blk}")(h)
                ch = mult * mc
                if ds in attn_res:
                    h = attn(ch, f"down_attn_{blk}")(h)
                hs.append(h)
                blk += 1
            if level != len(self.channel_mult) - 1:
                h = Downsample(ch, name=f"downsample_{level}")(h)
                hs.append(h)
                ds *= 2

        h = ResBlock(ch, name="mid_res_0")(h)
        h = ResBlock(ch, name="mid_res_1")(h)

        blk = 0
        for level, mult in list(enumerate(self.channel_mult))[::-1]:
            for i in range(self.num_res_blocks + 1):
                h = jnp.concatenate([h, hs.pop()], axis=-1)
                h = ResBlock(mult * mc, name=f"up_res_{blk}")(h)
                ch = mult * mc
                if ds in attn_res:
                    h = attn(ch, f"up_attn_{blk}")(h)
                if level and i == self.num_res_blocks:
                    h = Upsample(ch, name=f"upsample_{level}")(h)
                    ds //= 2
                blk += 1

        h = _group_norm(ch, "out_norm")(h)
        h = jax.nn.silu(h)
        return conv2d(self.out_channels, 3, padding=1,
                      kernel_init=nn.initializers.zeros, name="out_conv")(h)
