"""DINOv2-style Vision Transformer (flax.linen, NHWC) for the DepthSplat
monocular branch.

The reference downloads facebookresearch/dinov2 via torch.hub at model
construction (unimatch_depthsplat.py:92-97) — an external network dependency
this framework replaces with a local implementation + weight converter
(convert_depthsplat.torch_vit_key_to_flax). Architecture follows ViT-S/B/L
with patch size 14, class token, bicubic position-embedding interpolation,
LayerScale, and pre-norm blocks; `get_intermediate_layers` returns normalized
patch tokens of selected blocks (the reference uses indices [2, 5, 8, 11] for
ViT-S/B).
"""

from __future__ import annotations

from typing import List, Sequence, Tuple

import jax
import jax.numpy as jnp
import flax.linen as nn

VIT_CONFIGS = {
    "vits": dict(embed_dim=384, depth=12, num_heads=6),
    "vitb": dict(embed_dim=768, depth=12, num_heads=12),
    "vitl": dict(embed_dim=1024, depth=24, num_heads=16),
}


class Mlp(nn.Module):
    hidden: int
    out: int

    @nn.compact
    def __call__(self, x):
        x = nn.Dense(self.hidden, name="fc1")(x)
        x = jax.nn.gelu(x, approximate=False)
        return nn.Dense(self.out, name="fc2")(x)


class Attention(nn.Module):
    dim: int
    num_heads: int

    @nn.compact
    def __call__(self, x):  # [B, N, C]
        b, n, c = x.shape
        h = self.num_heads
        qkv = nn.Dense(3 * c, name="qkv")(x).reshape(b, n, 3, h, c // h)
        q, k, v = qkv[:, :, 0], qkv[:, :, 1], qkv[:, :, 2]  # [B, N, H, hd]
        scale = (c // h) ** -0.5
        attn = jnp.einsum("bnhd,bmhd->bhnm", q * scale, k, preferred_element_type=jnp.float32)
        attn = jax.nn.softmax(attn, axis=-1).astype(v.dtype)
        out = jnp.einsum("bhnm,bmhd->bnhd", attn, v).reshape(b, n, c)
        return nn.Dense(c, name="proj")(out)


class Block(nn.Module):
    dim: int
    num_heads: int
    mlp_ratio: float = 4.0

    @nn.compact
    def __call__(self, x):
        ls1 = self.param("ls1_gamma", nn.initializers.ones, (self.dim,))
        ls2 = self.param("ls2_gamma", nn.initializers.ones, (self.dim,))
        y = nn.LayerNorm(epsilon=1e-6, name="norm1")(x)
        x = x + ls1 * Attention(self.dim, self.num_heads, name="attn")(y)
        y = nn.LayerNorm(epsilon=1e-6, name="norm2")(x)
        x = x + ls2 * Mlp(int(self.dim * self.mlp_ratio), self.dim, name="mlp")(y)
        return x


class DinoViT(nn.Module):
    """ViT with patch size 14. Input [B, H, W, 3] (H, W multiples of 14)."""

    embed_dim: int = 384
    depth: int = 12
    num_heads: int = 6
    patch_size: int = 14
    pos_grid: int = 37  # DINOv2 pretraining grid (518 / 14)

    @nn.compact
    def __call__(
        self, x: jnp.ndarray, intermediate_indices: Sequence[int]
    ) -> List[jnp.ndarray]:
        """Returns normalized patch-token maps [B, H/14, W/14, C] per index."""
        b, h, w, _ = x.shape
        ph, pw = h // self.patch_size, w // self.patch_size

        # patch embedding: conv14x14 stride 14 == s2d + matmul
        patches = x.reshape(b, ph, self.patch_size, pw, self.patch_size, 3)
        patches = patches.transpose(0, 1, 3, 2, 4, 5).reshape(b, ph * pw, -1)
        kernel = self.param(
            "patch_kernel", nn.initializers.lecun_normal(),
            (self.patch_size * self.patch_size * 3, self.embed_dim),
        )
        patch_bias = self.param("patch_bias", nn.initializers.zeros, (self.embed_dim,))
        tokens = patches @ kernel.astype(patches.dtype) + patch_bias.astype(patches.dtype)

        cls_token = self.param("cls_token", nn.initializers.zeros, (1, 1, self.embed_dim))
        pos_embed = self.param(
            "pos_embed", nn.initializers.normal(0.02),
            (1, self.pos_grid * self.pos_grid + 1, self.embed_dim),
        )

        pos = _interpolate_pos_embed(pos_embed.astype(jnp.float32), self.pos_grid, ph, pw)
        tokens = tokens + pos[:, 1:].astype(tokens.dtype)
        cls_tok = cls_token.astype(tokens.dtype) + pos[:, :1].astype(tokens.dtype)
        tokens = jnp.concatenate([jnp.broadcast_to(cls_tok, (b, 1, self.embed_dim)), tokens], axis=1)

        outputs = {}
        want = set(intermediate_indices)
        for i in range(self.depth):
            tokens = Block(self.embed_dim, self.num_heads, name=f"block_{i}")(tokens)
            if i in want:
                outputs[i] = tokens

        final_norm = nn.LayerNorm(epsilon=1e-6, name="norm")
        out = []
        for i in intermediate_indices:
            t = final_norm(outputs[i])[:, 1:]  # drop class token, apply final norm
            out.append(t.reshape(b, ph, pw, self.embed_dim))
        return out


def _interpolate_pos_embed(pos_embed: jnp.ndarray, grid: int, ph: int, pw: int) -> jnp.ndarray:
    """Bicubic-equivalent (bilinear here) resize of patch position embeddings.

    DINOv2 resizes its [grid, grid] position table to the input's patch grid;
    we use align_corners bilinear, which matches within interpolation error
    and is exact when ph == pw == grid.
    """
    if ph == grid and pw == grid:
        return pos_embed
    from unimatch_tpu.ops.geometry import resize_bilinear_align_corners

    cls_pos = pos_embed[:, :1]
    patch_pos = pos_embed[:, 1:].reshape(1, grid, grid, -1)
    patch_pos = resize_bilinear_align_corners(patch_pos, ph, pw)
    return jnp.concatenate([cls_pos, patch_pos.reshape(1, ph * pw, -1)], axis=1)


def build_vit(vit_type: str, name: str = "pretrained") -> DinoViT:
    cfg = VIT_CONFIGS[vit_type]
    return DinoViT(name=name, **cfg)


INTERMEDIATE_LAYER_IDX = {
    "vits": (2, 5, 8, 11),
    "vitb": (2, 5, 8, 11),
    "vitl": (4, 11, 17, 23),
}
