"""ViTDet-style simple feature pyramid (flax.linen, NHWC).

Capability parity with reference unimatch/vit_fpn.py:7-64: per scale factor,
ConvTranspose (x2 / x4 with GELU between) or MaxPool (x0.5), followed by
GELU + conv3x3 for every non-identity scale.
"""

from __future__ import annotations

from typing import List, Sequence

import jax
import jax.numpy as jnp
import flax.linen as nn

from unimatch_tpu.models.layers import conv2d, gelu_exact


class ConvTransposeK(nn.Module):
    """KxK-stride-K transposed conv (exact torch ConvTranspose2d semantics).

    With kernel == stride there is no tap overlap: each input pixel expands
    into a KxK block -> implement as matmul + depth-to-space (MXU-friendly,
    avoids lax.conv_transpose which is slow on this runtime).
    Param layout: kernel [K, K, in, out] (converter maps torch [in, out, K, K]).
    """

    features: int
    k: int = 2

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        b, h, w, cin = x.shape
        k = self.k
        kernel = self.param(
            "kernel", nn.initializers.lecun_normal(), (k, k, cin, self.features)
        )
        bias = self.param("bias", nn.initializers.zeros, (self.features,))
        kmat = kernel.astype(x.dtype).transpose(2, 0, 1, 3).reshape(cin, k * k * self.features)
        y = jnp.einsum("bhwc,co->bhwo", x, kmat, preferred_element_type=jnp.float32)
        y = y.reshape(b, h, w, k, k, self.features)
        y = y.transpose(0, 1, 3, 2, 4, 5).reshape(b, k * h, k * w, self.features)
        return (y + bias.astype(y.dtype)).astype(x.dtype)


class ConvTranspose2x(ConvTransposeK):
    k: int = 2


class ViTFeaturePyramid(nn.Module):
    in_channels: int
    scale_factors: Sequence[float]

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> List[jnp.ndarray]:
        dim = self.in_channels
        results = []
        for idx, scale in enumerate(self.scale_factors):
            y = x
            if scale == 4.0:
                y = ConvTranspose2x(dim // 2, name=f"stage{idx}_deconv0")(y)
                y = gelu_exact(y)
                y = ConvTranspose2x(dim // 4, name=f"stage{idx}_deconv1")(y)
                out_dim = dim // 4
            elif scale == 2.0:
                y = ConvTranspose2x(dim // 2, name=f"stage{idx}_deconv0")(y)
                out_dim = dim // 2
            elif scale == 1.0:
                results.append(y)
                continue
            elif scale == 0.5:
                y = nn.max_pool(y, (2, 2), strides=(2, 2))
                out_dim = dim
            else:
                raise NotImplementedError(f"scale {scale}")
            y = gelu_exact(y)
            y = conv2d(out_dim, 3, padding=1, name=f"stage{idx}_conv")(y)
            results.append(y)
        return results
