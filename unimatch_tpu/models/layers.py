"""Shared NN building blocks (flax.linen, NHWC).

Numeric conventions chosen for checkpoint parity with the torch reference:
  * InstanceNorm: per-sample, per-channel over (H, W); biased variance,
    eps=1e-5, no affine (torch nn.InstanceNorm2d defaults — backbone.py:7,53).
  * LayerNorm: eps=1e-5 (torch default).
  * GELU: exact erf form (torch nn.GELU default).
"""

from __future__ import annotations

from typing import Sequence, Tuple

import jax
import jax.numpy as jnp
import flax.linen as nn


def instance_norm(x: jnp.ndarray, eps: float = 1e-5) -> jnp.ndarray:
    """Affine-free instance normalization over spatial dims of [B, H, W, C]."""
    x32 = x.astype(jnp.float32)
    mean = jnp.mean(x32, axis=(1, 2), keepdims=True)
    var = jnp.mean(jnp.square(x32 - mean), axis=(1, 2), keepdims=True)
    return ((x32 - mean) * jax.lax.rsqrt(var + eps)).astype(x.dtype)


def gelu_exact(x: jnp.ndarray) -> jnp.ndarray:
    return jax.nn.gelu(x, approximate=False)


conv_kaiming_init = nn.initializers.variance_scaling(2.0, "fan_out", "normal")
xavier_uniform = nn.initializers.xavier_uniform()


class Conv(nn.Conv):
    """nn.Conv with torch-style symmetric integer padding by default."""

    pass


def conv2d(
    features: int,
    kernel: int | Tuple[int, int],
    stride: int | Tuple[int, int] = 1,
    padding: int | Tuple[int, int] = 0,
    dilation: int = 1,
    use_bias: bool = True,
    kernel_init=conv_kaiming_init,
    name: str | None = None,
) -> nn.Conv:
    if isinstance(kernel, int):
        kernel = (kernel, kernel)
    if isinstance(stride, int):
        stride = (stride, stride)
    if isinstance(padding, int):
        padding = (padding, padding)
    return nn.Conv(
        features=features,
        kernel_size=kernel,
        strides=stride,
        padding=[(padding[0], padding[0]), (padding[1], padding[1])],
        kernel_dilation=(dilation, dilation),
        use_bias=use_bias,
        kernel_init=kernel_init,
        name=name,
    )


class LayerNorm(nn.LayerNorm):
    """LayerNorm with torch eps."""

    epsilon: float = 1e-5
