"""RAFT-style task-agnostic regression refinement (flax.linen, NHWC).

Capability parity with the reference (unimatch/reg_refine.py:6-119):
  FlowHead           2-conv delta-flow head
  SepConvGRU         separable (1xK then Kx1) gated conv GRU
  BasicMotionEncoder correlation+flow -> 128-d motion features
  BasicUpdateBlock   encoder -> GRU -> flow head (+ optional upsample-mask head)

The per-iteration GRU update is driven by lax-friendly static unrolling in
the UniMatch assembly (num_reg_refine is a static config), so XLA fuses each
iteration's convs; a lax.scan variant is provided by the assembly when the
iteration count is large.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import flax.linen as nn

from unimatch_tpu.models.layers import conv2d, conv2d_multi


class FlowHead(nn.Module):
    hidden_dim: int = 256
    out_dim: int = 2

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        y = conv2d(self.hidden_dim, 3, padding=1, act="relu", name="conv1")(x)
        return conv2d(self.out_dim, 3, padding=1, name="conv2")(y)


class SepConvGRU(nn.Module):
    hidden_dim: int = 128
    kernel_size: int = 5

    @nn.compact
    def __call__(self, h: jnp.ndarray, x_parts) -> jnp.ndarray:
        """x_parts: list of tensors forming the (virtual) GRU input concat."""
        p = (self.kernel_size - 1) // 2
        hd = self.hidden_dim
        if not isinstance(x_parts, (list, tuple)):
            x_parts = [x_parts]
        x_parts = list(x_parts)

        # horizontal pass (1 x K kernels); concats stay virtual (conv2d_multi)
        hx = [h] + x_parts
        z = conv2d_multi(hd, (1, self.kernel_size), padding=(0, p), act="sigmoid",
                         name="convz1")(hx)
        r = conv2d_multi(hd, (1, self.kernel_size), padding=(0, p), act="sigmoid",
                         name="convr1")(hx)
        q = conv2d_multi(hd, (1, self.kernel_size), padding=(0, p), act="tanh",
                         name="convq1")([r * h] + x_parts)
        h = (1 - z) * h + z * q

        # vertical pass (K x 1 kernels)
        hx = [h] + x_parts
        z = conv2d_multi(hd, (self.kernel_size, 1), padding=(p, 0), act="sigmoid",
                         name="convz2")(hx)
        r = conv2d_multi(hd, (self.kernel_size, 1), padding=(p, 0), act="sigmoid",
                         name="convr2")(hx)
        q = conv2d_multi(hd, (self.kernel_size, 1), padding=(p, 0), act="tanh",
                         name="convq2")([r * h] + x_parts)
        return (1 - z) * h + z * q


class BasicMotionEncoder(nn.Module):
    flow_channels: int = 2

    @nn.compact
    def __call__(self, flow: jnp.ndarray, corr: jnp.ndarray) -> jnp.ndarray:
        cor = conv2d(256, 1, act="relu", name="convc1")(corr)
        cor = conv2d(192, 3, padding=1, act="relu", name="convc2")(cor)
        flo = jax.nn.relu(conv2d(128, 7, padding=3, name="convf1")(flow))
        flo = conv2d(64, 3, padding=1, act="relu", name="convf2")(flo)
        out = conv2d_multi(
            128 - self.flow_channels, 3, padding=1, act="relu", name="conv"
        )([cor, flo])
        return [out, flow]  # virtual concat, 128 channels


class BasicUpdateBlock(nn.Module):
    hidden_dim: int = 128
    downsample_factor: int = 8
    flow_dim: int = 2
    bilinear_up: bool = False  # depth: no learned mask head

    @nn.compact
    def __call__(
        self, net: jnp.ndarray, inp: jnp.ndarray, corr: jnp.ndarray, flow: jnp.ndarray
    ) -> Tuple[jnp.ndarray, Optional[jnp.ndarray], jnp.ndarray]:
        motion_parts = BasicMotionEncoder(flow_channels=self.flow_dim, name="encoder")(flow, corr)
        net = SepConvGRU(hidden_dim=self.hidden_dim, name="gru")(net, [inp] + motion_parts)
        delta = FlowHead(hidden_dim=256, out_dim=self.flow_dim, name="flow_head")(net)

        mask = None
        if not self.bilinear_up:
            m = conv2d(256, 3, padding=1, act="relu", name="mask_0")(net)
            mask = conv2d(self.downsample_factor**2 * 9, 1, name="mask_2")(m)
        return net, mask, delta
