"""RAFT-style task-agnostic regression refinement (flax.linen, NHWC).

Capability parity with the reference (unimatch/reg_refine.py:6-119):
  FlowHead           2-conv delta-flow head
  SepConvGRU         separable (1xK then Kx1) gated conv GRU
  BasicMotionEncoder correlation+flow -> 128-d motion features
  BasicUpdateBlock   encoder -> GRU -> flow head (+ optional upsample-mask head)

The per-iteration GRU update is driven by static unrolling in the UniMatch
assembly (num_reg_refine is a static config <= 6 in every published recipe),
so XLA specializes and fuses each iteration's convs.

The SepConvGRU fuses its gate convolutions weight-side: z/r/q read
overlapping inputs ([h]+x for z and r, [r*h]+x for q), and convolution is
linear in input channels, so the x-side contributions of all three gates are
one conv with 3*hd outputs and the h-side of z/r is one conv with 2*hd
outputs — the input maps are read once instead of three times. The param
tree is unchanged (kernels concatenated weight-side at apply time; same
trick as the transformer's combined qkv projection, transformer.py:61-80).
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import flax.linen as nn

from unimatch_tpu.models.layers import (
    conv2d,
    conv2d_multi,
    conv_kaiming_init,
    conv_via_matmul,
)


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

    def _fused_pass(self, h, x_parts, ksize, pad, suffix) -> jnp.ndarray:
        """One GRU direction with weight-side fused gate convolutions.

        Kernels are split at the h/x channel boundary; the x-side slices of
        convz/convr/convq concatenate into one conv with 3*hd outputs (the x
        tensors — inp, motion features, flow — are read once per tap instead
        of three times), the h-side slices of convz/convr into one with 2*hd.
        convq's h-side stays separate (its input is r*h). Values match the
        unfused form up to bf16 summation order; params are byte-identical.
        """
        hd = self.hidden_dim
        dt = h.dtype
        cin = hd + sum(p.shape[-1] for p in x_parts)
        params = []
        for name in ("convz" + suffix, "convr" + suffix, "convq" + suffix):
            sc = self.scope.push(name)
            k = sc.param("kernel", conv_kaiming_init, (ksize[0], ksize[1], cin, hd))
            b = sc.param("bias", nn.initializers.zeros, (hd,))
            params.append((k.astype(dt), b.astype(dt)))
        (kz, bz), (kr, br), (kq, bq) = params

        # x-side: one conv over the virtual x concat, 3*hd outputs
        kx = jnp.concatenate([kz[:, :, hd:], kr[:, :, hd:], kq[:, :, hd:]], axis=-1)
        xacc = None
        off = 0
        for p in x_parts:
            ci = p.shape[-1]
            y = conv_via_matmul(p, kx[:, :, off : off + ci, :], (1, 1), pad)
            xacc = y if xacc is None else xacc + y
            off += ci
        xz, xr, xq = xacc[..., :hd], xacc[..., hd : 2 * hd], xacc[..., 2 * hd :]

        # h-side of z/r: one conv, 2*hd outputs
        hzr = conv_via_matmul(h, jnp.concatenate([kz[:, :, :hd], kr[:, :, :hd]], axis=-1),
                              (1, 1), pad)
        z = jax.nn.sigmoid(hzr[..., :hd] + xz + bz)
        r = jax.nn.sigmoid(hzr[..., hd:] + xr + br)
        q = jnp.tanh(conv_via_matmul(r * h, kq[:, :, :hd, :], (1, 1), pad) + xq + bq)
        return (1 - z) * h + z * q

    @nn.compact
    def __call__(self, h: jnp.ndarray, x_parts) -> jnp.ndarray:
        """x_parts: list of tensors forming the (virtual) GRU input concat."""
        p = (self.kernel_size - 1) // 2
        if not isinstance(x_parts, (list, tuple)):
            x_parts = [x_parts]
        x_parts = list(x_parts)

        # horizontal pass (1 x K kernels), then vertical pass (K x 1)
        h = self._fused_pass(h, x_parts, (1, self.kernel_size), (0, p), "1")
        return self._fused_pass(h, x_parts, (self.kernel_size, 1), (p, 0), "2")


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
