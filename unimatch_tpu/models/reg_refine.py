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

import os
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


def _fuse_gru() -> bool:
    """Dispatch each SepConvGRU direction pass to the fused Pallas kernel
    (kernels/gru_fused.py — convs + gates in one VMEM-resident pass with
    automatic BlockSpec double-buffering; ~30 MB of HBM traffic per pass vs
    ~2 GB for the XLA tap-partial form). On-chip interleaved A/B (round 3):
    update block x6 23.75 vs 28.25 ms, full flagship forward 74.7 vs
    80.2 ms — docs/PERF_NOTES.md. UNIMATCH_FUSE_GRU=0 re-traces the XLA
    form for A/B."""
    return os.environ.get("UNIMATCH_FUSE_GRU", "1") != "0"


class FlowHead(nn.Module):
    hidden_dim: int = 256
    out_dim: int = 2

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        # A fused Pallas form of this 2-conv head (kernels/head_fused.py)
        # measured a tie in situ (rounds 4-5, docs/PERF_NOTES.md) — deleted;
        # XLA's in-graph fusion of the head convs is already sufficient.
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
        khzr = jnp.concatenate([kz[:, :, :hd], kr[:, :, :hd]], axis=-1)

        # bf16 only: the kernel's VMEM working set (input bands + f32 tap
        # partials) is sized for 2-byte activations; f32 runs keep the XLA
        # form (the f32 path is parity/CI, not the serving path)
        if _fuse_gru() and dt == jnp.bfloat16:
            from unimatch_tpu.kernels import use_pallas

            if use_pallas():
                from unimatch_tpu.kernels.gru_fused import gru_pass

                x = x_parts[0] if len(x_parts) == 1 else jnp.concatenate(x_parts, -1)
                return gru_pass(
                    h, x, kx, khzr, kq[:, :, :hd, :], jnp.stack([bz, br, bq]),
                    horizontal=ksize[0] == 1,
                )

        xacc = None
        off = 0
        for p in x_parts:
            ci = p.shape[-1]
            y = conv_via_matmul(p, kx[:, :, off : off + ci, :], (1, 1), pad)
            xacc = y if xacc is None else xacc + y
            off += ci
        hzr = conv_via_matmul(h, khzr, (1, 1), pad)
        xz, xr, xq = xacc[..., :hd], xacc[..., hd : 2 * hd], xacc[..., 2 * hd :]

        z = jax.nn.sigmoid(hzr[..., :hd] + xz + bz)
        r = jax.nn.sigmoid(hzr[..., hd:] + xr + br)
        rh = r * h
        qh = conv_via_matmul(rh, kq[:, :, :hd, :], (1, 1), pad)
        q = jnp.tanh(qh + xq + bq)
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


def _fuse_motion() -> bool:
    """Dispatch the whole motion-encoder conv chain to the fused Pallas
    kernel (kernels/motion_fused.py — all four intermediates stay in VMEM;
    the 7x7 flow conv folds into an XLA-side im2col). Default ON since
    round 4: SOLO flagship A/B 61.1 vs 65.7 ms median (interleaved,
    scripts/tpu_round4a_batch.py), on-chip parity 0.031 max-abs on 6.125
    absmax at the flagship s1 shape. UNIMATCH_FUSE_MOTION=0 re-traces the
    XLA form for A/B."""
    return os.environ.get("UNIMATCH_FUSE_MOTION", "1") != "0"


class BasicMotionEncoder(nn.Module):
    flow_channels: int = 2

    def _fused(self, flow: jnp.ndarray, corr: jnp.ndarray):
        """Fused-kernel path with the identical param tree."""
        from unimatch_tpu.kernels.motion_fused import motion_encoder_fused

        fd = self.flow_channels
        ck = corr.shape[-1]
        ws, bs = [], []
        for name, shape in (
            ("convc1", (1, 1, ck, 256)),
            ("convf1", (7, 7, fd, 128)),
            ("convc2", (3, 3, 256, 192)),
            ("convf2", (3, 3, 128, 64)),
            ("conv", (3, 3, 256, 128 - fd)),
        ):
            sc = self.scope.push(name)
            ws.append(sc.param("kernel", conv_kaiming_init, shape))
            bs.append(sc.param("bias", nn.initializers.zeros, (shape[-1],)))
        wc1, wf1, wc2, wf2, wm = ws
        out = motion_encoder_fused(corr, flow, wc1, wc2, wf1, wf2, wm, tuple(bs))
        return [out, flow]

    @nn.compact
    def __call__(self, flow: jnp.ndarray, corr: jnp.ndarray) -> jnp.ndarray:
        if _fuse_motion() and corr.dtype == jnp.bfloat16:
            from unimatch_tpu.kernels import use_pallas

            if use_pallas():
                return self._fused(flow, corr)

        cor = conv2d(256, 1, act="relu", name="convc1")(corr)
        cor = conv2d(192, 3, padding=1, act="relu", name="convc2")(cor)
        flo = conv2d(128, 7, padding=3, act="relu", name="convf1")(flow)
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

    def mask_head(self, net: jnp.ndarray) -> jnp.ndarray:
        """Upsample-mask head alone (conv3x3-relu + conv1x1). Separately
        callable (apply(..., method='mask_head')) so the inference refine
        scan can skip the mask in its body and compute it ONCE on the final
        GRU state — inside lax.scan XLA cannot dead-code-eliminate the 5
        non-final mask heads the way it does in the unrolled form. Scope
        param access (not submodules): nn.compact allows one compact method,
        and the param tree must match the __call__ path byte-for-byte."""
        mask_dim = self.downsample_factor**2 * 9
        dt = net.dtype
        sc0 = self.scope.push("mask_0")
        k1 = sc0.param("kernel", conv_kaiming_init, (3, 3, net.shape[-1], 256))
        b1 = sc0.param("bias", nn.initializers.zeros, (256,))
        y = jax.nn.relu(
            conv_via_matmul(net, k1.astype(dt), (1, 1), (1, 1)) + b1.astype(dt)
        )
        sc2 = self.scope.push("mask_2")
        k2 = sc2.param("kernel", conv_kaiming_init, (1, 1, 256, mask_dim))
        b2 = sc2.param("bias", nn.initializers.zeros, (mask_dim,))
        return conv_via_matmul(y, k2.astype(dt), (1, 1), (0, 0)) + b2.astype(dt)

    @nn.compact
    def __call__(
        self, net: jnp.ndarray, inp: jnp.ndarray, corr: jnp.ndarray, flow: jnp.ndarray,
        with_mask: bool = True,
    ) -> Tuple[jnp.ndarray, Optional[jnp.ndarray], jnp.ndarray]:
        # A whole-step fused path (kernels/update_fused.py: motion+GRU-h /
        # GRU-v / fused-head kernels) was built in round 4 and LOST ~1.5 ms
        # in situ to this per-piece chain — the wider banded inputs cost HBM
        # re-reads (docs/PERF_NOTES.md round-4g). Deleted in round 5; the
        # per-piece chain (fused motion + fused GRU h/v + XLA head with the
        # mask hoist) is the measured optimum.
        motion_parts = BasicMotionEncoder(flow_channels=self.flow_dim, name="encoder")(flow, corr)
        net = SepConvGRU(hidden_dim=self.hidden_dim, name="gru")(net, [inp] + motion_parts)
        delta = FlowHead(hidden_dim=256, out_dim=self.flow_dim, name="flow_head")(net)

        mask = None
        if not self.bilinear_up and with_mask:
            mask = self.mask_head(net)
        return net, mask, delta
