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


def _fuse_conv() -> bool:
    """Dispatch the refine-path K>1 convolutions (motion encoder, flow/mask
    heads) to the banded fused conv kernel (kernels/conv_banded.py — the
    BlockSpec-pipelined successor to the rejected manual-DMA conv_fused
    kernel, whose halo-tile DMA serialized with compute and lost ~1.7x).
    Default OFF — a genuinely two-sided result (round 3,
    docs/PERF_NOTES.md): in the *isolated* update block x6 the banded
    kernel wins 19.1 vs 23.8 ms (fused GRU in both arms), but in the *full
    flagship forward* it ties-to-loses (70.9-72.1 vs 69.7-70.7 ms over 3
    interleaved reps) — pallas_call is a fusion barrier, and in the full
    graph XLA fuses these convs with the surrounding lookup/elementwise
    ops. The 7x7 cin=2 convf1 is excluded by Conv2d's cin >= 8 gate either
    way. UNIMATCH_FUSE_CONV=1 re-enables for measurement."""
    return os.environ.get("UNIMATCH_FUSE_CONV", "0") != "0"


def _fuse_gru() -> bool:
    """Dispatch each SepConvGRU direction pass to the fused Pallas kernel
    (kernels/gru_fused.py — convs + gates in one VMEM-resident pass with
    automatic BlockSpec double-buffering; ~30 MB of HBM traffic per pass vs
    ~2 GB for the XLA tap-partial form). On-chip interleaved A/B (round 3):
    update block x6 23.75 vs 28.25 ms, full flagship forward 74.7 vs
    80.2 ms — docs/PERF_NOTES.md. UNIMATCH_FUSE_GRU=0 re-traces the XLA
    form for A/B."""
    return os.environ.get("UNIMATCH_FUSE_GRU", "1") != "0"


def _fuse_head() -> bool:
    """Dispatch the two-conv heads (FlowHead, upsample-mask head) to the
    fused Pallas kernel (kernels/head_fused.py): the [*, 256] hidden stays
    in VMEM and the narrow output writes once in bf16, vs two full sets of
    f32 tap partials on the XLA path — with the 1-2-channel output's
    partials lane-padding 2 -> 128 (~64x the logical traffic).
    UNIMATCH_FUSE_HEAD=0 re-traces the XLA form for A/B."""
    return os.environ.get("UNIMATCH_FUSE_HEAD", "0") != "0"


def _fused_two_conv(scope, x, names, shapes, act1="relu"):
    """Run the named 2-conv chain through the fused head kernel with the
    identical param tree; returns None when the kernel doesn't apply."""
    if not (_fuse_head() and x.dtype == jnp.bfloat16 and x.shape[2] % 8 == 0):
        return None
    from unimatch_tpu.kernels import use_pallas

    if not use_pallas():
        return None
    from unimatch_tpu.kernels.head_fused import fused_head

    ps = []
    for name, shape in zip(names, shapes):
        sc = scope.push(name)
        ps.append(sc.param("kernel", conv_kaiming_init, shape))
        ps.append(sc.param("bias", nn.initializers.zeros, (shape[-1],)))
    k1, b1, k2, b2 = ps
    return fused_head(x, k1, b1, k2, b2, act1=act1)


class FlowHead(nn.Module):
    hidden_dim: int = 256
    out_dim: int = 2

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        out = _fused_two_conv(
            self.scope, x, ("conv1", "conv2"),
            ((3, 3, x.shape[-1], self.hidden_dim),
             (3, 3, self.hidden_dim, self.out_dim)),
        )
        if out is not None:
            return out
        y = conv2d(self.hidden_dim, 3, padding=1, act="relu", fuse=_fuse_conv(),
                   name="conv1")(x)
        # out_dim is 1-2: a 2-lane output block lane-pads on the XLA path
        # too, which is what the fused head kernel above avoids
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

        fuse = _fuse_conv()
        # convf1 (7x7 on the 2-channel flow) is excluded by Conv2d's
        # cin >= 8 gate: sub-lane-width inputs pad 2 -> 128 lanes in VMEM
        # and the old fused kernel failed Mosaic compilation at that shape
        cor = conv2d(256, 1, act="relu", name="convc1")(corr)
        cor = conv2d(192, 3, padding=1, act="relu", fuse=fuse, name="convc2")(cor)
        flo = conv2d(128, 7, padding=3, act="relu", fuse=fuse, name="convf1")(flow)
        flo = conv2d(64, 3, padding=1, act="relu", fuse=fuse, name="convf2")(flo)
        out = conv2d_multi(
            128 - self.flow_channels, 3, padding=1, act="relu", fuse=fuse, name="conv"
        )([cor, flo])
        return [out, flow]  # virtual concat, 128 channels


def _fuse_update() -> bool:
    """Dispatch the WHOLE update step (motion encoder + both SepConvGRU
    passes + FlowHead) to the fused path (kernels/update_fused.py:
    motion+GRU-h kernel, GRU-v kernel, fused head) instead of four separate
    kernel/XLA pieces — the per-iteration kernel boundaries and their HBM
    round-trips are the bulk of the update net's ~19 ms in-situ cost
    (docs/PERF_NOTES.md). UNIMATCH_FUSE_UPDATE=0 falls back to the
    per-piece kernels for A/B."""
    return os.environ.get("UNIMATCH_FUSE_UPDATE", "0") != "0"


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
        out = _fused_two_conv(
            self.scope, net, ("mask_0", "mask_2"),
            ((3, 3, net.shape[-1], 256), (1, 1, 256, mask_dim)),
        )
        if out is not None:
            return out
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

    def _fused_update(self, net, inp, corr, flow):
        """Whole-step fused path (kernels/update_fused.py) with the
        identical param tree to the per-module path below."""
        from unimatch_tpu.kernels.update_fused import fused_update

        fd = self.flow_dim
        hd = self.hidden_dim
        ck = corr.shape[-1]

        enc_sc = self.scope.push("encoder")
        gru_sc = self.scope.push("gru")
        head_sc = self.scope.push("flow_head")

        def p(parent, name, shape):
            sc = parent.push(name)
            k = sc.param("kernel", conv_kaiming_init, shape)
            b = sc.param("bias", nn.initializers.zeros, (shape[-1],))
            return k, b

        wc1, bc1 = p(enc_sc, "convc1", (1, 1, ck, 256))
        wf1, bf1 = p(enc_sc, "convf1", (7, 7, fd, 128))
        wc2, bc2 = p(enc_sc, "convc2", (3, 3, 256, 192))
        wf2, bf2 = p(enc_sc, "convf2", (3, 3, 128, 64))
        wm, bm = p(enc_sc, "conv", (3, 3, 256, 128 - fd))

        gs = []
        for suffix, ksz in (("1", (1, 5)), ("2", (5, 1))):
            # cin = hd (h-side) + 2*hd (the [inp|motion|flow] x concat)
            ps = [
                p(gru_sc, "conv" + g + suffix, (*ksz, 3 * hd, hd))
                for g in ("z", "r", "q")
            ]
            (kz, bz), (kr, br), (kq, bq) = ps
            kx = jnp.concatenate([kz[:, :, hd:], kr[:, :, hd:], kq[:, :, hd:]], -1)
            khzr = jnp.concatenate([kz[:, :, :hd], kr[:, :, :hd]], -1)
            gs.append((kx, khzr, kq[:, :, :hd, :], jnp.stack([bz, br, bq])))

        hk1, hb1 = p(head_sc, "conv1", (3, 3, hd, 256))
        hk2, hb2 = p(head_sc, "conv2", (3, 3, 256, fd))

        return fused_update(
            net, inp, corr, flow,
            (wc1, wc2, wf1, wf2, wm), (bc1, bf1, bc2, bf2, bm),
            gs[0], gs[1], hk1, hb1, hk2, hb2,
        )

    @nn.compact
    def __call__(
        self, net: jnp.ndarray, inp: jnp.ndarray, corr: jnp.ndarray, flow: jnp.ndarray,
        with_mask: bool = True,
    ) -> Tuple[jnp.ndarray, Optional[jnp.ndarray], jnp.ndarray]:
        if (
            not with_mask
            and _fuse_update()
            and corr.dtype == jnp.bfloat16
            and self.hidden_dim == 128
            and inp.shape[-1] == 128
            and corr.shape[-1] <= 128
            and self.flow_dim <= 2
            and not self.is_initializing()
        ):
            from unimatch_tpu.kernels import use_pallas

            if use_pallas():
                net2, delta = self._fused_update(net, inp, corr, flow)
                return net2, None, delta

        motion_parts = BasicMotionEncoder(flow_channels=self.flow_dim, name="encoder")(flow, corr)
        net = SepConvGRU(hidden_dim=self.hidden_dim, name="gru")(net, [inp] + motion_parts)
        delta = FlowHead(hidden_dim=256, out_dim=self.flow_dim, name="flow_head")(net)

        mask = None
        if not self.bilinear_up and with_mask:
            mask = self.mask_head(net)
        return net, mask, delta
