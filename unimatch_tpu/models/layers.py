"""Shared NN building blocks (flax.linen, NHWC).

Numeric conventions chosen for checkpoint parity with the torch reference:
  * InstanceNorm: per-sample, per-channel over (H, W); biased variance,
    eps=1e-5, no affine (torch nn.InstanceNorm2d defaults — backbone.py:7,53).
  * LayerNorm: eps=1e-5 (torch default).
  * GELU: exact erf form (torch nn.GELU default).
"""

from __future__ import annotations

import os
from typing import Any, Sequence, Tuple

import jax
import jax.numpy as jnp
import flax.linen as nn


def _instance_norm_f32(x32: jnp.ndarray, eps: float = 1e-5) -> jnp.ndarray:
    """Normalize an f32 [B, H, W, C] tensor over (H, W); returns f32.

    Subtract-mean variance (not the one-pass E[x^2]-E[x]^2 form): the
    one-pass form's ~1e-7 statistic shift amplifies through the global
    matching softmax enough to bust end-to-end parity tolerances, and the
    extra read pass it saves did not measure above noise on chip.
    """
    mean = jnp.mean(x32, axis=(1, 2), keepdims=True)
    var = jnp.mean(jnp.square(x32 - mean), axis=(1, 2), keepdims=True)
    return (x32 - mean) * jax.lax.rsqrt(var + eps)


def instance_norm(x: jnp.ndarray, eps: float = 1e-5) -> jnp.ndarray:
    """Affine-free instance normalization over spatial dims of [B, H, W, C]."""
    return _instance_norm_f32(x.astype(jnp.float32), eps).astype(x.dtype)


def gelu_exact(x: jnp.ndarray) -> jnp.ndarray:
    return jax.nn.gelu(x, approximate=False)


conv_kaiming_init = nn.initializers.variance_scaling(2.0, "fan_out", "normal")
xavier_uniform = nn.initializers.xavier_uniform()

_ACT_FNS = {
    None: lambda x: x,
    "relu": jax.nn.relu,
    "sigmoid": jax.nn.sigmoid,
    "tanh": jnp.tanh,
}


def _use_lax_conv() -> bool:
    """A/B lever (UNIMATCH_CONV_LAX): lower convolutions with
    lax.conv_general_dilated instead of the shifted-matmul form below.

    Round 1 measured lax.conv erratically 10-25x off peak at every channel
    width on the then-current libtpu, which is why conv_via_matmul exists.
    The round-3j per-shape probe found that pathology no longer reproduces
    (docs/PERF_NOTES.md): lax.conv ties the shifted-matmul form at the
    backbone shapes. This flag drives the round-4 full-model A/B; if lax.conv
    wins it also shrinks every compile (one HLO op per conv instead of K
    shifted matmuls + adds), which is most of the train-step compile blowup.
    """
    return os.environ.get("UNIMATCH_CONV_LAX", "0") != "0"


def _space_to_depth(x: jnp.ndarray, s: int) -> jnp.ndarray:
    """[B, H, W, C] -> [B, H/s, W/s, s*s*C], channel order (dy, dx, c).

    A strided-slice + channel-concat form (UNIMATCH_S2D_SLICE) measured
    +5.9 ms on the flagship (round-5f) — strided slices are pathological on
    this part — and was removed; the stem now avoids this transform
    entirely via the default-on lax.conv stem path (round 5g), so this only
    runs for stride-2 wide-channel convs where the 6-D reshape+transpose
    pair is layout-benign.
    """
    b, h, w, c = x.shape
    x = x.reshape(b, h // s, s, w // s, s, c)
    return x.transpose(0, 1, 3, 2, 4, 5).reshape(b, h // s, w // s, s * s * c)


def conv_via_matmul(
    x: jnp.ndarray,
    kernel: jnp.ndarray,  # [kh, kw, cin, cout]
    stride: Tuple[int, int],
    padding: Tuple[int, int],
    out_dtype=None,
) -> jnp.ndarray:
    """Convolution lowered to shifted matmuls (MXU-friendly).

    On the target TPU runtime, lax.conv with < ~128 channels runs an order of
    magnitude below peak, while static-shift slices + [N, Cin] x [Cin, Cout]
    matmuls reach it. Stride > 1 is realized with a space-to-depth transform
    so every slice stays stride-1 (strided slices are also pathological).
    Exact (fp32-accumulated) semantics of lax.conv with symmetric padding.
    out_dtype=jnp.float32 hands back the raw f32 accumulator (for fused
    consumers like instance norm that want moments before the narrowing cast).
    """
    if out_dtype is None:
        out_dtype = x.dtype
    if _use_lax_conv():
        y = jax.lax.conv_general_dilated(
            x,
            kernel,
            window_strides=stride,
            padding=[(padding[0], padding[0]), (padding[1], padding[1])],
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            preferred_element_type=jnp.float32,
        )
        return y.astype(out_dtype)
    kh, kw, cin, cout = kernel.shape
    sh, sw = stride
    ph, pw = padding
    b, h, w, _ = x.shape
    oh = (h + 2 * ph - kh) // sh + 1
    ow = (w + 2 * pw - kw) // sw + 1

    if sh == 1 and sw == 1:
        xp = jnp.pad(x, ((0, 0), (ph, ph), (pw, pw), (0, 0)))
        if (
            cin >= 64
            and kh * kw > 1
            and os.environ.get("UNIMATCH_CONV_IM2COL", "0") != "0"
        ):
            # im2col form (A/B lever): one [N, K*Cin] x [K*Cin, Cout] dot.
            # The shifted-matmul form below writes+reads K f32 [N, Cout]
            # tap partials (~2x the traffic of the bf16 concat when
            # Cout >= Cin); the stem's sub-128-channel version of this
            # measured 4x SLOWER (lane padding) — hence the cin gate.
            cols = jnp.concatenate(
                [xp[:, u : u + oh, v : v + ow, :] for u in range(kh) for v in range(kw)],
                axis=-1,
            )
            return jnp.einsum(
                "bhwc,co->bhwo", cols, kernel.reshape(kh * kw * cin, cout),
                preferred_element_type=jnp.float32,
            ).astype(out_dtype)
        # bf16 tap partials (UNIMATCH_CONV_BF16_PARTIALS) tied twice on chip
        # (r4c, r5h) and were removed; partials stay f32.
        acc = None
        for u in range(kh):
            for v in range(kw):
                part = jnp.einsum(
                    "bhwc,co->bhwo",
                    xp[:, u : u + oh, v : v + ow, :],
                    kernel[u, v],
                    preferred_element_type=jnp.float32,
                )
                acc = part if acc is None else acc + part
        return acc.astype(out_dtype)

    assert sh == sw, "anisotropic strides use lax.conv"
    s = sh
    xp = jnp.pad(x, ((0, 0), (ph, ph), (pw, pw), (0, 0)))
    hp, wp = xp.shape[1], xp.shape[2]
    # pad so the s2d grid is an exact multiple of s and covers every tap:
    # tap (u, v) reads s2d row a + output row, a = u // s <= (kh-1)//s
    rows = max(-(-hp // s), (kh - 1) // s + oh) * s
    cols = max(-(-wp // s), (kw - 1) // s + ow) * s
    xp = jnp.pad(xp, ((0, 0), (0, rows - hp), (0, cols - wp), (0, 0)))
    xs = _space_to_depth(xp, s)  # [B, rows/s, cols/s, s*s*cin]

    # group taps by s2d cell (a, b) so each matmul contracts s*s*cin channels
    na = (kh - 1) // s + 1
    nb = (kw - 1) // s + 1
    zeros_blk = jnp.zeros((cin, cout), kernel.dtype)

    def cell_kernel(a, bb):
        blocks = []
        for dy in range(s):
            for dx in range(s):
                u, v = s * a + dy, s * bb + dx
                blocks.append(kernel[u, v] if (u < kh and v < kw) else zeros_blk)
        return jnp.concatenate(blocks, axis=0)  # [s*s*cin, cout]

    # NOTE: a VMEM-accumulated Pallas variant of these cell dots
    # (kernels/strided_conv.py, removed in round 4) LOST the on-chip
    # backbone A/B 19.7 vs 10.78 ms — the space-to-depth relayout the
    # kernel needed on its input dominated (docs/PERF_NOTES.md round-3j).
    # NOTE: concatenating all cells into one im2col map + a single wide-K
    # matmul measured 4x SLOWER than the per-cell accumulation below (the
    # sub-128-channel cell slices lane-pad and the concat relayouts): keep
    # the per-cell matmuls.
    acc = None
    for a in range(na):
        for bb in range(nb):
            if not any(
                s * a + dy < kh and s * bb + dx < kw for dy in range(s) for dx in range(s)
            ):
                continue
            k2 = cell_kernel(a, bb)
            sl = xs[:, a : a + oh, bb : bb + ow, :]
            part = jnp.einsum("bhwc,co->bhwo", sl, k2, preferred_element_type=jnp.float32)
            acc = part if acc is None else acc + part
    return acc.astype(out_dtype)


class Conv2d(nn.Module):
    """Conv layer with torch-compatible params and TPU-adaptive lowering.

    Param tree matches nn.Conv ('kernel' [kh, kw, cin, cout], 'bias' [cout])
    so the torch checkpoint converter is unaffected. The computation lowers
    to shifted matmuls when the channel count would under-utilize the MXU
    under lax.conv (see conv_via_matmul); wide-channel convs and dilated
    convs use lax.conv directly. (A banded Pallas conv kernel lived behind
    fuse=True through rounds 3-4; it tied-to-lost in situ — pallas_call is
    a fusion barrier and XLA fuses these convs with surrounding ops — and
    was deleted in round 5. docs/PERF_NOTES.md keeps the record.)
    """

    features: int
    kernel_size: Tuple[int, int]
    stride: Tuple[int, int] = (1, 1)
    padding: Tuple[int, int] = (0, 0)
    dilation: int = 1
    use_bias: bool = True
    kernel_init: Any = conv_kaiming_init
    act: Any = None  # None | 'relu' | 'sigmoid' | 'tanh', applied after bias+norm
    norm: Any = None  # None | 'instance', applied after bias, before act
    prefer_lax: bool = False  # stem marker: lax.conv path for cin<=4 (r5g win)

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        kh, kw = self.kernel_size
        cin = x.shape[-1]
        kernel = self.param("kernel", self.kernel_init, (kh, kw, cin, self.features))

        kernel = kernel.astype(x.dtype)
        # Fused conv+IN(+act): the matmul path hands back its raw f32
        # accumulator so the norm statistics come straight off it (no bf16
        # round-trip, one read pass for both moments) and only the final
        # normalized activation narrows to x.dtype.
        fuse_norm = self.norm == "instance" and self.dilation == 1
        # UNIMATCH_STEM_LAX (default ON since round 5g): the 7x7/2 stem conv
        # via lax.conv — skips the space-to-depth transform entirely (whose
        # reshape+transpose pair cost 1.1-1.6 ms/forward, round-5e profile).
        # Measured WIN on every variant (r5g: flagship -2.0 ms, depth -0.6,
        # scale1 -1.8, stereo -1.3); the round-1 "lax.conv is slow" rule
        # holds for the wide-channel layers (a UNIMATCH_BB_LAX lever lost
        # +1.8 ms, r5f/5g decompose, and was removed) but not the 3-channel
        # stem, where the matmul form's s2d relayout dominates. Opt out
        # with UNIMATCH_STEM_LAX=0.
        stem_lax = (
            self.prefer_lax and cin <= 4 and self.dilation == 1
            and os.environ.get("UNIMATCH_STEM_LAX", "1") != "0"
        )
        if stem_lax:
            y = jax.lax.conv_general_dilated(
                x, kernel,
                window_strides=self.stride,
                padding=[(self.padding[0], self.padding[0]),
                         (self.padding[1], self.padding[1])],
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
                preferred_element_type=jnp.float32,
            ).astype(jnp.float32 if fuse_norm else x.dtype)
        elif self.dilation == 1:
            y = conv_via_matmul(
                x, kernel, self.stride, self.padding,
                out_dtype=jnp.float32 if fuse_norm else None,
            )
        else:
            y = jax.lax.conv_general_dilated(
                x,
                kernel,
                window_strides=self.stride,
                padding=[(self.padding[0], self.padding[0]), (self.padding[1], self.padding[1])],
                rhs_dilation=(self.dilation, self.dilation),
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
            )
        if self.use_bias:
            bias = self.param("bias", nn.initializers.zeros, (self.features,))
            y = y + bias.astype(y.dtype)
        if self.norm == "instance":
            y = _instance_norm_f32(y.astype(jnp.float32))
            y = _ACT_FNS[self.act](y).astype(x.dtype)
            return y
        return _ACT_FNS[self.act](y)


def conv2d(
    features: int,
    kernel: int | Tuple[int, int],
    stride: int | Tuple[int, int] = 1,
    padding: int | Tuple[int, int] = 0,
    dilation: int = 1,
    use_bias: bool = True,
    kernel_init=conv_kaiming_init,
    act=None,
    norm=None,
    prefer_lax: bool = False,
    name: str | None = None,
) -> Conv2d:
    if isinstance(kernel, int):
        kernel = (kernel, kernel)
    if isinstance(stride, int):
        stride = (stride, stride)
    if isinstance(padding, int):
        padding = (padding, padding)
    return Conv2d(
        features=features,
        kernel_size=kernel,
        stride=stride,
        padding=padding,
        dilation=dilation,
        use_bias=use_bias,
        kernel_init=kernel_init,
        act=act,
        norm=norm,
        prefer_lax=prefer_lax,
        name=name,
    )


class LayerNorm(nn.LayerNorm):
    """LayerNorm with torch eps."""

    epsilon: float = 1e-5


class Conv2dMulti(nn.Module):
    """Conv over a *virtual concat* of inputs without materializing it.

    Because convolution is linear in input channels, conv(concat(parts)) ==
    sum_i conv_i(part_i) with the kernel split along cin. Param layout is
    identical to Conv2d on the concatenated input ('kernel' [kh, kw, sum_cin,
    cout]), so torch checkpoint conversion is unchanged. Saves a full
    HBM round-trip of the concatenated tensor per call — the SepConvGRU's
    [h, x] concats alone are ~1.2 GB per refinement pass at Sintel scale.
    """

    features: int
    kernel_size: Tuple[int, int]
    padding: Tuple[int, int] = (0, 0)
    use_bias: bool = True
    kernel_init: Any = conv_kaiming_init
    act: Any = None

    @nn.compact
    def __call__(self, parts) -> jnp.ndarray:
        kh, kw = self.kernel_size
        cins = [p.shape[-1] for p in parts]
        kernel = self.param("kernel", self.kernel_init, (kh, kw, sum(cins), self.features))

        kernel = kernel.astype(parts[0].dtype)
        acc = None
        off = 0
        for p, cin in zip(parts, cins):
            y = conv_via_matmul(p, kernel[:, :, off : off + cin, :], (1, 1), self.padding)
            acc = y if acc is None else acc + y
            off += cin
        if self.use_bias:
            bias = self.param("bias", nn.initializers.zeros, (self.features,))
            acc = acc + bias.astype(acc.dtype)
        return _ACT_FNS[self.act](acc)


def conv2d_multi(features, kernel, padding=0, use_bias=True, act=None, name=None):
    if isinstance(kernel, int):
        kernel = (kernel, kernel)
    if isinstance(padding, int):
        padding = (padding, padding)
    return Conv2dMulti(features=features, kernel_size=kernel, padding=padding,
                       use_bias=use_bias, act=act, name=name)
