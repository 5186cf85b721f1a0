"""Fused convolution Pallas kernel for the refinement hot path.

fused_conv2d: one stride-1 'same' convolution over a *virtual concat* of
input parts, with bias and activation fused, the f32 tap accumulator resident
in VMEM, and each input part read exactly once per row-tile (plus halo).

Why: the XLA shifted-matmul conv lowering (models/layers.py:conv_via_matmul)
is reliable on this runtime but round-trips a full-map f32 partial through
HBM per tap — a K*K-tap conv moves ~K*K x (input + 2 x f32 output) bytes. At
the flagship refinement resolution (112x256, 128-384 channels) the GRU +
motion-encoder conv stack is ~0.7 GB of HBM traffic per refinement iteration;
fused, it is ~0.1 GB.

Mechanics: grid over (batch, row-tiles). BlockSpec index maps cannot express
overlapping (halo'd) blocks, so input parts stay in ANY/HBM memory and each
program DMAs its halo'd tile into a VMEM scratch explicitly. Taps are
statically unrolled: each tap is one [tile_rows*Wp, Cin_part] x [Cin_part, Cout]
MXU dot accumulated at a static (row, col) offset of the f32 accumulator.
Weight layout is the checkpoint layout ([kh, kw, sum_cin, cout], parts
concatenated along cin in call order) — conversion unaffected.
"""

from __future__ import annotations

import functools
from typing import Optional, Sequence

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_ACTS = {
    None: lambda x: x,
    "relu": lambda x: jnp.maximum(x, 0.0),
    "sigmoid": jax.nn.sigmoid,
    "tanh": jnp.tanh,
}


def _make_kernel(n_parts, kh, kw, tr, w_out, act):
    def kernel(*refs):
        hbm_refs = refs[:n_parts]
        w_ref = refs[n_parts]
        b_ref = refs[n_parts + 1]
        o_ref = refs[n_parts + 2]
        scratches = refs[n_parts + 3 : n_parts + 3 + n_parts]
        sems = refs[-1]

        i = pl.program_id(0)
        j = pl.program_id(1)
        rows = tr + kh - 1

        for p_i in range(n_parts):
            pltpu.make_async_copy(
                hbm_refs[p_i].at[i, pl.ds(j * tr, rows)], scratches[p_i], sems.at[p_i]
            ).start()
        for p_i in range(n_parts):
            pltpu.make_async_copy(
                hbm_refs[p_i].at[i, pl.ds(j * tr, rows)], scratches[p_i], sems.at[p_i]
            ).wait()

        cout = o_ref.shape[-1]
        acc = jnp.zeros((tr, w_out, cout), jnp.float32)
        off = 0
        for p_i in range(n_parts):
            s = scratches[p_i]
            cin = s.shape[-1]
            wp = s.shape[1]
            flat = s[...].reshape(rows * wp, cin)
            for u in range(kh):
                for v in range(kw):
                    part = jax.lax.dot_general(
                        flat, w_ref[u * kw + v, off : off + cin],
                        (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32,
                    ).reshape(rows, wp, cout)
                    acc = acc + jax.lax.slice(part, (u, v, 0), (u + tr, v + w_out, cout))
            off += cin

        acc = acc + b_ref[0].astype(jnp.float32)
        o_ref[0] = act(acc).astype(o_ref.dtype)

    return kernel


@functools.partial(
    jax.jit, static_argnames=("kh", "kw", "act", "interpret", "out_dtype")
)
def _fused_conv2d_impl(parts, kernel, bias, kh, kw, act, out_dtype, interpret):
    b, h, w, _ = parts[0].shape
    cout = kernel.shape[-1]
    ph, pw = (kh - 1) // 2, (kw - 1) // 2
    dt = parts[0].dtype

    # row-tile sized so scratch + f32 accumulator + tap partial stay well
    # under the ~16 MB VMEM budget
    cin_total = kernel.shape[2]
    per_row = w * (cin_total * 2 + cout * (4 + 4 + 2))  # scratch + acc + part + out
    tr = 16
    while tr > 4 and (tr + kh - 1) * per_row > 9 * 1024 * 1024:
        tr //= 2
    tr = min(tr, h)
    hp = -(-h // tr) * tr
    # second-to-last (W) dim of the DMA'd tile must be 8-aligned for Mosaic's
    # memref slicing, so round the padded width up to a multiple of 8
    wp = -(-(w + kw - 1) // 8) * 8

    padded = [
        jnp.pad(p, ((0, 0), (ph, hp - h + (kh - 1 - ph)), (pw, wp - w - pw), (0, 0)))
        for p in parts
    ]
    wmat = kernel.reshape(kh * kw, kernel.shape[2], cout).astype(dt)

    n_parts = len(parts)
    out = pl.pallas_call(
        _make_kernel(n_parts, kh, kw, tr, w, _ACTS[act]),
        grid=(b, hp // tr),
        in_specs=[pl.BlockSpec(memory_space=pltpu.HBM)] * n_parts
        + [
            pl.BlockSpec(
                (kh * kw, kernel.shape[2], cout), lambda i, j: (0, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec((1, cout), lambda i, j: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (1, tr, w, cout), lambda i, j: (i, j, 0, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((b, hp, w, cout), out_dtype),
        scratch_shapes=[
            pltpu.VMEM((tr + kh - 1, wp, p.shape[-1]), dt) for p in parts
        ]
        + [pltpu.SemaphoreType.DMA((n_parts,))],
        interpret=interpret,
    )(*padded, wmat, bias.reshape(1, cout).astype(dt))
    return out[:, :h]


def _reference_conv(parts, kernel, bias, kh, kw, act):
    """Differentiable jnp twin (used for the custom-vjp backward pass)."""
    x = parts[0] if len(parts) == 1 else jnp.concatenate(parts, axis=-1)
    y = jax.lax.conv_general_dilated(
        x, kernel.astype(x.dtype), (1, 1),
        [((kh - 1) // 2, kh // 2), ((kw - 1) // 2, kw // 2)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    ).astype(jnp.float32) + bias.astype(jnp.float32)
    return _ACTS[act](y).astype(x.dtype)


@functools.lru_cache(maxsize=None)
def _conv_with_vjp(kh: int, kw: int, act: Optional[str]):
    """Pallas forward + jnp-reference backward (pallas_call has no autodiff)."""

    @jax.custom_vjp
    def f(parts, kernel, bias):
        return _fused_conv2d_impl(parts, kernel, bias, kh, kw, act, parts[0].dtype, False)

    def fwd(parts, kernel, bias):
        return f(parts, kernel, bias), (parts, kernel, bias)

    def bwd(res, g):
        parts, kernel, bias = res
        _, vjp = jax.vjp(
            lambda p, k, b: _reference_conv(p, k, b, kh, kw, act), parts, kernel, bias
        )
        return vjp(g)

    f.defvjp(fwd, bwd)
    return f


def fused_conv2d(
    parts: Sequence[jnp.ndarray],
    kernel: jnp.ndarray,  # [kh, kw, sum_cin, cout]
    bias: Optional[jnp.ndarray] = None,
    act: Optional[str] = None,
    interpret: bool = False,
) -> jnp.ndarray:
    """act(conv2d(concat(parts, -1), kernel) + bias), stride 1, 'same' pad."""
    if not isinstance(parts, (list, tuple)):
        parts = [parts]
    parts = list(parts)
    kh, kw, cin, cout = kernel.shape
    assert cin == sum(p.shape[-1] for p in parts)
    if bias is None:
        bias = jnp.zeros((cout,), parts[0].dtype)

    if jax.default_backend() == "cpu" and not interpret:
        return _reference_conv(parts, kernel, bias, kh, kw, act)

    if interpret:
        return _fused_conv2d_impl(
            tuple(parts), kernel, bias, kh, kw, act, parts[0].dtype, interpret
        )
    return _conv_with_vjp(kh, kw, act)(tuple(parts), kernel, bias)
