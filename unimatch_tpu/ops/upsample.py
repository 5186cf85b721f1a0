"""Neighborhood extraction and RAFT-style convex upsampling (NHWC).

Reference semantics: torch F.unfold call sites (unimatch/utils.py:144,
attention.py:234-244) and `upsample_flow_with_mask` (utils.py:134-152).

TPU-first design: F.unfold becomes a stack of static shifted slices — XLA
fuses these into cheap windowed reads; no gather is involved.
"""

from __future__ import annotations

import jax.numpy as jnp


def extract_patches(x: jnp.ndarray, kernel_size: int, padding: int) -> jnp.ndarray:
    """Extract kernel_size×kernel_size zero-padded patches.

    x: [B, H, W, C] -> [B, H, W, k*k, C], patch index in kernel row-major order
    ((dy, dx) from (-p, -p)), matching torch F.unfold's enumeration.
    """
    b, h, w, c = x.shape
    k, p = kernel_size, padding
    xp = jnp.pad(x, ((0, 0), (p, p), (p, p), (0, 0)))
    slices = [
        xp[:, i : i + h, j : j + w, :]
        for i in range(k)
        for j in range(k)
    ]
    return jnp.stack(slices, axis=3)  # [B, H, W, k*k, C]


def upsample_with_mask(
    flow: jnp.ndarray, mask: jnp.ndarray, upsample_factor: int, is_depth: bool = False
) -> jnp.ndarray:
    """Convex upsampling: softmax-weighted combination of 3x3 neighbors.

    flow: [B, H, W, C_f]; mask: [B, H, W, 9*K*K] (channel layout (9, Ky, Kx),
    '9' slowest — the layout produced by a conv head whose torch channel dim
    was 9*K*K). Returns [B, K*H, K*W, C_f]. Reference utils.py:134-152.

    A banded Pallas form of this op (softmax + convex combination in VMEM)
    was built and measured in rounds 4-5: no reliable in-situ win once the
    round-5 combo removed the surrounding traffic (docs/PERF_NOTES.md
    round-5d) — deleted, XLA's fusion of this form is sufficient.
    """
    b, h, w, cf = flow.shape
    k = upsample_factor
    # The mask stays [.., 9, K*K] (K*K = 64 lanes) through the softmax: the
    # [.., 9, K, K] 6-D shape forces a (K, K)-minor layout that lane-pads
    # K -> 128 and materializes 16x the logical bytes (the round-5e profile
    # measured the mask-head conv writing its output in that layout at
    # ~0.3 ms/forward per variant). Arithmetic is unchanged.
    m = mask.reshape(b, h, w, 9, k * k)
    m = jnp.asarray(jnp.exp(m - jnp.max(m, axis=3, keepdims=True)))
    m = m / jnp.sum(m, axis=3, keepdims=True)  # softmax over the 9 neighbors

    multiplier = 1.0 if is_depth else float(k)
    patches = extract_patches(flow * multiplier, 3, 1)  # [B, H, W, 9, C_f]

    # out[b,h,w,m,c] = sum_n m[b,h,w,n,m] * patches[b,h,w,n,c], m = ky*K+kx
    up = jnp.einsum("bhwnm,bhwnc->bhwmc", m, patches)
    # [B, H, W, Ky, Kx, C] -> [B, H, Ky, W, Kx, C] -> [B, H*K, W*K, C]
    up = up.reshape(b, h, w, k, k, cf)
    up = up.transpose(0, 1, 3, 2, 4, 5).reshape(b, h * k, w * k, cf)
    return up
