"""Stereo disparity training loss.

Semantics parity: the reference computes this inline in main_stereo.py:414-430
— per-prediction smooth-L1 against ground-truth disparity, weighted
0.9^(N-1-i), masked to valid pixels.
"""

from __future__ import annotations

from typing import Dict, Sequence, Tuple

import jax.numpy as jnp


def _smooth_l1(x: jnp.ndarray) -> jnp.ndarray:
    ax = jnp.abs(x)
    return jnp.where(ax < 1.0, 0.5 * x * x, ax - 0.5)


def stereo_loss(
    disp_preds: Sequence[jnp.ndarray],  # each [B, H, W]
    disp_gt: jnp.ndarray,  # [B, H, W]
    valid: jnp.ndarray,  # [B, H, W] bool/float
    gamma: float = 0.9,
) -> Tuple[jnp.ndarray, Dict[str, jnp.ndarray]]:
    n = len(disp_preds)
    vw = (valid >= 0.5).astype(jnp.float32)
    denom = jnp.maximum(vw.sum(), 1.0)

    total = 0.0
    for i, pred in enumerate(disp_preds):
        w = gamma ** (n - 1 - i)
        total = total + w * (_smooth_l1(pred - disp_gt) * vw).sum() / denom

    epe_map = jnp.abs(disp_preds[-1] - disp_gt)
    metrics = {
        "epe": (epe_map * vw).sum() / denom,
        "d1": (((epe_map > 3.0) & (epe_map / jnp.maximum(jnp.abs(disp_gt), 1e-6) > 0.05)).astype(jnp.float32) * vw).sum() / denom,
        "thres_1": ((epe_map > 1.0).astype(jnp.float32) * vw).sum() / denom,
        "thres_3": ((epe_map > 3.0).astype(jnp.float32) * vw).sum() / denom,
    }
    return total, metrics
