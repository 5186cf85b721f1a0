"""Optical-flow training loss and metrics.

Semantics parity: reference loss/flow_loss.py:4-37 — exponentially weighted
(gamma^(N-1-i)) multi-prediction L1 with a validity mask that also excludes
extreme flows (|flow| > max_flow).
"""

from __future__ import annotations

from typing import Dict, Sequence, Tuple

import jax.numpy as jnp


def flow_loss(
    flow_preds: Sequence[jnp.ndarray],  # each [B, H, W, 2]
    flow_gt: jnp.ndarray,  # [B, H, W, 2]
    valid: jnp.ndarray,  # [B, H, W]
    gamma: float = 0.9,
    max_flow: float = 400.0,
) -> Tuple[jnp.ndarray, Dict[str, jnp.ndarray]]:
    n = len(flow_preds)
    mag = jnp.sqrt(jnp.sum(flow_gt**2, axis=-1))
    valid = (valid >= 0.5) & (mag < max_flow)
    vw = valid.astype(jnp.float32)
    denom = jnp.maximum(vw.sum(), 1.0)

    total = 0.0
    for i, pred in enumerate(flow_preds):
        w = gamma ** (n - 1 - i)
        # NOTE: plain mean over ALL elements with invalid zeroed — the
        # reference does (valid * |err|).mean(), NOT a valid-count mean
        # (flow_loss.py:21); scale of the loss depends on it.
        total = total + w * (jnp.abs(pred - flow_gt) * vw[..., None]).mean()

    epe_map = jnp.sqrt(jnp.sum((flow_preds[-1] - flow_gt) ** 2, axis=-1))
    epe_valid = epe_map * vw
    metrics = {
        "epe": epe_valid.sum() / denom,
        "1px": ((epe_map > 1.0).astype(jnp.float32) * vw).sum() / denom,
        "3px": ((epe_map > 3.0).astype(jnp.float32) * vw).sum() / denom,
        "5px": ((epe_map > 5.0).astype(jnp.float32) * vw).sum() / denom,
    }
    return total, metrics
