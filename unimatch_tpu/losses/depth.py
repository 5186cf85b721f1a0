"""Depth training losses (inverse-depth L1 + gradient matching) and metrics.

Semantics parity: reference loss/depth_loss.py —
  depth_loss_func      :72-91  (L1 in inverse-depth space, gamma-weighted)
  depth_grad_loss_func :27-69  (multi-scale inverse-depth gradient loss)
  compute_errors       :6-24   (abs_rel / sq_rel / rmse / rmse_log / a1,a2,a3)
"""

from __future__ import annotations

from typing import Dict, Sequence

import jax.numpy as jnp


def depth_loss(
    depth_preds: Sequence[jnp.ndarray],  # each [B, H, W] metric depth
    depth_gt: jnp.ndarray,  # [B, H, W]
    valid: jnp.ndarray,  # [B, H, W]
    gamma: float = 0.9,
) -> jnp.ndarray:
    """Gamma-weighted L1 on *inverse* depth over valid pixels."""
    n = len(depth_preds)
    vw = (valid >= 0.5).astype(jnp.float32)
    denom = jnp.maximum(vw.sum(), 1.0)
    inv_gt = jnp.where(vw > 0, 1.0 / jnp.maximum(depth_gt, 1e-6), 0.0)

    total = 0.0
    for i, pred in enumerate(depth_preds):
        w = gamma ** (n - 1 - i)
        inv_pred = 1.0 / jnp.maximum(pred, 1e-6)
        total = total + w * (jnp.abs(inv_pred - inv_gt) * vw).sum() / denom
    return total


def _grad_x(d):
    return d[:, :, :-1] - d[:, :, 1:]


def _grad_y(d):
    return d[:, :-1, :] - d[:, 1:, :]


def depth_grad_loss(
    depth_preds: Sequence[jnp.ndarray],
    depth_gt: jnp.ndarray,
    valid: jnp.ndarray,
    gamma: float = 0.9,
    num_scales: int = 4,
) -> jnp.ndarray:
    """Multi-scale gradient-matching loss on inverse depth (reference :27-69)."""
    n = len(depth_preds)
    vw = (valid >= 0.5).astype(jnp.float32)
    inv_gt_full = jnp.where(vw > 0, 1.0 / jnp.maximum(depth_gt, 1e-6), 0.0)

    total = 0.0
    for i, pred in enumerate(depth_preds):
        w = gamma ** (n - 1 - i)
        inv_pred_full = 1.0 / jnp.maximum(pred, 1e-6)
        loss_i = 0.0
        for s in range(num_scales):
            step = 2**s
            ip = inv_pred_full[:, ::step, ::step]
            ig = inv_gt_full[:, ::step, ::step]
            m = vw[:, ::step, ::step]
            diff = (ip - ig) * m
            mx = m[:, :, :-1] * m[:, :, 1:]
            my = m[:, :-1, :] * m[:, 1:, :]
            gx = jnp.abs(_grad_x(diff)) * mx
            gy = jnp.abs(_grad_y(diff)) * my
            loss_i = loss_i + gx.sum() / jnp.maximum(mx.sum(), 1.0) + gy.sum() / jnp.maximum(
                my.sum(), 1.0
            )
        total = total + w * loss_i
    return total


def depth_metrics(pred: jnp.ndarray, gt: jnp.ndarray, valid: jnp.ndarray) -> Dict[str, jnp.ndarray]:
    """abs_rel / sq_rel / rmse / rmse_log / a1 / a2 / a3 over valid pixels."""
    vw = (valid >= 0.5).astype(jnp.float32)
    denom = jnp.maximum(vw.sum(), 1.0)
    gt_s = jnp.maximum(gt, 1e-6)
    pred_s = jnp.maximum(pred, 1e-6)
    thresh = jnp.maximum(gt_s / pred_s, pred_s / gt_s)

    def vmean(x):
        return (x * vw).sum() / denom

    return {
        "abs_rel": vmean(jnp.abs(pred - gt) / gt_s),
        "sq_rel": vmean((pred - gt) ** 2 / gt_s),
        "rmse": jnp.sqrt(vmean((pred - gt) ** 2)),
        "rmse_log": jnp.sqrt(vmean((jnp.log(gt_s) - jnp.log(pred_s)) ** 2)),
        "a1": vmean((thresh < 1.25).astype(jnp.float32)),
        "a2": vmean((thresh < 1.25**2).astype(jnp.float32)),
        "a3": vmean((thresh < 1.25**3).astype(jnp.float32)),
    }
