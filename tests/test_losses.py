"""Loss functions vs the reference implementations."""

import numpy as np
import pytest
import torch

import jax.numpy as jnp

from unimatch_tpu.losses import flow_loss, stereo_loss, depth_loss, depth_grad_loss
from unimatch_tpu.losses.depth import depth_metrics

from reference_oracle import requires_reference


@requires_reference
def test_flow_loss_matches_reference(rng):
    from loss.flow_loss import flow_loss_func

    b, h, w = 2, 16, 20
    preds = [(rng.randn(b, h, w, 2) * 3).astype(np.float32) for _ in range(3)]
    gt = (rng.randn(b, h, w, 2) * 3).astype(np.float32)
    valid = (rng.rand(b, h, w) > 0.3).astype(np.float32)

    loss, metrics = flow_loss([jnp.asarray(p) for p in preds], jnp.asarray(gt), jnp.asarray(valid))

    t_preds = [torch.from_numpy(p).permute(0, 3, 1, 2) for p in preds]
    ref_loss, ref_metrics = flow_loss_func(
        t_preds, torch.from_numpy(gt).permute(0, 3, 1, 2), torch.from_numpy(valid)
    )
    np.testing.assert_allclose(float(loss), float(ref_loss), rtol=1e-5)
    np.testing.assert_allclose(float(metrics["epe"]), float(ref_metrics["epe"]), rtol=1e-5)
    np.testing.assert_allclose(float(metrics["1px"]), float(ref_metrics["1px"]), rtol=1e-5)


@requires_reference
def test_stereo_loss_matches_reference(rng):
    """Reference computes stereo loss inline (main_stereo.py:414-430)."""
    import torch.nn.functional as TF

    b, h, w = 2, 16, 20
    preds = [(rng.rand(b, h, w) * 30).astype(np.float32) for _ in range(3)]
    gt = (rng.rand(b, h, w) * 30).astype(np.float32)
    valid = (rng.rand(b, h, w) > 0.3).astype(np.float32)

    loss, _ = stereo_loss([jnp.asarray(p) for p in preds], jnp.asarray(gt), jnp.asarray(valid))

    # torch oracle replicating main_stereo.py:414-430 semantics
    mask = torch.from_numpy(valid) > 0.5
    gt_t = torch.from_numpy(gt)
    total = 0.0
    n = len(preds)
    for i, p in enumerate(preds):
        w_i = 0.9 ** (n - 1 - i)
        total = total + w_i * TF.smooth_l1_loss(torch.from_numpy(p)[mask], gt_t[mask], reduction="mean")
    np.testing.assert_allclose(float(loss), float(total), rtol=1e-5)


@requires_reference
def test_depth_loss_matches_reference(rng):
    from loss.depth_loss import depth_loss_func, depth_grad_loss_func

    b, h, w = 2, 16, 24
    preds = [(rng.rand(b, h, w) * 9 + 0.5).astype(np.float32) for _ in range(2)]
    gt = (rng.rand(b, h, w) * 9 + 0.5).astype(np.float32)
    valid = (rng.rand(b, h, w) > 0.3).astype(np.float32)

    l1 = depth_loss([jnp.asarray(p) for p in preds], jnp.asarray(gt), jnp.asarray(valid))

    t_preds = [torch.from_numpy(p) for p in preds]
    ref = depth_loss_func(t_preds, torch.from_numpy(gt), torch.from_numpy(valid) > 0.5)
    np.testing.assert_allclose(float(l1), float(ref), rtol=1e-4)


def test_depth_metrics_sanity(rng):
    gt = (rng.rand(1, 8, 8) * 5 + 1).astype(np.float32)
    m = depth_metrics(jnp.asarray(gt), jnp.asarray(gt), jnp.ones((1, 8, 8)))
    assert float(m["abs_rel"]) < 1e-6
    assert float(m["a1"]) == 1.0
