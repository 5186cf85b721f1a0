"""Attention primitives vs the PyTorch reference (numerical oracle)."""

import numpy as np
import pytest
import torch

import jax.numpy as jnp

from unimatch_tpu.ops import attention_ops as A
from unimatch_tpu.ops import windows as W

from reference_oracle import requires_reference


@requires_reference
def test_full_attention(rng):
    from unimatch.attention import single_head_full_attention

    b, l, c = 2, 40, 16
    q = rng.randn(b, l, c).astype(np.float32)
    k = rng.randn(b, l, c).astype(np.float32)
    v = rng.randn(b, l, c).astype(np.float32)

    out = A.full_attention(jnp.asarray(q), jnp.asarray(k), jnp.asarray(v))
    ref = single_head_full_attention(torch.from_numpy(q), torch.from_numpy(k), torch.from_numpy(v))
    np.testing.assert_allclose(np.asarray(out), ref.numpy(), rtol=1e-4, atol=1e-5)


@requires_reference
def test_full_attention_1d(rng):
    from unimatch.attention import single_head_full_attention_1d

    b, h, w, c = 2, 5, 8, 16
    q = rng.randn(b, h * w, c).astype(np.float32)
    k = rng.randn(b, h * w, c).astype(np.float32)
    v = rng.randn(b, h * w, c).astype(np.float32)

    out = A.full_attention_1d(jnp.asarray(q), jnp.asarray(k), jnp.asarray(v), h, w)
    ref = single_head_full_attention_1d(
        torch.from_numpy(q), torch.from_numpy(k), torch.from_numpy(v), h=h, w=w
    )
    np.testing.assert_allclose(np.asarray(out), ref.numpy(), rtol=1e-4, atol=1e-5)


@requires_reference
@pytest.mark.parametrize("with_shift", [False, True])
def test_split_window_attention(rng, with_shift):
    from unimatch.attention import single_head_split_window_attention
    from unimatch.utils import generate_shift_window_attn_mask

    b, h, w, c, k = 2, 8, 12, 16, 2
    q = rng.randn(b, h * w, c).astype(np.float32)
    kk = rng.randn(b, h * w, c).astype(np.float32)
    v = rng.randn(b, h * w, c).astype(np.float32)

    mask = W.generate_shift_window_attn_mask(h, w, h // k, w // k, h // k // 2, w // k // 2)
    out = A.split_window_attention(
        jnp.asarray(q), jnp.asarray(kk), jnp.asarray(v), k, with_shift, h, w,
        attn_mask=mask if with_shift else None,
    )

    tmask = generate_shift_window_attn_mask(
        (h, w), h // k, w // k, h // k // 2, w // k // 2, device=torch.device("cpu")
    )
    ref = single_head_split_window_attention(
        torch.from_numpy(q), torch.from_numpy(kk), torch.from_numpy(v),
        num_splits=k, with_shift=with_shift, h=h, w=w,
        attn_mask=tmask if with_shift else None,
    )
    np.testing.assert_allclose(np.asarray(out), ref.numpy(), rtol=1e-4, atol=1e-5)


@requires_reference
@pytest.mark.parametrize("with_shift", [False, True])
def test_split_window_attention_1d(rng, with_shift):
    from unimatch.attention import single_head_split_window_attention_1d
    from unimatch.utils import generate_shift_window_attn_mask_1d

    b, h, w, c, k = 2, 5, 16, 16, 4
    q = rng.randn(b, h * w, c).astype(np.float32)
    kk = rng.randn(b, h * w, c).astype(np.float32)
    v = rng.randn(b, h * w, c).astype(np.float32)

    mask = W.generate_shift_window_attn_mask_1d(w, w // k, w // k // 2)
    out = A.split_window_attention_1d(
        jnp.asarray(q), jnp.asarray(kk), jnp.asarray(v), k, with_shift, h, w,
        attn_mask=mask if with_shift else None,
    )

    tmask = generate_shift_window_attn_mask_1d(w, w // k, w // k // 2, device=torch.device("cpu"))
    ref = single_head_split_window_attention_1d(
        torch.from_numpy(q), torch.from_numpy(kk), torch.from_numpy(v),
        num_splits=k, with_shift=with_shift, h=h, w=w,
        attn_mask=tmask if with_shift else None,
    )
    np.testing.assert_allclose(np.asarray(out), ref.numpy(), rtol=1e-4, atol=1e-5)


@pytest.mark.parametrize("with_shift", [False, True])
@pytest.mark.parametrize("cross", [False, True])
def test_swin_attention_packed_matches_split(rng, with_shift, cross):
    """Packed/spatial swin attention == the [N, L, C] split form, self and
    cross, shifted and unshifted (values identical up to f32 summation)."""
    b, h, w, c, k = 2, 8, 16, 32, 2
    q = rng.randn(b, h * w, c).astype(np.float32)
    kk = rng.randn(b, h * w, c).astype(np.float32)
    v = rng.randn(b, h * w, c).astype(np.float32)
    mask = W.generate_shift_window_attn_mask(h, w, h // k, w // k, h // k // 2, w // k // 2)

    ref = A.split_window_attention(
        jnp.asarray(q), jnp.asarray(kk), jnp.asarray(v), k, with_shift, h, w,
        attn_mask=mask if with_shift else None,
    )
    if cross:
        packed = A.swin_attention_packed(
            jnp.asarray(q), jnp.concatenate([jnp.asarray(kk), jnp.asarray(v)], -1),
            k, with_shift, h, w, attn_mask=mask if with_shift else None,
        )
    else:
        packed = A.swin_attention_packed(
            jnp.concatenate([jnp.asarray(q), jnp.asarray(kk), jnp.asarray(v)], -1),
            None, k, with_shift, h, w, attn_mask=mask if with_shift else None,
        )
    np.testing.assert_allclose(np.asarray(packed), np.asarray(ref), rtol=1e-5, atol=1e-5)


@pytest.mark.parametrize("with_shift", [False, True])
def test_swin_spatial_kernel_interpret_matches_reference(rng, with_shift):
    """The Pallas spatial kernel (interpret mode) == its jnp twin."""
    from unimatch_tpu.kernels.window_attention import (
        _swin_spatial_impl, _swin_spatial_reference,
    )

    b, h, w, c, k = 1, 16, 16, 128, 2
    qkv = jnp.asarray(rng.randn(b, h, w, 3 * c).astype(np.float32))
    mask = (
        W.generate_shift_window_attn_mask(h, w, h // k, w // k, h // k // 2, w // k // 2)
        if with_shift else None
    )
    got = _swin_spatial_impl(qkv, None, mask, None, None, None, None, k, interpret=True)
    ref = _swin_spatial_reference(qkv, None, mask, None, None, None, None, k)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), rtol=2e-5, atol=2e-5)

    q = qkv[..., :c]
    kv = qkv[..., c:]
    got = _swin_spatial_impl(q, kv, mask, None, None, None, None, k, interpret=True)
    ref = _swin_spatial_reference(q, kv, mask, None, None, None, None, k)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), rtol=2e-5, atol=2e-5)


def test_swin_spatial_transformer_dispatch_matches(rng, monkeypatch):
    """FeatureTransformer output identical with UNIMATCH_SWIN_SPATIAL on/off
    (CPU: the packed path runs the jnp twin; same math, same rounding)."""
    import jax
    from unimatch_tpu.models.transformer import FeatureTransformer

    model = FeatureTransformer(num_layers=2, d_model=32, ffn_dim_expansion=4)
    f0 = jnp.asarray(rng.randn(1, 8, 16, 32).astype(np.float32))
    f1 = jnp.asarray(rng.randn(1, 8, 16, 32).astype(np.float32))
    params = model.init(jax.random.PRNGKey(0), f0, f1, attn_type="swin", attn_num_splits=2)

    monkeypatch.setenv("UNIMATCH_SWIN_SPATIAL", "0")
    a0, a1 = model.apply(params, f0, f1, attn_type="swin", attn_num_splits=2)
    monkeypatch.setenv("UNIMATCH_SWIN_SPATIAL", "1")
    b0, b1 = model.apply(params, f0, f1, attn_type="swin", attn_num_splits=2)
    np.testing.assert_allclose(np.asarray(b0), np.asarray(a0), rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(b1), np.asarray(a1), rtol=1e-5, atol=1e-5)


@pytest.mark.parametrize("cross", [False, True])
def test_swin_spatial_blocked_interpret_matches_reference(rng, cross):
    """Large-window (row-sub-blocked) spatial kernel == jnp twin."""
    from unimatch_tpu.kernels.window_attention import (
        _swin_spatial_impl, _swin_spatial_reference,
    )

    b, h, w, c, k = 1, 16, 64, 128, 1  # window L = 1024 > 512 -> blocked path
    qkv = jnp.asarray(rng.randn(b, h, w, 3 * c).astype(np.float32) * 0.2)
    if cross:
        q, kv = qkv[..., :c], qkv[..., c:]
        got = _swin_spatial_impl(q, kv, None, None, None, None, None, k, interpret=True)
        ref = _swin_spatial_reference(q, kv, None, None, None, None, None, k)
    else:
        got = _swin_spatial_impl(qkv, None, None, None, None, None, None, k, interpret=True)
        ref = _swin_spatial_reference(qkv, None, None, None, None, None, None, k)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), rtol=2e-5, atol=2e-5)


def test_swin_spatial_blocked_bias_interpret_matches_reference(rng):
    """Row-sub-blocked spatial kernel with additive mask == jnp twin."""
    from unimatch_tpu.kernels.window_attention import (
        _swin_spatial_impl, _swin_spatial_reference,
    )

    b, h, w, c, k = 1, 32, 32, 128, 2  # window 16x16 -> L = 256... use k=1
    k = 1
    l = h * w  # 1024 > 512 -> blocked path
    qkv = jnp.asarray(rng.randn(b, h, w, 3 * c).astype(np.float32) * 0.2)
    bias = jnp.asarray((rng.rand(k * k, l, l) > 0.5).astype(np.float32) * -100.0)
    got = _swin_spatial_impl(qkv, None, bias, None, None, None, None, k, interpret=True)
    ref = _swin_spatial_reference(qkv, None, bias, None, None, None, None, k)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), rtol=2e-5, atol=2e-5)


@pytest.mark.parametrize("with_src", [False, True])
def test_swin_spatial_epilogue_interpret_matches_reference(rng, with_src):
    """Fused merge+LayerNorm(+residual) epilogue == jnp twin (interpret)."""
    from unimatch_tpu.kernels.window_attention import (
        _swin_spatial_impl, _swin_spatial_reference,
    )

    b, h, w, c, k = 1, 16, 16, 128, 2
    qkv = jnp.asarray(rng.randn(b, h, w, 3 * c).astype(np.float32) * 0.3)
    mw = jnp.asarray(rng.randn(c, c).astype(np.float32) * 0.1)
    gamma = jnp.asarray(rng.rand(c).astype(np.float32) + 0.5)
    beta = jnp.asarray(rng.randn(c).astype(np.float32) * 0.1)
    src = jnp.asarray(rng.randn(b, h, w, c).astype(np.float32)) if with_src else None
    got = _swin_spatial_impl(qkv, None, None, mw, gamma, beta, src, k, interpret=True)
    ref = _swin_spatial_reference(qkv, None, None, mw, gamma, beta, src, k)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), rtol=3e-5, atol=3e-5)
