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
def test_swin_layer_attention_matches_split(rng, with_shift, cross):
    """The fused layer attention (projection in-kernel) == projecting then
    split_window_attention then merge+LayerNorm, self and cross, shifted
    and unshifted (values identical up to f32 summation order)."""
    import jax

    b, h, w, c, k = 2, 8, 16, 32, 2
    src = rng.randn(b, h * w, c).astype(np.float32)
    tgt = rng.randn(b, h * w, c).astype(np.float32)
    wq = rng.randn(c, c).astype(np.float32) * 0.2
    wk = rng.randn(c, c).astype(np.float32) * 0.2
    wv = rng.randn(c, c).astype(np.float32) * 0.2
    wm = rng.randn(c, c).astype(np.float32) * 0.2
    gamma = rng.rand(c).astype(np.float32) + 0.5
    beta = rng.randn(c).astype(np.float32) * 0.1
    mask = W.generate_shift_window_attn_mask(h, w, h // k, w // k, h // k // 2, w // k // 2)

    srcj, tgtj = jnp.asarray(src), jnp.asarray(tgt)
    q = srcj @ wq
    kk_ = (tgtj if cross else srcj) @ wk
    v = (tgtj if cross else srcj) @ wv
    attn = A.split_window_attention(
        q, kk_, v, k, with_shift, h, w, attn_mask=mask if with_shift else None,
    )
    y = np.asarray(attn @ wm, np.float32)
    mean = y.mean(-1, keepdims=True)
    var = ((y - mean) ** 2).mean(-1, keepdims=True)
    ref = (y - mean) / np.sqrt(var + 1e-5) * gamma + beta

    if cross:
        got = A.swin_layer_attention(
            srcj, tgtj, jnp.asarray(wq), jnp.asarray(np.concatenate([wk, wv], 1)),
            k, with_shift, h, w, attn_mask=mask if with_shift else None,
            epilogue=(jnp.asarray(wm), jnp.asarray(gamma), jnp.asarray(beta)),
        )
    else:
        got = A.swin_layer_attention(
            jnp.asarray(src), None, jnp.asarray(np.concatenate([wq, wk, wv], 1)), None,
            k, with_shift, h, w, attn_mask=mask if with_shift else None,
            epilogue=(jnp.asarray(wm), jnp.asarray(gamma), jnp.asarray(beta)),
        )
    np.testing.assert_allclose(np.asarray(got), ref, rtol=2e-4, atol=2e-4)


@pytest.mark.parametrize("with_shift", [False, True])
@pytest.mark.parametrize("cross", [False, True])
def test_swin_spatial_kernel_interpret_matches_reference(rng, with_shift, cross):
    """The Pallas spatial layer kernel (interpret mode) == its jnp twin,
    single-block windows, with the merge+LN epilogue."""
    from unimatch_tpu.kernels.window_attention import (
        _swin_spatial_impl, _swin_spatial_reference,
    )

    b, h, w, c, k = 1, 16, 16, 128, 2
    src = jnp.asarray(rng.randn(b, h, w, c).astype(np.float32) * 0.3)
    tgt = jnp.asarray(rng.randn(b, h, w, c).astype(np.float32) * 0.3)
    wqkv = jnp.asarray(rng.randn(c, 3 * c).astype(np.float32) * 0.1)
    wm = jnp.asarray(rng.randn(c, c).astype(np.float32) * 0.1)
    gamma = jnp.asarray(rng.rand(c).astype(np.float32) + 0.5)
    beta = jnp.asarray(rng.randn(c).astype(np.float32) * 0.1)
    mask = (
        W.generate_shift_window_attn_mask(h, w, h // k, w // k, h // k // 2, w // k // 2)
        if with_shift else None
    )
    if cross:
        args = (src, tgt, wqkv[:, :c], wqkv[:, c:], mask, wm, gamma, beta, k)
    else:
        args = (src, None, wqkv, None, mask, wm, gamma, beta, k)
    got = _swin_spatial_impl(*args, fuse_res=not cross, interpret=True)
    ref = _swin_spatial_reference(*args, fuse_res=not cross)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), rtol=3e-5, atol=3e-5)


@pytest.mark.parametrize("cross", [False, True])
def test_swin_spatial_blocked_interpret_matches_reference(rng, cross):
    """Large-window (row-sub-blocked) spatial layer kernel == jnp twin."""
    from unimatch_tpu.kernels.window_attention import (
        _swin_spatial_impl, _swin_spatial_reference,
    )

    b, h, w, c, k = 1, 16, 64, 128, 1  # window L = 1024 > 512 -> blocked path
    src = jnp.asarray(rng.randn(b, h, w, c).astype(np.float32) * 0.2)
    tgt = jnp.asarray(rng.randn(b, h, w, c).astype(np.float32) * 0.2)
    wqkv = jnp.asarray(rng.randn(c, 3 * c).astype(np.float32) * 0.1)
    if cross:
        args = (src, tgt, wqkv[:, :c], wqkv[:, c:], None, None, None, None, k)
    else:
        args = (src, None, wqkv, None, None, None, None, None, k)
    got = _swin_spatial_impl(*args, interpret=True)
    ref = _swin_spatial_reference(*args)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), rtol=2e-5, atol=2e-5)


def test_swin_spatial_blocked_bias_epilogue_interpret_matches_reference(rng):
    """Row-sub-blocked spatial kernel with mask + epilogue == jnp twin."""
    from unimatch_tpu.kernels.window_attention import (
        _swin_spatial_impl, _swin_spatial_reference,
    )

    b, h, w, c, k = 1, 32, 32, 128, 1
    l = h * w  # 1024 > 512 -> blocked path
    src = jnp.asarray(rng.randn(b, h, w, c).astype(np.float32) * 0.2)
    wqkv = jnp.asarray(rng.randn(c, 3 * c).astype(np.float32) * 0.1)
    wm = jnp.asarray(rng.randn(c, c).astype(np.float32) * 0.1)
    gamma = jnp.asarray(rng.rand(c).astype(np.float32) + 0.5)
    beta = jnp.asarray(rng.randn(c).astype(np.float32) * 0.1)
    bias = jnp.asarray((rng.rand(k * k, l, l) > 0.5).astype(np.float32) * -100.0)
    args = (src, None, wqkv, None, bias, wm, gamma, beta, k)
    got = _swin_spatial_impl(*args, interpret=True)
    ref = _swin_spatial_reference(*args)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), rtol=3e-5, atol=3e-5)


def test_swin_spatial_transformer_dispatch_matches(rng, monkeypatch):
    """FeatureTransformer output identical with UNIMATCH_SWIN_SPATIAL on/off
    (CPU: the fused path runs the jnp twin; same math, same rounding up to
    the kernel's f32 LayerNorm convention)."""
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


def test_swin_spatial_param_tree_unchanged(rng, monkeypatch):
    """init under UNIMATCH_SWIN_SPATIAL=1 produces the same param tree as
    the unfused path (checkpoint compatibility)."""
    import jax
    from unimatch_tpu.models.transformer import FeatureTransformer

    model = FeatureTransformer(num_layers=1, d_model=32, ffn_dim_expansion=4)
    f0 = jnp.asarray(rng.randn(1, 8, 16, 32).astype(np.float32))
    f1 = jnp.asarray(rng.randn(1, 8, 16, 32).astype(np.float32))
    monkeypatch.setenv("UNIMATCH_SWIN_SPATIAL", "0")
    p0 = model.init(jax.random.PRNGKey(0), f0, f1, attn_type="swin", attn_num_splits=2)
    monkeypatch.setenv("UNIMATCH_SWIN_SPATIAL", "1")
    p1 = model.init(jax.random.PRNGKey(0), f0, f1, attn_type="swin", attn_num_splits=2)
    t0 = jax.tree_util.tree_structure(p0)
    t1 = jax.tree_util.tree_structure(p1)
    assert t0 == t1
    for a, b in zip(jax.tree.leaves(p0), jax.tree.leaves(p1)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_swin_spatial_gradients(rng, monkeypatch):
    """Gradients flow through the fused layer (custom_vjp twin) and match
    the unfused path."""
    import jax
    from unimatch_tpu.models.transformer import FeatureTransformer

    model = FeatureTransformer(num_layers=1, d_model=32, ffn_dim_expansion=4)
    f0 = jnp.asarray(rng.randn(1, 8, 16, 32).astype(np.float32))
    f1 = jnp.asarray(rng.randn(1, 8, 16, 32).astype(np.float32))
    params = model.init(jax.random.PRNGKey(0), f0, f1, attn_type="swin", attn_num_splits=2)

    def loss(p):
        a, b = model.apply(p, f0, f1, attn_type="swin", attn_num_splits=2)
        return (a.astype(jnp.float32) ** 2).mean() + (b.astype(jnp.float32) ** 2).mean()

    monkeypatch.setenv("UNIMATCH_SWIN_SPATIAL", "0")
    g0 = jax.grad(loss)(params)
    monkeypatch.setenv("UNIMATCH_SWIN_SPATIAL", "1")
    g1 = jax.grad(loss)(params)
    for a, b in zip(jax.tree.leaves(g0), jax.tree.leaves(g1)):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a), rtol=2e-4, atol=2e-5)
