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
