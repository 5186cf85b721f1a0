"""Pallas kernels vs their jnp reference twins (interpret mode on CPU)."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from unimatch_tpu.kernels.attention_expectation import attention_expectation


def _reference(q, k, v):
    c = q.shape[-1]
    scores = jnp.einsum("blc,bmc->blm", q, k, preferred_element_type=jnp.float32) / np.sqrt(c)
    prob = jax.nn.softmax(scores, axis=-1)
    return jnp.einsum("blm,bmv->blv", prob, v.astype(jnp.float32))


@pytest.mark.smoke
def test_attention_expectation_matches_reference(rng):
    b, l, c = 2, 300, 128  # l deliberately not a multiple of the block size
    q = jnp.asarray(rng.randn(b, l, c).astype(np.float32))
    k = jnp.asarray(rng.randn(b, l, c).astype(np.float32))
    v = jnp.asarray((rng.rand(b, l, 2) * 50).astype(np.float32))

    got = attention_expectation(q, k, v, block_q=256, interpret=True)
    want = _reference(q, k, v)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=1e-5, atol=1e-4)


def test_attention_expectation_grid_values(rng):
    """v = coordinate grid (the global-correlation use case)."""
    b, l, c = 1, 512, 64
    q = jnp.asarray(rng.randn(b, l, c).astype(np.float32))
    k = jnp.asarray(rng.randn(b, l, c).astype(np.float32))
    grid = jnp.broadcast_to(jnp.arange(l, dtype=jnp.float32)[None, :, None], (b, l, 2))

    got = attention_expectation(q, k, grid, block_q=256, interpret=True)
    want = _reference(q, k, grid)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=1e-5, atol=1e-3)


@pytest.mark.smoke
def test_window_attention_matches_reference(rng):
    from unimatch_tpu.kernels.window_attention import window_attention

    n, l, c = 8, 300, 128  # l not a multiple of block sizes
    q = jnp.asarray(rng.randn(n, l, c).astype(np.float32))
    k = jnp.asarray(rng.randn(n, l, c).astype(np.float32))
    v = jnp.asarray(rng.randn(n, l, c).astype(np.float32))

    got = window_attention(q, k, v, interpret=True)
    scores = jnp.einsum("nlc,nmc->nlm", q, k, preferred_element_type=jnp.float32) / np.sqrt(c)
    want = jnp.einsum("nlm,nmc->nlc", jax.nn.softmax(scores, -1), v)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=1e-4, atol=1e-4)


def test_window_attention_with_bias(rng):
    from unimatch_tpu.kernels.window_attention import window_attention

    nw, l, c = 4, 256, 128
    n = 2 * nw  # two batches of nw windows
    q = jnp.asarray(rng.randn(n, l, c).astype(np.float32))
    k = jnp.asarray(rng.randn(n, l, c).astype(np.float32))
    v = jnp.asarray(rng.randn(n, l, c).astype(np.float32))
    mask = jnp.asarray(np.where(rng.rand(nw, l, l) > 0.5, 0.0, -100.0).astype(np.float32))

    got = window_attention(q, k, v, bias=mask, interpret=True)
    scores = jnp.einsum("nlc,nmc->nlm", q, k, preferred_element_type=jnp.float32) / np.sqrt(c)
    scores = scores + jnp.tile(mask, (2, 1, 1))
    want = jnp.einsum("nlm,nmc->nlc", jax.nn.softmax(scores, -1), v)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=1e-4, atol=1e-4)


@pytest.mark.smoke
def test_fused_ffn_matches_reference(rng):
    from unimatch_tpu.kernels.ffn import fused_ffn

    n, l, c, hdim = 2, 300, 128, 1024  # l not a multiple of the tile
    src = jnp.asarray(rng.randn(n, l, c).astype(np.float32))
    msg = jnp.asarray(rng.randn(n, l, c).astype(np.float32))
    w0 = jnp.asarray(rng.randn(2 * c, hdim).astype(np.float32) * 0.05)
    w2 = jnp.asarray(rng.randn(hdim, c).astype(np.float32) * 0.05)
    gamma = jnp.asarray(rng.rand(c).astype(np.float32) + 0.5)
    beta = jnp.asarray(rng.randn(c).astype(np.float32) * 0.1)

    got = fused_ffn(src, msg, w0, w2, gamma, beta, interpret=True)

    # jnp twin (the unfused TransformerLayer path)
    y = src @ w0[:c] + msg @ w0[c:]
    y = jax.nn.gelu(y, approximate=False)
    y = (y @ w2).astype(jnp.float32)
    mean = jnp.mean(y, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(y - mean), axis=-1, keepdims=True)
    y = (y - mean) * jax.lax.rsqrt(var + 1e-5)
    want = src + y * gamma + beta
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=1e-4, atol=1e-4)


@pytest.mark.smoke
def test_corr_volume_build_matches_reference(rng):
    from unimatch_tpu.kernels.corr_volume import build_volume, _build_reference

    b, p, c, m = 2, 300, 128, 6 * 256  # p not a multiple of the block
    f0 = jnp.asarray(rng.randn(b, p, c).astype(np.float32))
    f1b = jnp.asarray(rng.randn(b, m, c).astype(np.float32))
    got = build_volume(f0, f1b, out_dtype=jnp.float32, block_p=128, interpret=True)
    want = _build_reference(f0, f1b, jnp.float32)
    assert got.shape[1] >= p
    np.testing.assert_allclose(np.asarray(got[:, :p]), np.asarray(want), rtol=1e-5, atol=1e-5)

    # the "pm" grid order (f1b-resident inner sweep) must produce identical
    # values — only the DMA schedule differs
    from unimatch_tpu.kernels.corr_volume import _build_volume_impl

    got_pm = _build_volume_impl(f0, f1b, out_dtype=jnp.float32, block_p=128,
                                interpret=True, grid_order="pm")
    np.testing.assert_allclose(
        np.asarray(got_pm[:, :p]), np.asarray(want), rtol=1e-5, atol=1e-5)

    # unit-major layout: [B, nUnits, Ppad, T*T], per-unit leading-axis
    # writes — the row-gather view is a no-op bitcast of this output
    got_u = build_volume(f0, f1b, out_dtype=jnp.float32, block_p=128,
                         interpret=True, umajor=True)
    nu = m // 256
    assert got_u.shape == (b, nu, got.shape[1], 256)
    want_u = want.reshape(b, p, nu, 256).transpose(0, 2, 1, 3)
    np.testing.assert_allclose(
        np.asarray(got_u[:, :, :p]), np.asarray(want_u), rtol=1e-5, atol=1e-5)


@pytest.mark.smoke
def test_corr_volume_lookup_matches_reference(rng):
    from unimatch_tpu.kernels.corr_volume import lookup_select_blend, _lookup_reference

    n, k = 333, 9  # n not a multiple of the block
    g = jnp.asarray(rng.randn(4, n, 256).astype(np.float32))
    sc = jnp.asarray(
        np.stack(
            [
                rng.randint(0, 16, n).astype(np.float32),
                rng.randint(0, 16, n).astype(np.float32),
                rng.rand(n).astype(np.float32),
                rng.rand(n).astype(np.float32),
            ],
            axis=-1,
        )
    )
    got = lookup_select_blend(g, sc, k, 0.125, jnp.float32, block_p=128, interpret=True)
    want = _lookup_reference(g, sc, k, 0.125, jnp.float32)
    # interpret mode reorders the f32 blend slightly: tight but not bitwise
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=1e-6, atol=1e-6)


@pytest.mark.smoke
def test_gru_pass_horizontal_matches_reference(rng):
    from unimatch_tpu.kernels.gru_fused import gru_pass, _reference_gru_pass

    b, h, w, hd, cx, K = 1, 19, 37, 128, 256, 5  # odd extents exercise padding
    hst = jnp.asarray(rng.randn(b, h, w, hd).astype(np.float32))
    x = jnp.asarray(rng.randn(b, h, w, cx).astype(np.float32))
    kx = jnp.asarray(rng.randn(1, K, cx, 3 * hd).astype(np.float32) * 0.05)
    khzr = jnp.asarray(rng.randn(1, K, hd, 2 * hd).astype(np.float32) * 0.05)
    kqh = jnp.asarray(rng.randn(1, K, hd, hd).astype(np.float32) * 0.05)
    bzrq = jnp.asarray(rng.randn(3, hd).astype(np.float32) * 0.1)

    got = gru_pass(hst, x, kx, khzr, kqh, bzrq, horizontal=True, interpret=True)
    want = _reference_gru_pass(hst, x, kx, khzr, kqh, bzrq, K, True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=1e-5, atol=1e-5)


def test_gru_pass_vertical_matches_reference(rng):
    from unimatch_tpu.kernels.gru_fused import gru_pass, _reference_gru_pass

    b, h, w, hd, cx, K = 1, 19, 37, 128, 256, 5
    hst = jnp.asarray(rng.randn(b, h, w, hd).astype(np.float32))
    x = jnp.asarray(rng.randn(b, h, w, cx).astype(np.float32))
    kx = jnp.asarray(rng.randn(K, 1, cx, 3 * hd).astype(np.float32) * 0.05)
    khzr = jnp.asarray(rng.randn(K, 1, hd, 2 * hd).astype(np.float32) * 0.05)
    kqh = jnp.asarray(rng.randn(K, 1, hd, hd).astype(np.float32) * 0.05)
    bzrq = jnp.asarray(rng.randn(3, hd).astype(np.float32) * 0.1)

    got = gru_pass(hst, x, kx, khzr, kqh, bzrq, horizontal=False, interpret=True)
    want = _reference_gru_pass(hst, x, kx, khzr, kqh, bzrq, K, False)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=1e-5, atol=1e-5)

    # column-strip form (UNIMATCH_GRU_VCOL): wc=16 forces multiple strips
    # (w=37 -> 3 strips incl. a padded one); identical math, no banding
    from unimatch_tpu.kernels.gru_fused import _gru_pass_impl

    got_col = _gru_pass_impl(hst, x, kx, khzr, kqh, bzrq, K, False, True,
                             v_col=16)
    np.testing.assert_allclose(
        np.asarray(got_col), np.asarray(want), rtol=1e-5, atol=1e-5)


def test_sepconv_gru_module_fused_dispatch(rng, monkeypatch):
    """UNIMATCH_FUSE_GRU routes SepConvGRU through the kernel's reference
    twin on CPU with byte-identical params; values match the unfused form.
    bf16 inputs (the dispatch is gated to the serving dtype)."""
    from unimatch_tpu.models.reg_refine import SepConvGRU

    b, h, w = 1, 12, 18
    hst = jnp.asarray(rng.randn(b, h, w, 128), jnp.bfloat16)
    parts = [
        jnp.asarray(rng.randn(b, h, w, 128), jnp.bfloat16),
        jnp.asarray(rng.randn(b, h, w, 126), jnp.bfloat16),
        jnp.asarray(rng.randn(b, h, w, 2), jnp.bfloat16),
    ]
    gru = SepConvGRU()
    params = gru.init(jax.random.PRNGKey(0), hst, parts)
    params = jax.tree.map(lambda a: a.astype(jnp.bfloat16), params)

    monkeypatch.setenv("UNIMATCH_FUSE_GRU", "0")
    want = gru.apply(params, hst, parts).astype(jnp.float32)
    monkeypatch.setenv("UNIMATCH_FUSE_GRU", "1")
    monkeypatch.setattr("unimatch_tpu.kernels.use_pallas", lambda: True)
    got = gru.apply(params, hst, parts).astype(jnp.float32)
    # both arms are bf16 graphs built from differently-associated convs;
    # the GRU output is bounded by |h| + |q| so absolute tolerance is safe
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=0.06)


def test_transformer_ffn_fuse_dispatch(rng, monkeypatch):
    """UNIMATCH_FUSE_FFN routes the FFN tail through the kernel's reference
    twin on CPU with an identical param tree; values match the XLA form."""
    from unimatch_tpu.models.transformer import FeatureTransformer

    f0 = jnp.asarray(rng.randn(1, 8, 16, 128).astype(np.float32))
    f1 = jnp.asarray(rng.randn(1, 8, 16, 128).astype(np.float32))
    tr = FeatureTransformer(num_layers=2, d_model=128, ffn_dim_expansion=4)

    monkeypatch.setenv("UNIMATCH_FUSE_FFN", "0")
    params = tr.init(jax.random.PRNGKey(0), f0, f1, attn_type="swin", attn_num_splits=2)
    want0, want1 = tr.apply(params, f0, f1, attn_type="swin", attn_num_splits=2)

    monkeypatch.setenv("UNIMATCH_FUSE_FFN", "1")
    monkeypatch.setattr("unimatch_tpu.kernels.use_pallas", lambda: True)
    params2 = tr.init(jax.random.PRNGKey(0), f0, f1, attn_type="swin", attn_num_splits=2)
    assert jax.tree.map(lambda a: a.shape, params) == jax.tree.map(lambda a: a.shape, params2)
    got0, got1 = tr.apply(params, f0, f1, attn_type="swin", attn_num_splits=2)
    np.testing.assert_allclose(np.asarray(got0), np.asarray(want0), rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(np.asarray(got1), np.asarray(want1), rtol=1e-4, atol=1e-4)


@pytest.mark.smoke
def test_motion_encoder_fused_matches_reference(rng):
    from unimatch_tpu.kernels.motion_fused import motion_encoder_fused, _reference_motion

    for fd in (2, 1):
        b, h, w, ck = 1, 19, 26, 81
        corr = jnp.asarray(rng.randn(b, h, w, ck).astype(np.float32))
        flow = jnp.asarray((rng.randn(b, h, w, fd) * 3).astype(np.float32))
        wc1 = jnp.asarray(rng.randn(1, 1, ck, 256).astype(np.float32) * 0.05)
        wc2 = jnp.asarray(rng.randn(3, 3, 256, 192).astype(np.float32) * 0.05)
        wf1 = jnp.asarray(rng.randn(7, 7, fd, 128).astype(np.float32) * 0.05)
        wf2 = jnp.asarray(rng.randn(3, 3, 128, 64).astype(np.float32) * 0.05)
        wm = jnp.asarray(rng.randn(3, 3, 256, 128 - fd).astype(np.float32) * 0.05)
        biases = tuple(
            jnp.asarray(rng.randn(n).astype(np.float32) * 0.1)
            for n in (256, 128, 192, 64, 128 - fd)  # (bc1, bf1, bc2, bf2, bm)
        )

        got = motion_encoder_fused(corr, flow, wc1, wc2, wf1, wf2, wm, biases,
                                   interpret=True)
        want = _reference_motion(corr, flow, wc1, wc2, wf1, wf2, wm, biases, fd)
        np.testing.assert_allclose(
            np.asarray(got), np.asarray(want), rtol=1e-4, atol=1e-4,
            err_msg=f"fd={fd}",
        )

        # two-stage flow im2col (UNIMATCH_MOTION_IM2COL=2stage): lanes
        # reorder v-major with matching weight rows — same values
        from unimatch_tpu.kernels.motion_fused import _motion_fused_impl

        got2 = _motion_fused_impl(corr, flow, wc1, wc2, wf1, wf2, wm, biases,
                                  fd, True, two_stage=True)
        np.testing.assert_allclose(
            np.asarray(got2), np.asarray(want), rtol=1e-4, atol=1e-4,
            err_msg=f"fd={fd} two_stage",
        )


def test_motion_encoder_module_fused_dispatch(rng, monkeypatch):
    """UNIMATCH_FUSE_MOTION routes BasicMotionEncoder through the kernel's
    reference twin on CPU with an identical param tree."""
    from unimatch_tpu.models.reg_refine import BasicMotionEncoder

    b, h, w = 1, 12, 18
    flow = jnp.asarray(rng.randn(b, h, w, 2), jnp.bfloat16)
    corr = jnp.asarray(rng.randn(b, h, w, 81), jnp.bfloat16)
    enc = BasicMotionEncoder(flow_channels=2)

    monkeypatch.setenv("UNIMATCH_FUSE_MOTION", "0")
    params = enc.init(jax.random.PRNGKey(0), flow, corr)
    params = jax.tree.map(lambda a: a.astype(jnp.bfloat16), params)
    want = enc.apply(params, flow, corr)[0].astype(jnp.float32)

    monkeypatch.setenv("UNIMATCH_FUSE_MOTION", "1")
    monkeypatch.setattr("unimatch_tpu.kernels.use_pallas", lambda: True)
    params2 = enc.init(jax.random.PRNGKey(0), flow, corr)
    assert jax.tree.map(lambda a: a.shape, params) == jax.tree.map(lambda a: a.shape, params2)
    got = enc.apply(params, flow, corr)[0].astype(jnp.float32)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=0.05)


def test_local_corr_flow_kernel_matches_reference(rng):
    """Fused streaming-softmax local correlation (interpret) == the flow
    half of local_correlation_softmax, including border masking and
    non-multiple-of-band heights."""
    from unimatch_tpu.kernels.local_corr import (
        _local_corr_flow_impl, _reference_flow,
    )

    # wc=16 on the 44-wide case exercises multi-column sub-blocking
    # (ncol=3) including the padded last column block (wp=48 > w=44)
    for shape, wc in [((1, 16, 24, 32), 128), ((2, 10, 20, 32), 128),
                      ((1, 12, 44, 32), 16)]:
        b, h, w, c = shape
        f0 = jnp.asarray(rng.randn(b, h, w, c).astype(np.float32))
        f1 = jnp.asarray(rng.randn(b, h, w, c).astype(np.float32))
        got = _local_corr_flow_impl(f0, f1, 4, wc=wc, interpret=True)
        ref = _reference_flow(f0, f1, 4)
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref), rtol=2e-5, atol=2e-5)


def test_local_corr_disp_kernel_matches_reference(rng):
    """1-D (stereo) streaming local correlation (interpret) == the disparity
    half of local_correlation_softmax_stereo."""
    from unimatch_tpu.kernels.local_corr import (
        _local_corr_flow_impl, _reference_disp,
    )

    b, h, w, c = 1, 12, 24, 32
    f0 = jnp.asarray(rng.randn(b, h, w, c).astype(np.float32))
    f1 = jnp.asarray(rng.randn(b, h, w, c).astype(np.float32))
    got = -_local_corr_flow_impl(f0, f1, 0, 4, interpret=True)[..., :1]
    ref = _reference_disp(f0, f1, 4)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), rtol=2e-5, atol=2e-5)


def test_corr_volume_build_compact_unit_counts(rng):
    """Build kernel (interpret) at the compact layout's unit counts: the
    flagship's 120 units (bm=3840) and a tiny 8-unit case (bm=2048)."""
    from unimatch_tpu.kernels.corr_volume import build_volume, _build_reference

    for units in (8, 120):
        m = units * 256
        f0 = jnp.asarray(rng.randn(1, 64, 128).astype(np.float32))
        f1b = jnp.asarray(rng.randn(1, m, 128).astype(np.float32))
        got = build_volume(f0, f1b, out_dtype=jnp.float32, block_p=64, interpret=True)
        ref = _build_reference(f0, f1b, jnp.float32)
        np.testing.assert_allclose(
            np.asarray(got[:, :64]), np.asarray(ref), rtol=1e-5, atol=1e-5
        )


def test_swin_spatial_gate_rejects_unaligned_windows():
    """The spatial swin kernel's support gate must reject window widths that
    are not 8-aligned (Mosaic block constraint): GMStereo's 384x1248 shapes
    (312/8 = 39, 156/2 = 78 cols) crashed the real Mosaic compile when the
    gate passed them (round 4d). CPU interpret tests cannot catch this."""
    from unimatch_tpu.kernels.window_attention import swin_spatial_supported

    # flagship / depth / scale1 shapes stay on the kernel
    assert swin_spatial_supported(112, 256, 128, 8, jnp.bfloat16)
    assert swin_spatial_supported(56, 128, 128, 2, jnp.bfloat16)
    assert swin_spatial_supported(60, 80, 128, 2, jnp.bfloat16)
    # stereo shapes fall back to the split form
    assert not swin_spatial_supported(96, 312, 128, 8, jnp.bfloat16)
    assert not swin_spatial_supported(48, 156, 128, 2, jnp.bfloat16)
    # non-lane-aligned channel count falls back too
    assert not swin_spatial_supported(112, 256, 96, 8, jnp.bfloat16)


@pytest.mark.smoke
def test_corr_volume_lookup_narrow_matches_reference(rng, monkeypatch):
    """UNIMATCH_LOOKUP_NARROW (512-lane shift/select after the y-align)
    == the full-width form == the jnp reference."""
    from unimatch_tpu.kernels.corr_volume import lookup_select_blend, _lookup_reference

    monkeypatch.setenv("UNIMATCH_LOOKUP_NARROW", "1")
    n, k = 333, 9
    g = jnp.asarray(rng.randn(4, n, 256).astype(np.float32))
    sc = jnp.asarray(
        np.stack(
            [
                rng.randint(0, 16, n).astype(np.float32),
                rng.randint(0, 16, n).astype(np.float32),
                rng.rand(n).astype(np.float32),
                rng.rand(n).astype(np.float32),
            ],
            axis=-1,
        )
    )
    got = lookup_select_blend(g, sc, k, 0.125, jnp.float32, block_p=128, interpret=True)
    want = _lookup_reference(g, sc, k, 0.125, jnp.float32)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=1e-6, atol=1e-6)



def test_backbone_lax_conv_levers_match(rng, monkeypatch):
    """UNIMATCH_STEM_LAX (default-on lax.conv stem lowering) matches the
    shifted-matmul form on the CNNEncoder forward."""
    from unimatch_tpu.models.backbone import CNNEncoder

    x = jnp.asarray(rng.randn(1, 32, 48, 3).astype(np.float32))
    enc = CNNEncoder(output_dim=128, num_output_scales=1)
    params = enc.init(jax.random.PRNGKey(0), x)
    monkeypatch.setenv("UNIMATCH_STEM_LAX", "0")  # baseline = matmul stem (flag defaults ON since r5g)
    want = np.asarray(enc.apply(params, x)[0], np.float32)
    monkeypatch.setenv("UNIMATCH_STEM_LAX", "1")
    got = np.asarray(enc.apply(params, x)[0], np.float32)
    # one f32 accumulation-order difference per conv, then 6 IN layers
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-4)


def test_corr_volume_build_quantized_matches_reference(rng):
    """int8 unit-major build (UNIMATCH_VOLUME_INT8) == jnp quantized twin,
    and rigorous Cauchy-Schwarz scales never clip."""
    from unimatch_tpu.kernels.corr_volume import (
        build_volume_quantized, _build_reference_q, _build_reference,
    )

    b, p, c, m = 2, 300, 128, 6 * 256
    f0 = jnp.asarray(rng.randn(b, p, c).astype(np.float32))
    f1b = jnp.asarray(rng.randn(b, m, c).astype(np.float32))
    nu = m // 256
    n0 = jnp.max(jnp.linalg.norm(f0, axis=-1), axis=-1, keepdims=True)
    n1u = jnp.max(jnp.linalg.norm(f1b, axis=-1).reshape(b, nu, 256), axis=-1)
    inv = jnp.where(n0 * n1u > 0, 127.0 / (n0 * n1u), 0.0)

    got = build_volume_quantized(f0, f1b, inv, block_p=128, interpret=True)
    pp = got.shape[2]
    want = _build_reference_q(f0, f1b, inv, pp)
    assert got.dtype == jnp.int8
    np.testing.assert_array_equal(np.asarray(got[:, :, :p]), np.asarray(want[:, :, :p]))
    assert int(np.abs(np.asarray(got)).max()) <= 127  # no clipping by bound

    # dequantized round-trip error bounded by the per-unit step
    vol = _build_reference(f0, f1b, jnp.float32)  # [B, P, M]
    deq = np.asarray(got[:, :, :p], np.float32) * np.asarray(
        (n0 * n1u) / 127.0)[:, :, None, None]
    want_u = np.asarray(vol).reshape(b, p, nu, 256).transpose(0, 2, 1, 3)
    step = np.asarray((n0 * n1u) / 127.0)[:, :, None, None]
    assert np.abs(deq - want_u).max() <= 0.5 * step.max() + 1e-5


def test_corr_volume_lookup_int8_matches_float(rng):
    """The int8 lookup (dequant lanes in sc) == float lookup on the
    dequantized units, in both interpret and reference forms."""
    from unimatch_tpu.kernels.corr_volume import (
        lookup_select_blend, _lookup_reference,
    )

    n, k = 64, 9
    g8 = jnp.asarray(rng.randint(-127, 128, (4, n, 256)).astype(np.int8))
    dq = jnp.asarray((0.5 + rng.rand(n, 4)).astype(np.float32))
    remy = rng.randint(0, 6, (n,)).astype(np.float32)
    remx = rng.randint(0, 6, (n,)).astype(np.float32)
    wx1 = rng.rand(n).astype(np.float32)
    wy1 = rng.rand(n).astype(np.float32)
    sc8 = jnp.asarray(np.stack([remy, remx, wx1, wy1] + [np.asarray(dq)[:, u] for u in range(4)], -1))
    sc4 = jnp.asarray(np.stack([remy, remx, wx1, wy1], -1))

    gf = (g8.astype(jnp.float32) * jnp.transpose(dq)[:, :, None]).astype(jnp.float32)
    want = _lookup_reference(gf, sc4, k, 0.125, jnp.float32)
    got_ref = _lookup_reference(g8, sc8, k, 0.125, jnp.float32)
    got_int = lookup_select_blend(g8, sc8, k, 0.125, jnp.float32, block_p=32,
                                  interpret=True)
    np.testing.assert_allclose(np.asarray(got_ref), np.asarray(want), rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(got_int), np.asarray(want), rtol=1e-5, atol=1e-5)


def test_tiled_volume_int8_end_to_end_close(rng, monkeypatch):
    """UNIMATCH_VOLUME_INT8 refine lookup stays within the per-unit
    quantization step of the bf16-volume path."""
    b, h, w, c, r = 1, 24, 40, 32, 4
    f0 = jnp.asarray(rng.randn(b, h, w, c).astype(np.float32))
    f1 = jnp.asarray(rng.randn(b, h, w, c).astype(np.float32))
    flow = jnp.asarray((rng.randn(b, h, w, 2) * 3).astype(np.float32))

    from unimatch_tpu.ops import correlation as C

    monkeypatch.setenv("UNIMATCH_VOLUME_UMAJOR", "1")
    monkeypatch.setenv("UNIMATCH_VOLUME_INT8", "0")  # baseline arm (flag defaults ON since r5h)
    vol = C.build_tiled_correlation_volume(f0, f1, r)
    want = np.asarray(C.local_correlation_with_flow_from_tiled_volume(vol, flow, r))

    monkeypatch.setenv("UNIMATCH_VOLUME_INT8", "1")
    monkeypatch.setenv("UNIMATCH_VOLUME_PAIR", "0")  # unpaired form (pair defaults ON since r5j)
    vol8 = C.build_tiled_correlation_volume(f0, f1, r)
    assert vol8.vt.dtype == jnp.int8 and vol8.dequant is not None
    got = np.asarray(C.local_correlation_with_flow_from_tiled_volume(vol8, flow, r))

    step = float(np.asarray(vol8.dequant).max()) / np.sqrt(np.float32(c))
    assert np.abs(got - want).max() <= 0.75 * step
    # and the quantized corr still identifies the same best offset almost
    # everywhere (argmax stability over the 81 window taps)
    agree = (got.reshape(-1, 81).argmax(-1) == want.reshape(-1, 81).argmax(-1)).mean()
    assert agree > 0.95


def test_corr_volume_build_quantized_paired_matches_reference(rng):
    """Paired-unit int8 build (unit_rows=512, UNIMATCH_VOLUME_PAIR) == jnp
    quantized twin through the Pallas interpret path."""
    from unimatch_tpu.kernels.corr_volume import (
        build_volume_quantized, _build_reference_q,
    )

    b, p, c, m = 2, 300, 128, 6 * 512  # 6 pair units of 512 rows
    f0 = jnp.asarray(rng.randn(b, p, c).astype(np.float32))
    f1b = jnp.asarray(rng.randn(b, m, c).astype(np.float32))
    nu = m // 512
    n0 = jnp.max(jnp.linalg.norm(f0, axis=-1), axis=-1, keepdims=True)
    n1u = jnp.max(jnp.linalg.norm(f1b, axis=-1).reshape(b, nu, 512), axis=-1)
    inv = jnp.where(n0 * n1u > 0, 127.0 / (n0 * n1u), 0.0)

    got = build_volume_quantized(f0, f1b, inv, block_p=128, interpret=True,
                                 unit_rows=512)
    assert got.shape[1] == nu and got.shape[3] == 512
    pp = got.shape[2]
    want = _build_reference_q(f0, f1b, inv, pp, unit_rows=512)
    np.testing.assert_array_equal(np.asarray(got[:, :, :p]), np.asarray(want[:, :, :p]))
    assert int(np.abs(np.asarray(got)).max()) <= 127


def test_corr_volume_lookup_paired_matches_float(rng):
    """The 2-lane paired lookup (nu=2, 512-lane rows, dequant lanes 4..6)
    == the float lookup on the split/dequantized 4-unit form, in both the
    interpret kernel and the jnp reference."""
    from unimatch_tpu.kernels.corr_volume import (
        lookup_select_blend, _lookup_reference,
    )

    n, k = 64, 9
    g2 = jnp.asarray(rng.randint(-127, 128, (2, n, 512)).astype(np.int8))
    dq = jnp.asarray((0.5 + rng.rand(n, 2)).astype(np.float32))
    remy = rng.randint(0, 6, (n,)).astype(np.float32)
    remx = rng.randint(0, 6, (n,)).astype(np.float32)
    wx1 = rng.rand(n).astype(np.float32)
    wy1 = rng.rand(n).astype(np.float32)
    sc6 = jnp.asarray(np.stack(
        [remy, remx, wx1, wy1, np.asarray(dq)[:, 0], np.asarray(dq)[:, 1]], -1))
    sc4 = jnp.asarray(np.stack([remy, remx, wx1, wy1], -1))

    # float oracle: split each pair row into its two 256-lane units, scaled
    g4 = jnp.stack([g2[0, :, :256], g2[0, :, 256:], g2[1, :, :256], g2[1, :, 256:]])
    dq4 = jnp.stack([dq[:, 0], dq[:, 0], dq[:, 1], dq[:, 1]])
    gf = (g4.astype(jnp.float32) * dq4[:, :, None]).astype(jnp.float32)
    want = _lookup_reference(gf, sc4, k, 0.125, jnp.float32)
    got_ref = _lookup_reference(g2, sc6, k, 0.125, jnp.float32)
    got_int = lookup_select_blend(g2, sc6, k, 0.125, jnp.float32, block_p=32,
                                  interpret=True)
    np.testing.assert_allclose(np.asarray(got_ref), np.asarray(want), rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(got_int), np.asarray(want), rtol=1e-5, atol=1e-5)


def test_tiled_volume_paired_end_to_end_close(rng, monkeypatch):
    """UNIMATCH_VOLUME_PAIR (y-paired int8 units: 2 x 512 B gathers per
    pixel instead of 4 x 256 B) stays within the per-pair quantization step
    of the bf16-volume path, including batch > 1 and boundary windows."""
    b, h, w, c, r = 2, 24, 40, 32, 4
    f0 = jnp.asarray(rng.randn(b, h, w, c).astype(np.float32))
    f1 = jnp.asarray(rng.randn(b, h, w, c).astype(np.float32))
    flow = jnp.asarray((rng.randn(b, h, w, 2) * 6).astype(np.float32))

    from unimatch_tpu.ops import correlation as C

    monkeypatch.setenv("UNIMATCH_VOLUME_UMAJOR", "1")
    monkeypatch.setenv("UNIMATCH_VOLUME_INT8", "0")
    vol = C.build_tiled_correlation_volume(f0, f1, r)
    want = np.asarray(C.local_correlation_with_flow_from_tiled_volume(vol, flow, r))

    monkeypatch.setenv("UNIMATCH_VOLUME_INT8", "1")
    monkeypatch.setenv("UNIMATCH_VOLUME_PAIR", "1")  # explicit (default since r5j)
    volp = C.build_tiled_correlation_volume(f0, f1, r)
    assert volp.paired and volp.vt.dtype == jnp.int8
    assert volp.vt.shape[3] == 512  # [B, nPairs, Ppad, 2*T*T]
    got = np.asarray(C.local_correlation_with_flow_from_tiled_volume(volp, flow, r))

    step = float(np.asarray(volp.dequant).max()) / np.sqrt(np.float32(c))
    assert np.abs(got - want).max() <= 0.75 * step
    agree = (got.reshape(-1, 81).argmax(-1) == want.reshape(-1, 81).argmax(-1)).mean()
    assert agree > 0.95
