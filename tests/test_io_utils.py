"""Frame I/O roundtrips, flow visualization, and InputPadder parity."""

import os

import numpy as np
import pytest

from unimatch_tpu.utils import frame_utils as F
from unimatch_tpu.utils import flow_viz

from reference_oracle import requires_reference


def test_flo_roundtrip(tmp_path, rng):
    flow = (rng.randn(13, 17, 2) * 10).astype(np.float32)
    p = str(tmp_path / "x.flo")
    F.write_flo(p, flow)
    np.testing.assert_array_equal(F.read_flo(p), flow)


def test_pfm_roundtrip(tmp_path, rng):
    img = (rng.rand(9, 11) * 100).astype(np.float32)
    p = str(tmp_path / "x.pfm")
    F.write_pfm(p, img)
    data, scale = F.read_pfm(p)
    np.testing.assert_array_equal(data, img)


def test_kitti_flow_png_roundtrip(tmp_path, rng):
    flow = (rng.randn(10, 12, 2) * 30).astype(np.float32)
    # quantized to 1/64 px
    flow = np.round(flow * 64) / 64
    p = str(tmp_path / "x.png")
    F.write_kitti_flow_png(p, flow)
    got, valid = F.read_kitti_flow_png(p)
    np.testing.assert_allclose(got, flow, atol=1 / 64)
    assert valid.min() == 1


def test_kitti_disp_png_roundtrip(tmp_path, rng):
    disp = (rng.rand(10, 12) * 100).astype(np.float32)
    disp = np.round(disp * 256) / 256
    p = str(tmp_path / "d.png")
    F.write_kitti_disp_png(p, disp)
    got, valid = F.read_kitti_disp_png(p)
    np.testing.assert_allclose(got, disp, atol=1 / 256)


@requires_reference
def test_flo_matches_reference_reader(tmp_path, rng):
    from utils import frame_utils as ref_fu

    flow = (rng.randn(8, 9, 2) * 5).astype(np.float32)
    p = str(tmp_path / "x.flo")
    F.write_flo(p, flow)
    ref = ref_fu.readFlow(p)
    np.testing.assert_array_equal(np.asarray(ref), flow)


@requires_reference
def test_flow_viz_matches_reference(rng):
    from utils import flow_viz as ref_viz

    flow = (rng.randn(16, 20, 2) * 12).astype(np.float32)
    got = flow_viz.flow_to_image(flow)
    want = ref_viz.flow_to_image(flow.copy())
    assert got.shape == want.shape
    # off-by-one from wheel interpolation rounding is fine everywhere; the
    # rad==1.0 boundary (the max-magnitude pixel) may fall on either side of
    # the saturation branch — allow a handful of such ties.
    per_pixel = np.abs(got.astype(int) - want.astype(int)).max(axis=-1)
    assert (per_pixel > 1).sum() <= 2


@requires_reference
@pytest.mark.parametrize("mode,factor", [("sintel", 8), ("kitti", 32), ("sintel", 16)])
def test_input_padder_matches_reference(rng, mode, factor):
    import torch
    from utils.utils import InputPadder as RefPadder

    from unimatch_tpu.data import InputPadder

    import jax.numpy as jnp

    img = (rng.rand(1, 37, 53, 3) * 255).astype(np.float32)
    ours = InputPadder(img.shape, mode=mode, padding_factor=factor)
    out = np.asarray(ours.pad(jnp.asarray(img)))

    ref_padder = RefPadder(torch.from_numpy(img).permute(0, 3, 1, 2).shape, mode=mode,
                           padding_factor=factor)
    ref = ref_padder.pad(torch.from_numpy(img).permute(0, 3, 1, 2))[0]
    np.testing.assert_array_equal(out, ref.permute(0, 2, 3, 1).numpy())

    # unpad restores original size
    rec = np.asarray(ours.unpad(jnp.asarray(out)))
    np.testing.assert_array_equal(rec, img)
