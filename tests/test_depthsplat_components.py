"""DepthSplat building blocks vs torch oracles where available."""

import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp

from reference_oracle import requires_reference


@pytest.mark.parametrize("k", [2, 4])
def test_convtranspose_matches_torch(rng, k):
    from unimatch_tpu.models.vit_fpn import ConvTransposeK

    b, h, w, cin, cout = 2, 5, 7, 12, 8
    x = rng.randn(b, h, w, cin).astype(np.float32)
    wt = rng.randn(cin, cout, k, k).astype(np.float32)  # torch layout
    bias = rng.randn(cout).astype(np.float32)

    mod = ConvTransposeK(cout, k=k)
    params = {"params": {"kernel": jnp.asarray(np.transpose(wt, (2, 3, 0, 1))),
                         "bias": jnp.asarray(bias)}}
    got = np.asarray(mod.apply(params, jnp.asarray(x)))

    tmod = torch.nn.ConvTranspose2d(cin, cout, kernel_size=k, stride=k)
    with torch.no_grad():
        tmod.weight.copy_(torch.from_numpy(wt))
        tmod.bias.copy_(torch.from_numpy(bias))
        ref = tmod(torch.from_numpy(x).permute(0, 3, 1, 2)).permute(0, 2, 3, 1).numpy()
    np.testing.assert_allclose(got, ref, rtol=1e-4, atol=1e-5)


@requires_reference
def test_vit_fpn_matches_reference(rng):
    """ViTFeaturePyramid vs the reference module with converted weights."""
    from unimatch.vit_fpn import ViTFeaturePyramid as TorchFPN

    from unimatch_tpu.convert_depthsplat import convert_depthsplat_state_dict
    from unimatch_tpu.models.vit_fpn import ViTFeaturePyramid

    torch.manual_seed(0)
    tfpn = TorchFPN(in_channels=64, scale_factors=[1, 2])
    tfpn.eval()

    state = {f"mv_pyramid.{k}": v for k, v in tfpn.state_dict().items()}
    params = convert_depthsplat_state_dict(state)["mv_pyramid"]

    x = rng.randn(1, 8, 10, 64).astype(np.float32)
    fpn = ViTFeaturePyramid(64, [1.0, 2.0])
    outs = fpn.apply({"params": params}, jnp.asarray(x))

    with torch.no_grad():
        refs = tfpn(torch.from_numpy(x).permute(0, 3, 1, 2))
    for got, ref in zip(outs, refs):
        np.testing.assert_allclose(
            np.asarray(got), ref.permute(0, 2, 3, 1).numpy(), rtol=1e-4, atol=1e-5
        )


@requires_reference
def test_ldm_unet_matches_reference(rng):
    """Cross-view LDM UNet vs the reference with converted weights."""
    from unimatch.ldm_unet.unet import UNetModel as TorchUNet

    from unimatch_tpu.convert_depthsplat import convert_depthsplat_state_dict
    from unimatch_tpu.models.ldm_unet import UNetModel

    torch.manual_seed(1)
    ch = 32
    tunet = TorchUNet(
        image_size=None, in_channels=ch, model_channels=ch, out_channels=ch,
        num_res_blocks=1, attention_resolutions=[4], channel_mult=[1, 1, 1],
        num_head_channels=16, dims=2, postnorm=False, num_frames=2,
        use_cross_view_self_attn=True,
    )
    tunet.eval()

    # route through the regressor key mapping (regressor.<i>.3 == unet)
    state = {f"regressor.0.3.{k}": v for k, v in tunet.state_dict().items()}
    params = convert_depthsplat_state_dict(state)["regressor_0"]["unet"]

    b, h, w = 2, 16, 24  # (b v) batch layout with v=2
    x = rng.randn(b, h, w, ch).astype(np.float32)
    unet = UNetModel(model_channels=ch, out_channels=ch, num_res_blocks=1,
                     attention_resolutions=(4,), channel_mult=(1, 1, 1),
                     num_head_channels=16, num_frames=2, use_cross_view_self_attn=True)
    got = np.asarray(unet.apply({"params": params}, jnp.asarray(x)))

    with torch.no_grad():
        ref = tunet(torch.from_numpy(x).permute(0, 3, 1, 2)).permute(0, 2, 3, 1).numpy()
    np.testing.assert_allclose(got, ref, rtol=1e-3, atol=1e-4)


@requires_reference
def test_dpt_head_matches_reference(rng):
    """DPTHead (ds=8, num_scales=1 default branch) vs the reference."""
    from unimatch.dpt_head import DPTHead as TorchDPT

    from unimatch_tpu.convert_depthsplat import convert_depthsplat_state_dict
    from unimatch_tpu.models.dpt_head import DPTHead

    torch.manual_seed(2)
    tdpt = TorchDPT(in_channels=64, features=16, out_channels=[8, 16, 32, 64],
                    concat_features=True, downsample_factor=8, num_scales=1)
    tdpt.eval()

    state = {f"upsampler.{k}": v for k, v in tdpt.state_dict().items()}
    params = convert_depthsplat_state_dict(state)["upsampler"]

    b, h8, w8 = 2, 8, 12
    vit_maps = [rng.randn(b, h8, w8, 64).astype(np.float32) for _ in range(4)]
    cnn = [rng.randn(b, h8 * 4, w8 * 4, 64).astype(np.float32),
           rng.randn(b, h8 * 2, w8 * 2, 96).astype(np.float32),
           rng.randn(b, h8, w8, 128).astype(np.float32)]
    mv = rng.randn(b, h8, w8, 128).astype(np.float32)
    depth = rng.rand(b, h8, w8, 1).astype(np.float32)

    dpt = DPTHead(in_channels=64, features=16, out_channels=(8, 16, 32, 64),
                  downsample_factor=8, num_scales=1)
    got = np.asarray(dpt.apply(
        {"params": params},
        [jnp.asarray(m) for m in vit_maps],
        cnn_features=[jnp.asarray(c) for c in cnn],
        mv_features=jnp.asarray(mv),
        depth=jnp.asarray(depth),
    ))

    def t(x):
        return torch.from_numpy(x).permute(0, 3, 1, 2)

    with torch.no_grad():
        ref = tdpt([t(m) for m in vit_maps], cnn_features=[t(c) for c in cnn],
                   mv_features=t(mv), depth=t(depth)).permute(0, 2, 3, 1).numpy()
    np.testing.assert_allclose(got, ref, rtol=1e-3, atol=1e-4)
