"""UniMatch: unified flow / stereo / depth dense matching (flax.linen, NHWC).

Capability parity with the reference assembly (unimatch/unimatch.py:16-367):
shared CNN backbone + feature transformer + correlation-softmax matching +
self-attention propagation, with task-conditional readout:

  flow    2D global/local correlation, residual across scales, convex upsample
  stereo  1D correlation with positive-disparity clamp; disparity is packed as
          (-d, 0) 2-channel flow for the shared task-agnostic upsampler
  depth   plane-sweep matching over inverse-depth candidates; operates in
          inverse-depth space, inverted at the end

Optional RAFT-style regression refinement (reg_refine): per iteration, a
flow-shifted local correlation feeds a ConvGRU update block
(reference unimatch.py:272-354). NOTE (parity): the GRU hidden state is
re-initialized from feature0 every iteration — the reference computes
refine_proj inside the refine loop (unimatch.py:315-321) and discards the
GRU's output hidden state; we hoist the loop-invariant projection out of
the loop explicitly.

Static-shape / trace-once design: `task`, per-scale radii/splits, and
iteration counts are static jit arguments, so each (task, resolution,
config) pair compiles to one specialized XLA program.
"""

from __future__ import annotations

from typing import Any, Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
import flax.linen as nn

from unimatch_tpu.config import ModelConfig, InferenceConfig
from unimatch_tpu.models.backbone import CNNEncoder
from unimatch_tpu.models.transformer import FeatureTransformer
from unimatch_tpu.models.propagation import SelfAttnPropagation
from unimatch_tpu.models.reg_refine import BasicUpdateBlock
from unimatch_tpu.models.layers import conv2d
from unimatch_tpu.ops import correlation as C
from unimatch_tpu.ops import geometry as G
from unimatch_tpu.ops.position import feature_add_position
from unimatch_tpu.ops.upsample import upsample_with_mask

# ImageNet statistics, applied to [0, 255] inputs for the flow task
# (stereo/depth pipelines normalize in the data loader). Reference utils.py:23-31.
_IMAGENET_MEAN = (0.485, 0.456, 0.406)
_IMAGENET_STD = (0.229, 0.224, 0.225)


def normalize_img(img0: jnp.ndarray, img1: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
    mean = jnp.asarray(_IMAGENET_MEAN, img0.dtype) * 255.0
    std = jnp.asarray(_IMAGENET_STD, img0.dtype) * 255.0
    return (img0 - mean) / std, (img1 - mean) / std


class Upsampler(nn.Module):
    """Convex-upsample mask head: concat(flow, feature) -> 9*K^2 weights.

    Reference unimatch.py:50-52.
    """

    upsample_factor: int

    @nn.compact
    def __call__(self, flow: jnp.ndarray, feature: jnp.ndarray) -> jnp.ndarray:
        x = jnp.concatenate([flow, feature], axis=-1)
        x = conv2d(256, 3, padding=1, act="relu", name="conv_0")(x)
        return conv2d(self.upsample_factor**2 * 9, 1, name="conv_2")(x)


class UniMatch(nn.Module):
    config: ModelConfig

    def setup(self):
        cfg = self.config
        self.backbone = CNNEncoder(
            output_dim=cfg.feature_channels, num_output_scales=cfg.num_scales, name="backbone"
        )
        self.transformer = FeatureTransformer(
            num_layers=cfg.num_transformer_layers,
            d_model=cfg.feature_channels,
            ffn_dim_expansion=cfg.ffn_dim_expansion,
            name="transformer",
        )
        self.feature_flow_attn = SelfAttnPropagation(
            in_channels=cfg.feature_channels, name="feature_flow_attn"
        )
        if (not cfg.reg_refine) or cfg.task == "depth":
            self.upsampler = Upsampler(cfg.upsample_factor, name="upsampler")
        if cfg.reg_refine:
            self.refine_proj = conv2d(256, 1, name="refine_proj")
            self.refine = BasicUpdateBlock(
                downsample_factor=cfg.upsample_factor,
                flow_dim=2 if cfg.task == "flow" else 1,
                bilinear_up=cfg.task == "depth",
                name="refine",
            )

    # ----- helpers -----

    def extract_feature(self, img0, img1) -> Tuple[List[jnp.ndarray], List[jnp.ndarray]]:
        """Run the backbone once on both images (stacked on batch).

        Returns per-scale feature lists, low resolution first.
        Reference unimatch.py:64-79.
        """
        concat = jnp.concatenate([img0, img1], axis=0)
        features = self.backbone(concat)  # low-res first
        f0s, f1s = [], []
        for f in features:
            f0, f1 = jnp.split(f, 2, axis=0)
            f0s.append(f0)
            f1s.append(f1)
        return f0s, f1s

    def _upsample_bilinear(self, flow, upsample_factor: int, is_depth: bool):
        b, h, w, c = flow.shape
        mult = 1.0 if is_depth else float(upsample_factor)
        up = G.resize_bilinear_align_corners(flow, h * upsample_factor, w * upsample_factor)
        return up * mult

    def _upsample_convex(self, flow, feature, is_depth: bool = False):
        mask = self.upsampler(flow, feature)
        return upsample_with_mask(flow, mask, self.config.upsample_factor, is_depth=is_depth)

    # ----- forward -----

    def __call__(
        self,
        img0: jnp.ndarray,  # [B, H, W, 3]
        img1: jnp.ndarray,
        infer: InferenceConfig = InferenceConfig(),
        pred_bidir_flow: bool = False,
        pred_bidir_depth: bool = False,
        intrinsics: Optional[jnp.ndarray] = None,  # [B, 3, 3] (depth task)
        pose: Optional[jnp.ndarray] = None,  # [B, 4, 4] relative ref->tgt (depth task)
        training: bool = False,
    ) -> Dict[str, Any]:
        cfg = self.config
        task = cfg.task
        if pred_bidir_flow:
            assert task == "flow"
        if task == "depth":
            assert cfg.num_scales == 1, "multi-scale depth is not supported"
            assert len(infer.attn_splits_list) == len(infer.prop_radius_list) == 1
        else:
            assert (
                len(infer.attn_splits_list)
                == len(infer.corr_radius_list)
                == len(infer.prop_radius_list)
                == cfg.num_scales
            )

        flow_preds: List[jnp.ndarray] = []

        if task == "flow":
            img0, img1 = normalize_img(img0, img1)

        feature0_list, feature1_list = self.extract_feature(img0, img1)

        flow = None
        intrinsics_curr = None

        for scale_idx in range(cfg.num_scales):
            feature0, feature1 = feature0_list[scale_idx], feature1_list[scale_idx]

            if pred_bidir_flow and scale_idx > 0:
                feature0, feature1 = (
                    jnp.concatenate([feature0, feature1], axis=0),
                    jnp.concatenate([feature1, feature0], axis=0),
                )

            feature0_ori, feature1_ori = feature0, feature1

            upsample_factor = cfg.upsample_factor * (2 ** (cfg.num_scales - 1 - scale_idx))

            if task == "depth":
                # express intrinsics at feature resolution
                scalemat = jnp.asarray([[1.0 / upsample_factor]] * 2 + [[1.0]], jnp.float32)
                intrinsics_curr = intrinsics * scalemat[None]

            if scale_idx > 0:
                b_, h_, w_, _ = flow.shape
                flow = G.resize_bilinear_align_corners(flow, h_ * 2, w_ * 2) * 2.0

            if flow is not None:
                flow = jax.lax.stop_gradient(flow)
                if task == "stereo":
                    # disparity is positive; warp along -x
                    displace = jnp.concatenate([-flow, jnp.zeros_like(flow)], axis=-1)
                    feature1 = G.flow_warp(feature1, displace)
                elif task == "flow":
                    feature1 = G.flow_warp(feature1, flow)
                else:
                    raise NotImplementedError

            attn_splits = infer.attn_splits_list[scale_idx]
            corr_radius = infer.corr_radius_list[scale_idx] if task != "depth" else None
            prop_radius = infer.prop_radius_list[scale_idx]

            feature0, feature1 = feature_add_position(
                feature0, feature1, attn_splits, cfg.feature_channels
            )

            feature0, feature1 = self.transformer(
                feature0, feature1, attn_type=infer.attn_type, attn_num_splits=attn_splits
            )

            # correlation + softmax readout
            if task == "depth":
                b_, h_, w_, _ = feature0.shape
                cand = jnp.linspace(
                    infer.min_depth, infer.max_depth, infer.num_depth_candidates,
                    dtype=jnp.float32,
                )
                depth_candidates = jnp.broadcast_to(
                    cand[None, :, None, None], (b_, infer.num_depth_candidates, h_, w_)
                )
                flow_pred = C.correlation_softmax_depth(
                    feature0,
                    feature1,
                    intrinsics_curr,
                    pose,
                    depth_candidates,
                    depth_from_argmax=infer.depth_from_argmax,
                    pred_bidir_depth=pred_bidir_depth,
                )[0]
            elif corr_radius == -1:  # global matching
                if task == "flow":
                    flow_pred = C.global_correlation_softmax(feature0, feature1, pred_bidir_flow)[0]
                else:
                    flow_pred = C.global_correlation_softmax_stereo(feature0, feature1)[0]
            else:  # local matching
                if task == "flow":
                    flow_pred = C.local_correlation_softmax_flow(feature0, feature1, corr_radius)
                else:
                    flow_pred = C.local_correlation_softmax_stereo_disp(feature0, feature1, corr_radius)

            flow = flow + flow_pred if flow is not None else flow_pred

            if task == "stereo":
                flow = jnp.maximum(flow, 0.0)

            if training:  # deep supervision on the raw match
                flow_preds.append(
                    self._upsample_bilinear(flow, upsample_factor, is_depth=task == "depth")
                )

            # propagation operates on both directions when bidirectional
            if (pred_bidir_flow or pred_bidir_depth) and scale_idx == 0:
                feature0 = jnp.concatenate([feature0, feature1], axis=0)

            flow = self.feature_flow_attn(
                feature0,
                jax.lax.stop_gradient(flow),
                local_window_attn=prop_radius > 0,
                local_window_radius=prop_radius,
            )

            if training and scale_idx < cfg.num_scales - 1:
                flow_preds.append(
                    self._upsample_bilinear(flow, upsample_factor, is_depth=task == "depth")
                )

            if scale_idx == cfg.num_scales - 1:
                if not cfg.reg_refine:
                    if task == "stereo":
                        flow_pad = jnp.concatenate([-flow, jnp.zeros_like(flow)], axis=-1)
                        flow_up = -self._upsample_convex(flow_pad, feature0)[..., :1]
                    elif task == "depth":
                        depth_pad = jnp.concatenate([flow, jnp.zeros_like(flow)], axis=-1)
                        flow_up = jnp.clip(
                            self._upsample_convex(depth_pad, feature0, is_depth=True),
                            infer.min_depth,
                            infer.max_depth,
                        )[..., :1]
                    else:
                        flow_up = self._upsample_convex(flow, feature0)
                    flow_preds.append(flow_up)
                else:
                    if training:
                        flow_preds.append(
                            self._upsample_bilinear(flow, upsample_factor, is_depth=task == "depth")
                        )

                    assert infer.num_reg_refine > 0

                    # refine_proj is loop-invariant: the reference recomputes
                    # it every iteration and re-initializes the GRU hidden
                    # state from it (unimatch.py:315-321) — the GRU's output
                    # hidden state is never carried across iterations. We
                    # hoist the computation out of the loop (keeping the
                    # per-iteration re-initialization semantics) instead of
                    # relying on XLA CSE.
                    proj = self.refine_proj(feature0)
                    net0, inp = jnp.split(proj, 2, axis=-1)
                    net0 = jnp.tanh(net0)
                    inp = jax.nn.relu(inp)

                    # Refine-correlation dispatch. The tiled-volume path
                    # (build all-pairs correlations ONCE, then 4 contiguous
                    # 512 B unit-gathers + a Pallas select/blend kernel per
                    # iteration) amortizes the ~0.6 GB/iteration feature
                    # re-gather of the direct path across the refine
                    # iterations — exact for arbitrary flow (no smoothness
                    # assumption). Pure-XLA versions of both volume build
                    # and lookup measured SLOWER than the direct gather in
                    # round 2 (85 ms build / 25 ms lookup); the Pallas
                    # kernels in kernels/corr_volume.py remove both
                    # bottlenecks. Training keeps the direct path (exact
                    # reference gradients without a volume-sized cotangent).
                    import os as _os

                    _vol_env = _os.environ.get("UNIMATCH_REFINE_VOLUME", "auto")
                    _b0, _h0, _w0 = feature0_ori.shape[:3]
                    use_volume = (
                        task != "depth"
                        and not training
                        and infer.num_reg_refine >= 2
                        and C.tiled_volume_fits(
                            _b0, _h0, _w0, 4,
                            itemsize=jnp.dtype(feature0_ori.dtype).itemsize,
                        )
                        and (
                            _vol_env == "1"
                            or (_vol_env == "auto" and jax.default_backend() == "tpu")
                        )
                    )
                    if use_volume:
                        refine_vol = C.build_tiled_correlation_volume(
                            feature0_ori, feature1_ori, 4
                        )

                        def _refine_corr(lookup_flow):
                            return C.local_correlation_with_flow_from_tiled_volume(
                                refine_vol, lookup_flow, 4
                            )

                    else:

                        def _refine_corr(lookup_flow):
                            return C.local_correlation_with_flow(
                                feature0_ori, feature1_ori, lookup_flow, local_radius=4
                            )

                    # Refine loop as lax.scan (flow/stereo): the update net is
                    # by far the largest compile unit in the model, and the
                    # reference unrolls it num_reg_refine times
                    # (reg_refine.py:37-51 via unimatch.py:272-354). Tracing
                    # and optimizing the body ONCE cuts compile time for
                    # bench/train/dryrun alike; runtime is unchanged (the
                    # iterations are data-dependent sequential either way;
                    # per-iteration upsample work matches the Python loop,
                    # which also computes the mask head every iteration).
                    # Depth keeps the Python loop: its bidir variant doubles
                    # the batch at iteration 0 (shape change), and every
                    # published depth recipe uses num_reg_refine=1.
                    # The scan carries flow; per-iteration (flow, mask) ride
                    # the stacked ys — at inference only the last entry is
                    # read, in training all of them feed deep supervision
                    # through one batched convex upsample.
                    use_scan = (
                        task != "depth"
                        and infer.num_reg_refine > 1
                        and not self.is_initializing()
                        and _os.environ.get("UNIMATCH_REFINE_SCAN", "1") != "0"
                    )
                    if use_scan:
                        refine_def = self.refine.clone(parent=None)
                        refine_vars = {"params": self.variables["params"]["refine"]}
                        # stacked per-iteration outputs are consumed only by
                        # training deep supervision and the parity sow below;
                        # a plain inference apply carries (flow, net) alone —
                        # the [n_iter, B, H, W, 2] stacks are lane-padded
                        # (2 -> 128) on TPU, ~176 MB of physical
                        # dynamic-update writes per flagship forward
                        expose_iters = training or self.is_mutable_collection(
                            "intermediates"
                        )

                        def _scan_body(carry, _):
                            f, _net_prev = carry
                            f = jax.lax.stop_gradient(f)
                            if task == "stereo":
                                disp = jnp.concatenate([-f, jnp.zeros_like(f)], axis=-1)
                                corr_ = _refine_corr(disp)
                            else:
                                corr_ = _refine_corr(f)
                            # mask head only when every iteration's mask is
                            # consumed (training deep supervision): inside
                            # scan XLA cannot DCE the non-final mask heads
                            # like it does in the unrolled loop, so at
                            # inference the body skips them and the mask is
                            # computed ONCE below on the final GRU state
                            net_, mask_, residual_ = refine_def.apply(
                                refine_vars, net0, inp, corr_, f,
                                with_mask=training,
                            )
                            f = f + residual_
                            if task == "stereo":
                                f = jnp.maximum(f, 0.0)
                            if training:
                                ys = (f, mask_, residual_)
                            elif expose_iters:
                                ys = (f, residual_)
                            else:
                                ys = None
                            return (f, net_), ys

                        (flow, net_last), scan_ys = jax.lax.scan(
                            _scan_body, (flow, net0), xs=None,
                            length=infer.num_reg_refine,
                        )
                        if training:
                            iter_flows, iter_masks, iter_residuals = scan_ys
                        elif expose_iters:
                            iter_flows, iter_residuals = scan_ys
                        if expose_iters:
                            # per-iteration residuals for parity
                            # instrumentation: the inner refine_def.apply is
                            # invisible to the outer apply's
                            # capture_intermediates, so expose the stacked
                            # residuals via sow (tests/test_golden_parity.py)
                            self.sow(
                                "intermediates", "refine_residuals", iter_residuals
                            )
                        if training:
                            n_it = infer.num_reg_refine
                            fl = iter_flows.reshape((-1,) + iter_flows.shape[2:])
                            mk = iter_masks.reshape((-1,) + iter_masks.shape[2:])
                            ups = upsample_with_mask(
                                fl, mk, cfg.upsample_factor, is_depth=False
                            )
                            flow_preds.extend(
                                ups.reshape((n_it, -1) + ups.shape[1:])[i]
                                for i in range(n_it)
                            )
                        else:
                            flow_preds.append(
                                upsample_with_mask(
                                    flow,  # the scan carry == iter_flows[-1]
                                    refine_def.apply(
                                        refine_vars, net_last, method="mask_head"
                                    ),
                                    cfg.upsample_factor, is_depth=False,
                                )
                            )
                        refine_iters = []  # python loop below skipped
                    else:
                        refine_iters = list(range(infer.num_reg_refine))

                    for refine_iter_idx in refine_iters:
                        flow = jax.lax.stop_gradient(flow)

                        if task == "stereo":
                            displace = jnp.concatenate([-flow, jnp.zeros_like(flow)], axis=-1)
                            corr = _refine_corr(displace)
                        elif task == "depth":
                            if pred_bidir_depth and refine_iter_idx == 0:
                                intrinsics_curr = jnp.concatenate(
                                    [intrinsics_curr, intrinsics_curr], axis=0
                                )
                                pose = jnp.concatenate([pose, jnp.linalg.inv(pose)], axis=0)
                                feature0_ori, feature1_ori = (
                                    jnp.concatenate([feature0_ori, feature1_ori], axis=0),
                                    jnp.concatenate([feature1_ori, feature0_ori], axis=0),
                                )
                            flow_from_depth = G.compute_flow_with_depth_pose(
                                1.0 / flow[..., 0], intrinsics_curr, extrinsics_rel=pose
                            )
                            # bidir depth doubles the features at iteration 0,
                            # after any precomputed volume: use the exact path
                            corr = C.local_correlation_with_flow(
                                feature0_ori, feature1_ori, flow_from_depth, local_radius=4
                            )
                        else:
                            corr = _refine_corr(flow)

                        _, up_mask, residual_flow = self.refine(net0, inp, corr, flow)

                        if task == "depth":
                            flow = jnp.clip(
                                flow - residual_flow, infer.min_depth, infer.max_depth
                            )
                        else:
                            flow = flow + residual_flow

                        if task == "stereo":
                            flow = jnp.maximum(flow, 0.0)

                        if training or refine_iter_idx == infer.num_reg_refine - 1:
                            if task == "depth":
                                if refine_iter_idx < infer.num_reg_refine - 1:
                                    flow_up = self._upsample_bilinear(
                                        flow, upsample_factor, is_depth=True
                                    )
                                else:
                                    depth_pad = jnp.concatenate(
                                        [flow, jnp.zeros_like(flow)], axis=-1
                                    )
                                    flow_up = jnp.clip(
                                        self._upsample_convex(depth_pad, feature0, is_depth=True),
                                        infer.min_depth,
                                        infer.max_depth,
                                    )[..., :1]
                            else:
                                flow_up = upsample_with_mask(
                                    flow, up_mask, cfg.upsample_factor, is_depth=False
                                )
                            flow_preds.append(flow_up)

        if task == "stereo":
            flow_preds = [p[..., 0] for p in flow_preds]  # [B, H, W]
        if task == "depth":
            flow_preds = [1.0 / p[..., 0] for p in flow_preds]  # inverse -> metric depth

        return {"flow_preds": flow_preds}
