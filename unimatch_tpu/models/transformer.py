"""Feature transformer: stacked self/cross attention blocks (flax.linen).

Capability parity with the reference (unimatch/transformer.py:9-294):
  * TransformerLayer: single-head q/k/v/merge projections (no bias),
    post-norm, and — only on cross-attention layers — an FFN over
    concat(source, message) with 2x input width and GELU.
  * TransformerBlock = self-attn layer + cross-attn+FFN layer.
  * FeatureTransformer: N blocks; feature0/feature1 are stacked on the batch
    axis so both directions compute in one pass; every odd block uses the
    shifted window (Swin SW-MSA) with a precomputed additive mask.

Unlike the reference (which detects self-vs-cross attention numerically at
runtime via (q-k).abs().max() — transformer.py:55), self/cross is a *static*
property of the call site here, so XLA specializes each path.

attn_type dispatch (reference transformer.py:62-135):
  'swin'                      flow: self & cross both swin-2D
  'self_swin2d_cross_1d'      stereo scale1: cross-attn is full 1D per row
  'self_swin2d_cross_swin1d'  stereo scale2: cross-attn is shifted-window 1D
  anything else               full 2D attention
"""

from __future__ import annotations

import os
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import flax.linen as nn

from unimatch_tpu.models.layers import LayerNorm, gelu_exact, xavier_uniform
from unimatch_tpu.ops import attention_ops as A
from unimatch_tpu.ops import windows as W


def _dense(features: int, name: str) -> nn.Dense:
    return nn.Dense(features, use_bias=False, kernel_init=xavier_uniform, name=name)


def _fuse_ffn() -> bool:
    """Dispatch the cross-attention FFN tail to the fused Pallas kernel
    (kernels/ffn.py). UNIMATCH_FUSE_FFN=0 re-traces the XLA form for A/B."""
    return os.environ.get("UNIMATCH_FUSE_FFN", "1") != "0"


def _swin_spatial() -> bool:
    """Route swin-2D window attention through the relayout-free spatial
    kernel (ops/attention_ops.py::swin_layer_attention): the window
    split/merge happens in BlockSpec index maps instead of HBM relayouts,
    and q/k/v stay packed on the channel axis end to end. Default ON since
    round 4: single-layer on-chip parity is EXACT (0.0 vs the XLA form —
    round-3's 3.6 six-layer drift was chained-bf16 amplification, not
    kernel error), SOLO flagship A/B 62.9 vs 65.7 ms median
    (scripts/tpu_round4a_batch.py). UNIMATCH_SWIN_SPATIAL=0 re-traces the
    XLA form for A/B."""
    return os.environ.get("UNIMATCH_SWIN_SPATIAL", "1") != "0"


class TransformerLayer(nn.Module):
    d_model: int = 128
    no_ffn: bool = False
    ffn_dim_expansion: int = 4

    @nn.compact
    def __call__(
        self,
        source: jnp.ndarray,  # [B, L, C]
        target: jnp.ndarray,  # [B, L, C]
        is_self_attn: bool,
        h: int,
        w: int,
        attn_type: str = "swin",
        with_shift: bool = False,
        attn_num_splits: int = 1,
        attn_mask_2d: Optional[jnp.ndarray] = None,
        attn_mask_1d: Optional[jnp.ndarray] = None,
    ) -> jnp.ndarray:
        c = self.d_model
        # combined projections: one MXU dot instead of three (self-attn) or
        # two (cross-attn) — the input map is read once. Param tree unchanged
        # (kernels are concatenated weight-side at apply time).
        wq = self.scope.push("q_proj").param("kernel", xavier_uniform, (c, c))
        wk = self.scope.push("k_proj").param("kernel", xavier_uniform, (c, c))
        wv = self.scope.push("v_proj").param("kernel", xavier_uniform, (c, c))
        dt = source.dtype
        # swin-2D attention dispatches to the fused spatial layer kernel
        # when enabled — projections happen in-kernel there, so the packed
        # einsums below are skipped entirely on that path
        swin_2d_here = attn_num_splits > 1 and (
            attn_type == "swin"
            or (is_self_attn and attn_type in ("self_swin2d_cross_1d",
                                               "self_swin2d_cross_swin1d"))
        )
        # windows beyond the spatial kernel's VMEM budget (whole-window k/v
        # + score tile) keep the split form, which streams q flash-style
        use_spatial = False
        if swin_2d_here and _swin_spatial():
            from unimatch_tpu.kernels.window_attention import swin_spatial_supported

            use_spatial = swin_spatial_supported(h, w, c, attn_num_splits, dt)

        if use_spatial:
            # the whole layer runs as one kernel: qkv projection, window
            # attention, merge + norm1 epilogue, and (unshifted self
            # layers) the residual. Identical param tree: same names/inits
            # as the _dense and LayerNorm modules on the unfused path.
            wm = self.scope.push("merge").param("kernel", xavier_uniform, (c, c))
            nsc = self.scope.push("norm1")
            g1 = nsc.param("scale", nn.initializers.ones, (c,))
            b1 = nsc.param("bias", nn.initializers.zeros, (c,))
            fuse_residual = self.no_ffn and not with_shift
            if is_self_attn:
                w1, w2, tgt = jnp.concatenate([wq, wk, wv], axis=1), None, None
            else:
                w1, w2, tgt = wq, jnp.concatenate([wk, wv], axis=1), target
            message = A.swin_layer_attention(
                source, tgt, w1, w2,
                attn_num_splits, with_shift, h, w, attn_mask=attn_mask_2d,
                epilogue=(wm, g1, b1), fuse_res=fuse_residual,
            )
            if self.no_ffn:
                return message if fuse_residual else source + message
        if not use_spatial:
            if is_self_attn:
                qkv = jnp.einsum(
                    "blc,cd->bld", source,
                    jnp.concatenate([wq, wk, wv], axis=1).astype(dt),
                    preferred_element_type=jnp.float32,
                ).astype(dt)
                query, key, value = qkv[..., :c], qkv[..., c : 2 * c], qkv[..., 2 * c :]
            else:
                query = jnp.einsum("blc,cd->bld", source, wq.astype(dt),
                                   preferred_element_type=jnp.float32).astype(dt)
                kv = jnp.einsum(
                    "blc,cd->bld", target, jnp.concatenate([wk, wv], axis=1).astype(dt),
                    preferred_element_type=jnp.float32,
                ).astype(dt)
                key, value = kv[..., :c], kv[..., c:]

        if use_spatial:
            pass  # message = merge+norm1 output from the fused layer kernel
        elif attn_type == "swin" and attn_num_splits > 1:
            message = A.split_window_attention(
                query, key, value, attn_num_splits, with_shift, h, w, attn_mask=attn_mask_2d
            )
        elif attn_type == "self_swin2d_cross_1d":
            if is_self_attn:
                if attn_num_splits > 1:
                    message = A.split_window_attention(
                        query, key, value, attn_num_splits, with_shift, h, w, attn_mask=attn_mask_2d
                    )
                else:
                    message = A.full_attention(query, key, value)
            else:
                message = A.full_attention_1d(query, key, value, h, w)
        elif attn_type == "self_swin2d_cross_swin1d":
            if is_self_attn:
                if attn_num_splits > 1:
                    message = A.split_window_attention(
                        query, key, value, attn_num_splits, with_shift, h, w, attn_mask=attn_mask_2d
                    )
                else:
                    message = A.full_attention(query, key, value)
            else:
                if attn_num_splits > 1:
                    assert attn_mask_1d is not None
                    message = A.split_window_attention_1d(
                        query, key, value, attn_num_splits, with_shift, h, w, attn_mask=attn_mask_1d
                    )
                else:
                    message = A.full_attention_1d(query, key, value, h, w)
        else:
            message = A.full_attention(query, key, value)

        if not use_spatial:
            message = _dense(c, "merge")(message)
            message = LayerNorm(name="norm1")(message)

        if not self.no_ffn:
            hdim = 2 * c * self.ffn_dim_expansion
            # Fused Pallas FFN (dense-GELU-dense-LayerNorm-residual,
            # kernels/ffn.py): the [L, H] hidden activations never leave
            # VMEM. Round 2 measured this "9x slower" — that number was the
            # first-measurement warmup artifact the methodology fixes later
            # identified; the round-3 interleaved A/B has it ~30% FASTER
            # than the XLA path at the s1 shape (2.0 vs 2.9 ms,
            # docs/PERF_NOTES.md). Param tree unchanged.
            if _fuse_ffn():
                from unimatch_tpu.kernels import use_pallas

                if use_pallas():
                    from unimatch_tpu.kernels.ffn import fused_ffn

                    w0 = self.scope.push("mlp_0").param(
                        "kernel", xavier_uniform, (2 * c, hdim))
                    w2 = self.scope.push("mlp_2").param(
                        "kernel", xavier_uniform, (hdim, c))
                    norm_sc = self.scope.push("norm2")
                    gamma = norm_sc.param("scale", nn.initializers.ones, (c,))
                    beta = norm_sc.param("bias", nn.initializers.zeros, (c,))
                    return fused_ffn(source, message, w0, w2, gamma, beta)

            # materialized concat + one [L, 2C] x [2C, H] dot: the virtual
            # (per-part) split writes the fat [L, H] accumulator once per
            # part; one concat write (2C, small) + one dot is cheaper
            w0 = self.scope.push("mlp_0").param("kernel", xavier_uniform, (2 * c, hdim))
            y = jnp.einsum(
                "blc,cd->bld",
                jnp.concatenate([source, message], axis=-1),
                w0.astype(source.dtype),
                preferred_element_type=jnp.float32,
            ).astype(source.dtype)
            y = gelu_exact(y)
            message = _dense(c, "mlp_2")(y)
            message = LayerNorm(name="norm2")(message)

        return source + message


class TransformerBlock(nn.Module):
    """Self-attention layer followed by cross-attention + FFN layer."""

    d_model: int = 128
    ffn_dim_expansion: int = 4

    @nn.compact
    def __call__(self, source, target, h, w, attn_type, with_shift, attn_num_splits,
                 attn_mask_2d=None, attn_mask_1d=None):
        source = TransformerLayer(
            d_model=self.d_model, no_ffn=True, ffn_dim_expansion=self.ffn_dim_expansion,
            name="self_attn",
        )(source, source, True, h, w, attn_type, with_shift, attn_num_splits,
          attn_mask_2d, attn_mask_1d)

        source = TransformerLayer(
            d_model=self.d_model, ffn_dim_expansion=self.ffn_dim_expansion,
            name="cross_attn_ffn",
        )(source, target, False, h, w, attn_type, with_shift, attn_num_splits,
          attn_mask_2d, attn_mask_1d)
        return source


class FeatureTransformer(nn.Module):
    num_layers: int = 6
    d_model: int = 128
    ffn_dim_expansion: int = 4

    @nn.compact
    def __call__(
        self,
        feature0: jnp.ndarray,  # [B, H, W, C]
        feature1: jnp.ndarray,
        attn_type: str = "swin",
        attn_num_splits: int = 1,
    ) -> Tuple[jnp.ndarray, jnp.ndarray]:
        b, h, w, c = feature0.shape
        assert c == self.d_model

        f0 = feature0.reshape(b, h * w, c)
        f1 = feature1.reshape(b, h * w, c)

        mask_2d = None
        if "swin" in attn_type and attn_num_splits > 1:
            wh, ww = h // attn_num_splits, w // attn_num_splits
            mask_2d = W.generate_shift_window_attn_mask(h, w, wh, ww, wh // 2, ww // 2)

        mask_1d = None
        if "swin1d" in attn_type and attn_num_splits > 1:
            ww = w // attn_num_splits
            mask_1d = W.generate_shift_window_attn_mask_1d(w, ww, ww // 2)

        # both directions in one pass: stack (0->1) and (1->0) on batch
        concat0 = jnp.concatenate([f0, f1], axis=0)  # [2B, L, C]
        concat1 = jnp.concatenate([f1, f0], axis=0)

        for i in range(self.num_layers):
            with_shift = "swin" in attn_type and attn_num_splits > 1 and i % 2 == 1
            concat0 = TransformerBlock(
                d_model=self.d_model, ffn_dim_expansion=self.ffn_dim_expansion,
                name=f"block_{i}",
            )(concat0, concat1, h, w, attn_type, with_shift, attn_num_splits, mask_2d, mask_1d)
            # re-derive the swapped pairing from the updated features
            new_f0, new_f1 = jnp.split(concat0, 2, axis=0)
            concat1 = jnp.concatenate([new_f1, new_f0], axis=0)

        f0, f1 = jnp.split(concat0, 2, axis=0)
        return f0.reshape(b, h, w, c), f1.reshape(b, h, w, c)
