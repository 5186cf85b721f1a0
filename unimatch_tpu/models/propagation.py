"""Self-attention flow propagation (flax.linen, NHWC).

Capability parity with the reference SelfAttnPropagation (attention.py:166-253):
query/key are projections of feature0; value is the flow field. The global
variant is full [HW, HW] attention; the local variant attends over a
(2R+1)^2 window (static shifted slices here, F.unfold there).

Checkpoint-parity quirk preserved: key = k_proj(q_proj(x)) — the reference
applies k_proj on top of the *projected* query (attention.py:198-205,
documented there as an acknowledged bug kept for released checkpoints).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import flax.linen as nn

from unimatch_tpu.models.layers import xavier_uniform
from unimatch_tpu.ops.upsample import extract_patches


class SelfAttnPropagation(nn.Module):
    in_channels: int = 128

    @nn.compact
    def __call__(
        self,
        feature0: jnp.ndarray,  # [B, H, W, C]
        flow: jnp.ndarray,  # [B, H, W, Cf] (flow 2 / disparity 1 / depth 1)
        local_window_attn: bool = False,
        local_window_radius: int = 1,
    ) -> jnp.ndarray:
        b, h, w, c = feature0.shape
        q_proj = nn.Dense(c, kernel_init=xavier_uniform, name="q_proj")
        k_proj = nn.Dense(c, kernel_init=xavier_uniform, name="k_proj")

        if local_window_attn:
            assert local_window_radius > 0
            k = 2 * local_window_radius + 1
            query = q_proj(feature0)  # [B, H, W, C]
            key_map = k_proj(feature0)  # NOTE: k_proj on raw feature here (reference :232)

            # A streaming Pallas form of this window attention existed in
            # rounds 4-5; on chip it was numerically wrong (718 abs error)
            # with no speed win (docs/PERF_NOTES.md round-5d) — deleted.
            key_patches = extract_patches(key_map, k, local_window_radius)  # [B,H,W,k*k,C]
            flow_patches = extract_patches(flow, k, local_window_radius)  # [B,H,W,k*k,Cf]

            scores = jnp.einsum(
                "bhwnc,bhwc->bhwn", key_patches, query, preferred_element_type=jnp.float32
            ) / jnp.sqrt(jnp.float32(c))
            prob = jax.nn.softmax(scores, axis=-1)
            out = jnp.einsum("bhwn,bhwnf->bhwf", prob.astype(flow.dtype), flow_patches)
            return out

        query = q_proj(feature0.reshape(b, h * w, c))
        key = k_proj(query)  # checkpoint-parity quirk (see module docstring)
        value = flow.reshape(b, h * w, flow.shape[-1])

        from unimatch_tpu.parallel.context import sp_applicable

        sp = sp_applicable(h * w)
        if sp is not None:
            # sequence-parallel global propagation (see parallel/context.py)
            from unimatch_tpu.parallel.sequence_parallel import sp_attention_expectation

            mesh, axis = sp
            out = sp_attention_expectation(mesh, query, key, value.astype(query.dtype), axis=axis)
            return out.astype(flow.dtype).reshape(b, h, w, flow.shape[-1])

        from unimatch_tpu.kernels import use_pallas

        if use_pallas():
            # fused softmax-expectation: the [HW, HW] attention matrix stays
            # in VMEM (same kernel as global correlation, v = flow)
            from unimatch_tpu.kernels.attention_expectation import attention_expectation

            out = attention_expectation(query, key, value.astype(query.dtype))
            return out.astype(flow.dtype).reshape(b, h, w, flow.shape[-1])

        scores = jnp.einsum(
            "blc,bmc->blm", query, key, preferred_element_type=jnp.float32
        ) / jnp.sqrt(jnp.float32(c))
        prob = jax.nn.softmax(scores, axis=-1)
        out = jnp.einsum("blm,bmf->blf", prob.astype(value.dtype), value)
        return out.reshape(b, h, w, flow.shape[-1])
