"""Input size adaptation for inference/eval (static-shape friendly).

Capability parity with reference utils/utils.py:6-24 (InputPadder): pad
images to a multiple of `padding_factor`, 'sintel' mode centers the pad,
'kitti' mode centers the width pad and pads height at the bottom.
Padding/unpadding are part of the metric
contract — validation numbers depend on them.

TPU note: padding to shape buckets is also what keeps XLA compile counts
bounded across variable-size datasets; `bucket_shape` rounds any (H, W) up
to the next multiple so a whole dataset reuses a handful of compiled
programs.
"""

from __future__ import annotations

from typing import Sequence, Tuple

import numpy as np


class InputPadder:
    """Pads numpy/JAX NHWC images to a multiple of padding_factor."""

    def __init__(self, shape: Sequence[int], mode: str = "sintel", padding_factor: int = 8):
        self.ht, self.wd = shape[-3], shape[-2]  # NHWC
        pad_ht = (((self.ht // padding_factor) + 1) * padding_factor - self.ht) % padding_factor
        pad_wd = (((self.wd // padding_factor) + 1) * padding_factor - self.wd) % padding_factor
        if mode == "sintel":
            # centered: [left, right, top, bottom]
            self._pad = [pad_wd // 2, pad_wd - pad_wd // 2, pad_ht // 2, pad_ht - pad_ht // 2]
        else:  # 'kitti': width centered, height padded at the bottom (reference utils.py:16)
            self._pad = [pad_wd // 2, pad_wd - pad_wd // 2, 0, pad_ht]

    def pad(self, *inputs):
        """Replicate-pad NHWC arrays (matches torch F.pad mode='replicate')."""
        import jax.numpy as jnp

        l, r, t, b = self._pad
        outs = [jnp.pad(x, ((0, 0), (t, b), (l, r), (0, 0)), mode="edge") for x in inputs]
        return outs if len(outs) > 1 else outs[0]

    def unpad(self, x):
        l, r, t, b = self._pad
        h, w = x.shape[-3] if x.ndim == 4 else x.shape[-2], None
        if x.ndim == 4:  # [B, H, W, C]
            H, W = x.shape[1], x.shape[2]
            return x[:, t : H - b, l : W - r, :]
        # [B, H, W]
        H, W = x.shape[1], x.shape[2]
        return x[:, t : H - b, l : W - r]


def bucket_shape(h: int, w: int, factor: int = 32) -> Tuple[int, int]:
    """Round (h, w) up to the next multiple of factor (compile-count bounding)."""
    return (-(-h // factor) * factor, -(-w // factor) * factor)
