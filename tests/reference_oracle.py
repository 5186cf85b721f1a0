"""Import helper for the upstream PyTorch reference (read-only oracle).

The reference repo at /root/reference is used purely as a numerical oracle in
tests — none of its code ships in this framework. Tests that need it are
skipped when it is unavailable.
"""

import os
import sys

import pytest

REFERENCE_PATH = os.environ.get("UNIMATCH_REFERENCE_PATH", "/root/reference")

HAVE_REFERENCE = os.path.isdir(os.path.join(REFERENCE_PATH, "unimatch"))

if HAVE_REFERENCE and REFERENCE_PATH not in sys.path:
    sys.path.insert(0, REFERENCE_PATH)

requires_reference = pytest.mark.skipif(
    not HAVE_REFERENCE, reason="pytorch reference repo not available"
)


def nchw(x_nhwc):
    """numpy NHWC -> torch NCHW tensor."""
    import torch

    return torch.from_numpy(x_nhwc).permute(0, 3, 1, 2).contiguous()


def nhwc(x_nchw_tensor):
    """torch NCHW tensor -> numpy NHWC."""
    return x_nchw_tensor.detach().permute(0, 2, 3, 1).contiguous().numpy()
