"""Sequence-parallel execution context.

Activates token-dimension sharding of the O((HW)^2) global-matching stages
(global correlation softmax + global self-attention propagation) inside the
standard `UniMatch.__call__` — no model-code changes at call sites:

    mesh = make_mesh(jax.devices(), axis="sp")
    with sequence_parallel(mesh):
        out = model.apply(params, img0, img1, infer=infer)

Each device computes the softmax-expectation for its block of query tokens
against replicated k/v (at UniMatch feature sizes, k/v are a few MB while
the score matrix is GBs — sharding the quadratic term is the right split).
A capability the reference lacks (it is pure data-parallel, SURVEY §5).

CLI surface: `--num_sp_devices N` on the eval/inference paths of the three
drivers wraps the run in this context.

The context applies only where the token count divides the mesh size;
other shapes fall back to the single-device path (correctness first).
"""

from __future__ import annotations

import contextlib
import threading
from typing import Optional

from jax.sharding import Mesh

_state = threading.local()


def current_sp() -> Optional[tuple]:
    """Active (mesh, axis) or None."""
    return getattr(_state, "sp", None)


@contextlib.contextmanager
def sequence_parallel(mesh: Mesh, axis: str = "sp"):
    assert axis in mesh.axis_names, (axis, mesh.axis_names)
    prev = getattr(_state, "sp", None)
    _state.sp = (mesh, axis)
    try:
        yield
    finally:
        _state.sp = prev


_warned_declines = set()


def sp_applicable(num_tokens: int) -> Optional[tuple]:
    """Return (mesh, axis) when SP is active and divides num_tokens.

    When SP is active but the token count does not divide the mesh, a
    warning is emitted (once per (tokens, devices) pair) so a user passing
    --num_sp_devices on an off-size image learns they silently got the
    single-device path — and can pad to a divisible size.
    """
    sp = current_sp()
    if sp is None:
        return None
    mesh, axis = sp
    n = mesh.shape[axis]
    if num_tokens % n != 0:
        key = (num_tokens, n)
        if key not in _warned_declines:
            _warned_declines.add(key)
            import warnings

            warnings.warn(
                f"sequence-parallel declined for this stage: {num_tokens} tokens "
                f"do not divide mesh axis '{axis}' ({n} devices); executing "
                f"single-device. Pad the input so the sharded dimension divides "
                f"the mesh to enable SP.",
                stacklevel=3,
            )
        return None
    return sp
