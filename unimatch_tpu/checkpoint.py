"""Checkpoint save/resume (Orbax) with reference-compatible workflow.

Parity with the reference's two checkpoint flavors (main_flow.py:463-480):
  step_XXXXXX         model params only
  checkpoint_latest   params + optimizer state + step + epoch (for --resume)
plus cross-task warm start: non-strict loading of a converted flow-task .pth
into stereo/depth models (--strict_resume off; --resume_exclude_upsampler,
reference main_stereo.py:56, MODEL_ZOO.md:35,57).
"""

from __future__ import annotations

import os
from typing import Any, Dict, Optional

import jax
import numpy as np


def _checkpointer():
    import orbax.checkpoint as ocp

    return ocp.PyTreeCheckpointer()


def save_params(path: str, params) -> None:
    _checkpointer().save(os.path.abspath(path), jax.device_get(params), force=True)


def save_training_state(path: str, state, epoch: int = 0) -> None:
    payload = {
        "params": jax.device_get(state.params),
        "opt_state": jax.device_get(state.opt_state),
        "step": int(state.step),
        "epoch": epoch,
    }
    _checkpointer().save(os.path.abspath(path), payload, force=True)


def restore(path: str, template: Optional[Any] = None) -> Dict[str, Any]:
    """Restore a checkpoint; pass `template` (a matching pytree of arrays) to
    recover container types (optax NamedTuple states restore as plain dicts
    otherwise)."""
    if template is None:
        return _checkpointer().restore(os.path.abspath(path))
    return _checkpointer().restore(os.path.abspath(path), item=template)


def load_any_params(path: str):
    """Load params from an Orbax dir or a torch .pth (auto-converted)."""
    if path.endswith(".pth") or path.endswith(".pt"):
        import torch

        ckpt = torch.load(path, map_location="cpu", weights_only=False)
        state = ckpt.get("model", ckpt) if isinstance(ckpt, dict) else ckpt
        # DepthSplat checkpoints carry mono/mv-branch keys absent from UniMatch
        if any(k.split("module.")[-1].startswith(("pretrained.", "mv_pyramid.", "mono_pyramid."))
               for k in state):
            from unimatch_tpu.convert_depthsplat import convert_depthsplat_state_dict

            return convert_depthsplat_state_dict(state)
        from unimatch_tpu.convert import convert_state_dict

        return convert_state_dict(state)
    restored = restore(path)
    return restored.get("params", restored)


def merge_params(init_params, loaded, strict: bool = True, exclude_upsampler: bool = False):
    """Non-strict merge of loaded params into an initialized tree.

    Mirrors torch load_state_dict(strict=False) used for cross-task transfer.
    Leaves missing in `loaded` (e.g. task-specific refine heads) keep their
    fresh initialization; extra keys in `loaded` are ignored.
    """

    def walk(init_node, loaded_node, path=""):
        out = {}
        for k, v in init_node.items():
            lp = loaded_node.get(k) if isinstance(loaded_node, dict) else None
            name = f"{path}/{k}"
            if exclude_upsampler and name.startswith("/upsampler"):
                out[k] = v
                continue
            if isinstance(v, dict):
                out[k] = walk(v, lp or {}, name)
            elif lp is not None and np.shape(lp) == np.shape(v):
                out[k] = np.asarray(lp, dtype=np.asarray(v).dtype)
            else:
                if strict and not exclude_upsampler:
                    raise ValueError(f"missing or mismatched param: {name}")
                out[k] = v
        return out

    return walk(init_params, loaded)
