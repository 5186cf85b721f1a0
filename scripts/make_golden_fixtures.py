"""Generate golden-activation fixtures from the torch reference (run ONCE).

Requires torch + the reference repo (UNIMATCH_REFERENCE_PATH, default
/root/reference). Produces tests/fixtures/golden_<name>.npz holding:
  inputs (img0/img1 [+K/pose]), the (key, shape) weight table (weights are
  regenerated from it — see tests/golden_utils.py), intermediate activations
  (backbone features, per-scale transformer outputs, propagation outputs),
  the final prediction — all NHWC float32 — and per-stage fp32 *conditioning
  floors*.

The torch side runs TWICE:
  * float64 -> the golden anchors (fp-noise-free);
  * float32 -> per-stage max-abs diff vs the anchor = "floor.<stage>",
    the reference's own fp32 conditioning floor at that stage. With random
    weights the hierarchical refinement loop is chaotic (measured: torch
    fp32 final flow lands median 1.9 px from its own fp64 run), so absolute
    tolerances are meaningless downstream; the parity test instead asserts
    our fp32 diff <= max(2x floor, stage epsilon) — i.e. we match the fp64
    anchor as well as the reference's own fp32 does.
(reference forward semantics: unimatch/unimatch.py:95-367)
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tests"))

REFERENCE_PATH = os.environ.get("UNIMATCH_REFERENCE_PATH", "/root/reference")
sys.path.insert(0, REFERENCE_PATH)

import numpy as np
import torch

from golden_utils import synthetic_state_dict

FIXTURE_DIR = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                           "tests", "fixtures")

CASES = {
    # name: (task, model kwargs, forward kwargs, H, W)
    "gmflow_scale2_regrefine6": (
        "flow",
        dict(num_scales=2, upsample_factor=4, reg_refine=True),
        dict(attn_type="swin", attn_splits_list=[2, 8], corr_radius_list=[-1, 4],
             prop_radius_list=[-1, 1], num_reg_refine=6),
        160, 224,
    ),
    "gmstereo_scale2_regrefine3": (
        "stereo",
        dict(num_scales=2, upsample_factor=4, reg_refine=True),
        dict(attn_type="self_swin2d_cross_swin1d", attn_splits_list=[2, 8],
             corr_radius_list=[-1, 4], prop_radius_list=[-1, 1], num_reg_refine=3),
        160, 224,
    ),
    "gmdepth_scale1_regrefine1": (
        "depth",
        dict(num_scales=1, upsample_factor=8, reg_refine=True),
        # the reference forward's *default* min/max_depth are swapped
        # (unimatch.py:105-106) and every caller overrides them
        # (evaluate_depth.py:110-111) — pass the real inverse-depth range
        dict(attn_type="self_swin2d_cross_swin1d", attn_splits_list=[2],
             corr_radius_list=[-1], prop_radius_list=[-1], num_reg_refine=1,
             min_depth=1.0 / 10.0, max_depth=1.0 / 0.5),
        160, 224,
    ),
}

_ORIG_TENSOR_FLOAT = torch.Tensor.float


def run_reference(name, dtype):
    """Build the reference model with synthetic weights and run it in dtype.

    Returns (inputs dict, activations dict, keys_shapes)."""
    from unimatch.unimatch import UniMatch as TorchUniMatch

    task, mkw, fkw, h, w = CASES[name]
    # fp64 everywhere, including tensors the reference creates internally
    # (coords grids, masks). The reference pins fp32 with explicit .float()
    # calls (geometry.py:14), so .float() is redirected for the fp64 pass.
    torch.set_default_dtype(dtype)
    if dtype == torch.float64:
        torch.Tensor.float = lambda self: self.to(torch.float64)
    else:
        torch.Tensor.float = _ORIG_TENSOR_FLOAT

    model = TorchUniMatch(feature_channels=128, num_head=1, ffn_dim_expansion=4,
                          num_transformer_layers=6, task=task, **mkw)
    model.eval()

    keys_shapes = [(k, tuple(v.shape)) for k, v in model.state_dict().items()]
    assert all(v.is_floating_point() for v in model.state_dict().values())
    state = synthetic_state_dict(keys_shapes, seed=0)
    model.load_state_dict({k: torch.from_numpy(v).to(dtype) for k, v in state.items()})

    rng = np.random.RandomState(1)
    scale = 255.0 if task == "flow" else 1.0
    img0 = (rng.rand(1, h, w, 3) * scale).astype(np.float32)
    # img1 = shifted img0 + small noise: even with random weights, identical
    # patches produce identical features, so correlation softmax is *peaked*
    # at the true shift and the pipeline is far better conditioned than with
    # an independent random pair (flat softmax -> chaotic expectation).
    if task == "flow":
        img1 = np.roll(img0, shift=(6, 9), axis=(1, 2))
    elif task == "stereo":
        img1 = np.roll(img0, shift=-8, axis=2)  # positive disparity 8
    else:
        img1 = img0.copy()
    img1 = np.clip(img1 + rng.randn(*img1.shape).astype(np.float32) * 0.01 * scale,
                   0, scale).astype(np.float32)

    inputs = {"img0": img0, "img1": img1}
    extra_in = {}
    if task == "depth":
        K = np.array([[[260.0, 0, w / 2.0], [0, 260.0, h / 2.0], [0, 0, 1]]], np.float32)
        pose = np.eye(4, dtype=np.float32)[None]
        pose[:, 0, 3] = 0.15
        pose[:, 1, 3] = -0.05
        inputs["intrinsics"] = K
        inputs["pose"] = pose
        extra_in = {"intrinsics": torch.from_numpy(K).to(dtype),
                    "pose": torch.from_numpy(pose).to(dtype)}

    acts = {}

    def save_tensors(prefix, obj):
        if torch.is_tensor(obj):
            a = obj.detach()
            if a.dim() == 4:  # NCHW -> NHWC
                a = a.permute(0, 2, 3, 1)
            acts[prefix] = np.asarray(a.numpy(), np.float32)
        elif isinstance(obj, (list, tuple)):
            for i, o in enumerate(obj):
                save_tensors(f"{prefix}.{i}", o)

    hooks = []
    counters = {}

    def hook(mod_name):
        def fn(_m, _inp, out):
            i = counters.get(mod_name, 0)
            counters[mod_name] = i + 1
            save_tensors(f"{mod_name}.call{i}", out)
        return fn

    hooks.append(model.backbone.register_forward_hook(hook("backbone")))
    hooks.append(model.transformer.register_forward_hook(hook("transformer")))
    hooks.append(model.feature_flow_attn.register_forward_hook(hook("feature_flow_attn")))

    # per-refine-iteration residual flow (output 2 of BasicUpdateBlock,
    # reference unimatch.py:322-327): pins the refine loop stage-by-stage
    # instead of only at the chaos-dominated final output. Only the small
    # residual is stored (net/mask would add ~15 MB per case).
    if getattr(model, "refine", None) is not None:
        def refine_hook(_m, _inp, out):
            i = counters.get("refine", 0)
            counters["refine"] = i + 1
            save_tensors(f"refine.call{i}.2", out[2])
        hooks.append(model.refine.register_forward_hook(refine_hook))

    with torch.no_grad():
        out = model(torch.from_numpy(img0).permute(0, 3, 1, 2).to(dtype),
                    torch.from_numpy(img1).permute(0, 3, 1, 2).to(dtype),
                    task=task, **extra_in, **fkw)
    for hk in hooks:
        hk.remove()
    save_tensors("flow_preds", out["flow_preds"])
    return inputs, acts, keys_shapes


def make_case(name):
    task, mkw, fkw, h, w = CASES[name]
    inputs, golden, keys_shapes = run_reference(name, torch.float64)
    _, fp32_acts, _ = run_reference(name, torch.float32)

    payload = dict(inputs)
    payload.update({
        "weight_keys": np.array([k for k, _ in keys_shapes]),
        "weight_shapes": np.array([",".join(map(str, s)) for _, s in keys_shapes]),
        "task": np.array(task),
        "model_kwargs": np.array(repr(mkw)),
        "forward_kwargs": np.array(repr(fkw)),
    })
    payload.update(golden)
    for key in golden:
        floor = float(np.max(np.abs(fp32_acts[key] - golden[key])))
        payload[f"floor.{key}"] = np.float32(floor)

    os.makedirs(FIXTURE_DIR, exist_ok=True)
    path = os.path.join(FIXTURE_DIR, f"golden_{name}.npz")
    np.savez_compressed(path, **payload)
    mb = os.path.getsize(path) / 1e6
    floors = {k: float(payload["floor." + k]) for k in golden}
    worst = max(floors, key=floors.get)
    print(f"{name}: {len(golden)} activations, {mb:.2f} MB; worst fp32 floor "
          f"{worst}={floors[worst]:.2e} -> {path}")


if __name__ == "__main__":
    for name in sys.argv[1:] or list(CASES):
        make_case(name)
