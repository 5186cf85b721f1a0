"""Golden-activation checkpoint parity for the flagship configs.

Fixtures (tests/fixtures/golden_*.npz) were generated ONCE from the torch
reference running in float64 (scripts/make_golden_fixtures.py) with
deterministic synthetic weights; this test regenerates the identical weights
from the (key, shape) table (tests/golden_utils.py), converts them exactly the
way a released .pth would be converted (unimatch_tpu.convert), runs our model
in fp32, and compares stage-by-stage activations plus the final prediction
against the fp64 anchor. Neither torch nor the reference repo is needed here.

This replaces the round-1 random-weight 0.05-EPE budget as the flagship
parity evidence. Tolerance per stage = max(2 x the reference's own
fp32-vs-fp64 floor at that stage, a small epsilon): early stages are tight
(backbone ~1e-5, transformer ~1e-3), and where random-weight refinement is
chaotic the floor proves our fp32 matches the fp64 anchor as well as the
reference's own fp32 does (stereo final floor 5e-3, depth 1.4e-3 — both
tight end-to-end; the flow-regrefine6 final is chaos-dominated for ANY fp32
implementation, floor 44 px).
"""

import ast
import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from unimatch_tpu.config import InferenceConfig, ModelConfig
from unimatch_tpu.convert import convert_state_dict
from unimatch_tpu.models.unimatch import UniMatch

from golden_utils import synthetic_state_dict

FIXTURE_DIR = os.path.join(os.path.dirname(os.path.abspath(__file__)), "fixtures")

# smoke tier: one full forward per task, pinned stage-by-stage to fp64 anchors
pytestmark = pytest.mark.smoke

# Per-stage tolerance = max(2 x the reference's own fp32-vs-fp64 floor at
# that stage [stored in the fixture], stage epsilon). With random weights the
# hierarchy+refinement is chaotic — the floors measure exactly how much fp32
# rounding diverges from the fp64 anchor for the *reference itself*, so
# matching within 2x the floor is the strongest claim fp32 can support.
CASES = ["gmflow_scale2_regrefine6", "gmstereo_scale2_regrefine3",
         "gmdepth_scale1_regrefine1"]

STAGE_EPS = {
    "backbone": 2e-4,
    "transformer": 2e-3,
    "feature_flow_attn": 2e-2,
    "refine": 2e-2,
    "flow_preds": 5e-2,
}


def _leaves_with_path(tree, prefix=()):
    if isinstance(tree, (tuple, list)):
        for i, v in enumerate(tree):
            yield from _leaves_with_path(v, prefix + (str(i),))
    elif isinstance(tree, dict):
        for k, v in tree.items():
            yield from _leaves_with_path(v, prefix + (str(k),))
    else:
        yield prefix, tree


def _maxdiff(a, b):
    a = np.asarray(a, np.float32)
    b = np.asarray(b, np.float32)
    assert a.shape == b.shape, (a.shape, b.shape)
    return float(np.max(np.abs(a - b)))


@pytest.mark.parametrize("name", CASES)
def test_golden_parity(name):
    fix = np.load(os.path.join(FIXTURE_DIR, f"golden_{name}.npz"))
    task = str(fix["task"])
    mkw = ast.literal_eval(str(fix["model_kwargs"]))
    fkw = ast.literal_eval(str(fix["forward_kwargs"]))

    keys_shapes = [
        (str(k), tuple(int(x) for x in str(s).split(",")))
        for k, s in zip(fix["weight_keys"], fix["weight_shapes"])
    ]
    state = synthetic_state_dict(keys_shapes, seed=0)
    params = {"params": convert_state_dict(state)}

    cfg = ModelConfig(task=task, num_scales=mkw["num_scales"],
                      upsample_factor=mkw["upsample_factor"],
                      reg_refine=mkw["reg_refine"])
    depth_kw = {k: fkw[k] for k in ("min_depth", "max_depth") if k in fkw}
    infer = InferenceConfig(
        attn_type=fkw["attn_type"],
        attn_splits_list=tuple(fkw["attn_splits_list"]),
        corr_radius_list=tuple(fkw["corr_radius_list"]),
        prop_radius_list=tuple(fkw["prop_radius_list"]),
        num_reg_refine=fkw["num_reg_refine"],
        **depth_kw,
    )
    model = UniMatch(config=cfg)

    extra = {}
    if task == "depth":
        extra = {"intrinsics": jnp.asarray(fix["intrinsics"]),
                 "pose": jnp.asarray(fix["pose"])}

    out, state_vars = model.apply(
        params, jnp.asarray(fix["img0"]), jnp.asarray(fix["img1"]), infer=infer,
        capture_intermediates=True, mutable=["intermediates"], **extra,
    )
    inter = state_vars["intermediates"]

    def calls(mod):
        return inter[mod]["__call__"]

    report = {}

    # backbone: one call on concat(img0, img1); list of per-scale features.
    got_bb = {a.shape: a for _, a in _leaves_with_path(calls("backbone"))}
    n_bb = 0
    for key in fix.files:
        if key.startswith("backbone."):
            ref = fix[key]
            report[key] = _maxdiff(got_bb[ref.shape], ref)
            n_bb += 1
    assert n_bb >= cfg.num_scales

    # transformer: one call per scale, each returning (feature0, feature1)
    tr_calls = calls("transformer")
    for si in range(cfg.num_scales):
        for fi in range(2):
            key = f"transformer.call{si}.{fi}"
            report[key] = _maxdiff(tr_calls[si][fi], fix[key])

    # propagation output (flow/disp/depth after SelfAttnPropagation)
    prop_calls = calls("feature_flow_attn")
    for si in range(cfg.num_scales):
        key = f"feature_flow_attn.call{si}"
        report[key] = _maxdiff(prop_calls[si], fix[key])

    # per-refine-iteration residual flow (output 2 of BasicUpdateBlock):
    # pins the refine loop stage-by-stage with per-iteration fp32 floors,
    # instead of relying only on the chaos-dominated final output
    if cfg.reg_refine and "refine.call0.2" in fix.files:
        if "refine_residuals" in inter:
            # lax.scan refine path: residuals are sown stacked [N, B, h, w, c]
            # (the inner refine apply is invisible to capture_intermediates)
            stacked = inter["refine_residuals"][0]
            per_iter = [stacked[it] for it in range(infer.num_reg_refine)]
        else:
            per_iter = [c[2] for c in calls("refine")]
        for it in range(infer.num_reg_refine):
            key = f"refine.call{it}.2"
            report[key] = _maxdiff(per_iter[it], fix[key])

    # final full-resolution prediction
    report["flow_preds.0"] = _maxdiff(out["flow_preds"][-1], fix["flow_preds.0"])

    def tol_for(key):
        eps = STAGE_EPS[key.split(".")[0]]
        floor = float(fix[f"floor.{key}"]) if f"floor.{key}" in fix.files else 0.0
        return max(2.0 * floor, eps)

    msg = "\n".join(
        f"  {k}: {v:.2e} (tol {tol_for(k):.2e})" for k, v in sorted(report.items())
    )
    for k, v in report.items():
        assert v <= tol_for(k), (
            f"{name}: {k} diff {v:.3e} > {tol_for(k):.3e}\nall diffs:\n{msg}"
        )
