"""Round-3b on-TPU stage breakdown of the flagship forward (volume path).

Refreshes the PERF_NOTES stage table with the round-3 binary so the next
optimization target is chosen from data, not the stale round-2 table.
Each stage timed in isolation (carries ~2-8 ms dispatch overhead — compare
stages to each other and to the 78.6 ms full forward, not absolutely).
Emits JSON lines to stdout and /tmp/tpu_r3b_results.jsonl.
"""

import json
import os
import sys
import time
import traceback

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

OUT = "/tmp/tpu_r3b_results.jsonl"


def emit(**kw):
    line = json.dumps(kw)
    print(line, flush=True)
    with open(OUT, "a") as f:
        f.write(line + "\n")


def guarded(fn):
    t0 = time.time()
    try:
        fn()
        emit(part=fn.__name__, status="done", wall_s=round(time.time() - t0, 1))
    except Exception as e:  # noqa: BLE001
        traceback.print_exc()
        emit(part=fn.__name__, status="error", error=repr(e)[:400])


from unimatch_tpu.utils.benchmark import time_chained  # noqa: E402

RNG = np.random.RandomState(0)


def bf(*shape, scale=1.0):
    return jnp.asarray(RNG.randn(*shape) * scale, jnp.bfloat16)


def stage_instance_norm():
    from unimatch_tpu.models.layers import instance_norm

    x = bf(2, 224, 512, 64)  # stage-1 backbone map (both images)
    dt1 = time_chained(instance_norm, x, n=30, min_warmup_s=5)
    dt2 = time_chained(instance_norm, x, n=30, warmup=2)
    emit(part="instance_norm_s1", ms=[round(dt1 * 1e3, 2), round(dt2 * 1e3, 2)])


def stage_backbone():
    """Fused conv+IN+relu (round-3 candidate) vs split form, interleaved A/B."""
    from unimatch_tpu.models.backbone import CNNEncoder

    enc = CNNEncoder(output_dim=128, num_output_scales=2)
    x = bf(2, 448, 1024, 3, scale=50.0)
    params = enc.init(jax.random.PRNGKey(0), x)
    params = jax.tree.map(lambda a: a.astype(jnp.bfloat16), params)

    def fwd_fused(p, x):
        return enc.apply(p, x)

    def fwd_split(p, x):
        return enc.apply(p, x)

    res = {"fused": [], "split": []}
    for rep in range(3):
        os.environ["UNIMATCH_FUSE_IN"] = "1"
        res["fused"].append(round(time_chained(fwd_fused, params, x, n=20,
                                               min_warmup_s=5 if rep == 0 else 0) * 1e3, 2))
        os.environ["UNIMATCH_FUSE_IN"] = "0"
        res["split"].append(round(time_chained(fwd_split, params, x, n=20,
                                               min_warmup_s=5 if rep == 0 else 0) * 1e3, 2))
    os.environ["UNIMATCH_FUSE_IN"] = "1"
    emit(part="backbone_ab", **res)


def stage_local_corr_prop_s1():
    from unimatch_tpu.ops import correlation as C
    from unimatch_tpu.models.propagation import SelfAttnPropagation

    f0 = bf(1, 112, 256, 128)
    f1 = bf(1, 112, 256, 128)
    flow = bf(1, 112, 256, 2, scale=5.0)

    def corr(a, b):
        return C.local_correlation_softmax(a, b, 4)[0]

    dt1 = time_chained(corr, f0, f1, n=20, min_warmup_s=5)
    dt2 = time_chained(corr, f0, f1, n=20, warmup=2)
    emit(part="local_corr_s1", ms=[round(dt1 * 1e3, 2), round(dt2 * 1e3, 2)])

    prop = SelfAttnPropagation()
    params = prop.init(
        jax.random.PRNGKey(0), f0, flow, local_window_attn=True, local_window_radius=1
    )
    params = jax.tree.map(lambda a: a.astype(jnp.bfloat16), params)

    def pr(p, feat, fl):
        return prop.apply(p, feat, fl, local_window_attn=True, local_window_radius=1)

    dt1 = time_chained(pr, params, f0, flow, n=20, warmup=2)
    dt2 = time_chained(pr, params, f0, flow, n=20, warmup=2)
    emit(part="prop_s1", ms=[round(dt1 * 1e3, 2), round(dt2 * 1e3, 2)])


def stage_transformer_s1():
    from unimatch_tpu.models.transformer import FeatureTransformer

    tr = FeatureTransformer(num_layers=6, d_model=128, ffn_dim_expansion=4)
    f0 = bf(1, 112, 256, 128)
    f1 = bf(1, 112, 256, 128)
    params = tr.init(jax.random.PRNGKey(0), f0, f1, attn_type="swin", attn_num_splits=8)
    params = jax.tree.map(lambda a: a.astype(jnp.bfloat16), params)

    def fwd(p, a, b):
        return tr.apply(p, a, b, attn_type="swin", attn_num_splits=8)

    dt1 = time_chained(fwd, params, f0, f1, n=20, min_warmup_s=5)
    dt2 = time_chained(fwd, params, f0, f1, n=20, warmup=2)
    emit(part="transformer_s1", ms=[round(dt1 * 1e3, 2), round(dt2 * 1e3, 2)])


def stage_refine_net():
    """BasicUpdateBlock (motion encoder + GRU + heads) alone, x1 and x6."""
    from unimatch_tpu.models.reg_refine import BasicUpdateBlock

    blk = BasicUpdateBlock(downsample_factor=4, flow_dim=2, bilinear_up=False)
    net = bf(1, 112, 256, 128)
    inp = bf(1, 112, 256, 128)
    corr = bf(1, 112, 256, 81)
    flow = bf(1, 112, 256, 2)
    params = blk.init(jax.random.PRNGKey(0), net, inp, corr, flow)
    params = jax.tree.map(lambda a: a.astype(jnp.bfloat16), params)

    def fwd1(p, net, inp, corr, flow):
        return blk.apply(p, net, inp, corr, flow)

    def fwd6(p, net, inp, corr, flow):
        # mask consumed only at the final iteration, matching inference (the
        # assembly discards it earlier, so XLA DCEs 5 of 6 mask heads)
        f = flow
        mask = None
        for _ in range(6):
            _, mask, delta = blk.apply(p, net, inp, corr, f)
            f = f + delta
        return f, mask.astype(jnp.float32).sum()

    def fwd1b(p, net, inp, corr, flow):
        return blk.apply(p, net, inp, corr, flow)

    def fwd6b(p, net, inp, corr, flow):
        f = flow
        mask = None
        for _ in range(6):
            _, mask, delta = blk.apply(p, net, inp, corr, f)
            f = f + delta
        return f, mask.astype(jnp.float32).sum()

    res = {}
    for rep in range(2):
        os.environ["UNIMATCH_FUSE_CONV"] = "1"
        res.setdefault("fused_x1", []).append(
            round(time_chained(fwd1, params, net, inp, corr, flow, n=20,
                               min_warmup_s=5 if rep == 0 else 0) * 1e3, 2))
        res.setdefault("fused_x6", []).append(
            round(time_chained(fwd6, params, net, inp, corr, flow, n=10, warmup=2) * 1e3, 2))
        os.environ["UNIMATCH_FUSE_CONV"] = "0"
        res.setdefault("xla_x1", []).append(
            round(time_chained(fwd1b, params, net, inp, corr, flow, n=20, warmup=2) * 1e3, 2))
        res.setdefault("xla_x6", []).append(
            round(time_chained(fwd6b, params, net, inp, corr, flow, n=10, warmup=2) * 1e3, 2))
    os.environ["UNIMATCH_FUSE_CONV"] = "1"

    # numeric sanity: fused vs XLA refine block
    os.environ["UNIMATCH_FUSE_CONV"] = "1"
    a = jax.jit(lambda: blk.apply(params, net, inp, corr, flow)[2])()
    os.environ["UNIMATCH_FUSE_CONV"] = "0"
    b = jax.jit(lambda: blk.apply(params, net, inp, corr, flow)[2])()
    os.environ["UNIMATCH_FUSE_CONV"] = "1"
    dmax = float(jnp.abs(a.astype(jnp.float32) - b.astype(jnp.float32)).max())
    amax = float(jnp.abs(b.astype(jnp.float32)).max())
    emit(part="refine_net_ab", **res, delta_parity_max_abs=dmax, ref_absmax=amax)


def stage_fused_conv_shapes():
    """Isolated fused-vs-XLA conv A/B at the refine hot shapes."""
    from unimatch_tpu.kernels.conv_fused import fused_conv2d
    from unimatch_tpu.models.layers import conv_via_matmul

    shapes = [
        ("convc2_3x3_256_192", [(1, 112, 256, 256)], (3, 3), 192),
        ("convf1_7x7_2_128", [(1, 112, 256, 2)], (7, 7), 128),
        ("gru_x_1x5_256_384", [(1, 112, 256, 128), (1, 112, 256, 126), (1, 112, 256, 2)], (1, 5), 384),
        ("gru_h_5x1_128_256", [(1, 112, 256, 128)], (5, 1), 256),
        ("flowhead1_3x3_128_256", [(1, 112, 256, 128)], (3, 3), 256),
    ]
    for name, part_shapes, (kh, kw), cout in shapes:
        parts = [bf(*s) for s in part_shapes]
        cin = sum(s[-1] for s in part_shapes)
        k = bf(kh, kw, cin, cout, scale=0.05)
        bias = bf(cout)

        def xla_fn(ps, kk, bb, kh=kh, kw=kw):
            acc = None
            off = 0
            for p in ps:
                ci = p.shape[-1]
                y = conv_via_matmul(p, kk[:, :, off : off + ci, :], (1, 1),
                                    ((kh - 1) // 2, (kw - 1) // 2))
                acc = y if acc is None else acc + y
                off += ci
            return jnp.maximum(acc + bb, 0)

        def pl_fn(ps, kk, bb):
            return fused_conv2d(list(ps), kk, bb, act="relu")

        dt_p = time_chained(pl_fn, tuple(parts), k, bias, n=30, min_warmup_s=3)
        dt_x = time_chained(xla_fn, tuple(parts), k, bias, n=30, warmup=2)
        dt_p2 = time_chained(pl_fn, tuple(parts), k, bias, n=30, warmup=2)
        a = jax.jit(pl_fn)(tuple(parts), k, bias)
        b = jax.jit(xla_fn)(tuple(parts), k, bias)
        d = float(jnp.abs(a.astype(jnp.float32) - b.astype(jnp.float32)).max())
        emit(part=f"conv_ab_{name}", pallas_ms=[round(dt_p * 1e3, 2), round(dt_p2 * 1e3, 2)],
             xla_ms=round(dt_x * 1e3, 2), max_abs_diff=d)


def stage_upsample():
    from unimatch_tpu.ops.upsample import upsample_with_mask

    flow = bf(1, 112, 256, 2, scale=5.0)
    mask = bf(1, 112, 256, 9 * 16)

    def fwd(f, m):
        return upsample_with_mask(f, m, 4, is_depth=False)

    dt1 = time_chained(fwd, flow, mask, n=30, min_warmup_s=5)
    dt2 = time_chained(fwd, flow, mask, n=30, warmup=2)
    emit(part="upsample", ms=[round(dt1 * 1e3, 2), round(dt2 * 1e3, 2)])


def stage_global_s0():
    from unimatch_tpu.ops import correlation as C

    f0 = bf(1, 56, 128, 128)
    f1 = bf(1, 56, 128, 128)

    def fwd(a, b):
        return C.global_correlation_softmax(a, b)[0]

    dt1 = time_chained(fwd, f0, f1, n=20, min_warmup_s=5)
    dt2 = time_chained(fwd, f0, f1, n=20, warmup=2)
    emit(part="global_corr_s0", ms=[round(dt1 * 1e3, 2), round(dt2 * 1e3, 2)])


if __name__ == "__main__":
    emit(part="session", backend=jax.default_backend(), start=time.strftime("%H:%M:%S"))
    guarded(stage_fused_conv_shapes)
    guarded(stage_backbone)
    guarded(stage_refine_net)
    guarded(stage_upsample)
    guarded(stage_local_corr_prop_s1)
    guarded(stage_global_s0)
    guarded(stage_transformer_s1)
    guarded(stage_instance_norm)
    emit(part="session", status="complete", end=time.strftime("%H:%M:%S"))
