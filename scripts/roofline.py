"""Analytic bytes/FLOP roofline for the flagship forward (VERDICT r4 #8).

Computes, per stage of GMFlow-scale2-regrefine6 448x1024 bs1 bf16, the
minimum HBM bytes that must move (reads of live inputs + writes of live
outputs, assuming perfect fusion inside the stage) and the MXU FLOPs, and
converts both to a ms lower bound at the v5e peaks. Printed next to the
measured ms (pass measurements as JSON via --measured or edit MEASURED),
it makes "this stage is at the bound" claims checkable arithmetic.

v5e peaks used: 819 GB/s HBM, 197 TFLOP/s bf16 MXU. Sustained stream rate
observed through the relay is ~300 GB/s for large regular reads/writes and
~43 GB/s for row gathers (docs/PERF_NOTES.md HBM cost curve) — both are
ALSO printed as "realistic" bounds since no kernel on this chip has
exceeded them.

Run: python scripts/roofline.py  (pure arithmetic, no jax)
"""

import json
import sys

GBs = 1e9
HBM_PEAK = 819e9
HBM_STREAM = 300e9  # best sustained large-block rate measured on this chip
HBM_GATHER = 43e9   # peak row-gather rate measured (CLAUDE.md cost curve)
MXU = 197e12

B = 1
H, W = 448, 1024
H1, W1 = H // 4, W // 4     # s1 refine scale: 112 x 256
H0, W0 = H // 8, W // 8     # s0 global-matching scale: 56 x 128
P1 = H1 * W1                # 28672
P0 = H0 * W0                # 7168
C = 128
BF = 2                      # bf16 bytes
F32 = 4


def conv_cost(px, cin, cout, k=3, both_images=False):
    """One conv's min bytes (read in, write out) + MXU FLOPs."""
    n = 2 if both_images else 1
    bytes_ = n * px * (cin + cout) * BF
    flops = n * px * k * k * cin * cout * 2
    return bytes_, flops


def stage(name, byts, flops, gather_bytes=0.0, note=""):
    t_hbm = byts / HBM_PEAK * 1e3
    t_stream = byts / HBM_STREAM * 1e3 + gather_bytes / HBM_GATHER * 1e3
    t_mxu = flops / MXU * 1e3
    return {
        "stage": name,
        "bytes_MB": round((byts + gather_bytes) / 1e6, 1),
        "gflop": round(flops / 1e9, 1),
        "ms_hbm_peak": round(t_hbm, 2),
        "ms_realistic": round(max(t_stream, t_mxu), 2),
        "ms_mxu": round(t_mxu, 2),
        "note": note,
    }


def build_table():
    rows = []

    # --- backbone (both images, B=2): stem + 6 residual blocks + trident
    bb_b, bb_f = 0, 0
    px_half, px_q, px_8 = (H // 2) * (W // 2), P1, P0
    b_, f_ = conv_cost(H * W, 3, 64, k=7, both_images=True)  # stem s2 (reads full res)
    bb_b, bb_f = bb_b + b_, bb_f + f_
    for px, cin, cout, n_blocks in (
        (px_half, 64, 64, 2),    # layer1: 2 blocks @ 1/2
        (px_q, 64, 96, 2),       # layer2: stride-2 entry + 1 block @ 1/4
        (px_8, 96, 128, 2),      # layer3: stride-2 entry + 1 block @ 1/8
    ):
        for i in range(n_blocks):
            ci = cin if i == 0 else cout
            for conv in range(2):
                b_, f_ = conv_cost(px, ci if conv == 0 else cout, cout,
                                   both_images=True)
                bb_b, bb_f = bb_b + b_, bb_f + f_
    b_, f_ = conv_cost(px_8 + px_q, 128, 128, both_images=True)  # trident 2 strides
    bb_b, bb_f = bb_b + b_, bb_f + f_
    rows.append(stage("backbone", bb_b, bb_f,
                      note="perfect per-block fusion; IN stats ride the conv"))

    # --- transformer s0 + s1 (6 blocks each: self-attn + cross-attn + FFN x2 images)
    for tag, p in (("transformer-s0", P0), ("transformer-s1", P1)):
        t_b = t_f = 0
        for _ in range(6):
            for _ in range(2):  # self + cross
                # qkv+out projections dominate; attention itself is windowed
                b_, f_ = conv_cost(p, C, 4 * C, k=1, both_images=True)
                t_b, t_f = t_b + b_, t_f + f_
                # swin attention: window dots (W=7x7-ish splits) ~ P * w * C * 4
                t_f += 2 * p * 64 * C * 2 * 2  # qk^T + pv, both images
            b_, f_ = conv_cost(p, 2 * C, 4 * C, k=1, both_images=True)  # FFN in (concat)
            t_b, t_f = t_b + b_, t_f + f_
            b_, f_ = conv_cost(p, 4 * C, C, k=1, both_images=True)  # FFN out
            t_b, t_f = t_b + b_, t_f + f_
        rows.append(stage(tag, t_b, t_f))

    # --- s0 global matching: corr P0xP0 + softmax + expectation
    gm_b = 2 * P0 * C * BF + P0 * 2 * BF  # features in, flow out (fused kernel)
    gm_f = P0 * P0 * C * 2 + P0 * P0 * 4
    rows.append(stage("s0 global match", gm_b, gm_f,
                      note="fused flash-style: volume never materialized"))

    # --- s1 volume build (refine): write P1 x P1 bf16 + read features
    vb_b = P1 * P1 * BF + 2 * P1 * C * BF
    vb_f = P1 * P1 * C * 2
    rows.append(stage("s1 volume build", vb_b, vb_f,
                      note="1.64 GB volume write IS the floor"))

    # --- 6 lookups: gather 4 units (512 B) per px + write corr 81ch
    lk_gather = 6 * P1 * 4 * 512
    lk_b = 6 * P1 * 81 * BF
    rows.append(stage("6 refine lookups", lk_b, 0, gather_bytes=lk_gather,
                      note="gather-rate bound (43 GB/s row-gather ceiling)"))

    # --- 6 update steps: per iter read (inp|corr|flow|net0) + write h', delta
    up_b = up_f = 0
    for _ in range(6):
        # motion: corr 81 + flow 2 -> 126+2; convs c1(1x1,81->256) c2(3x3,256->192)
        #         f1(7x7,2->128) f2(3x3,128->64) m(3x3,256->126)
        up_b += P1 * (81 + 2 + 126) * BF
        up_f += P1 * (81 * 256 + 9 * 256 * 192 + 49 * 2 * 128 + 9 * 128 * 64
                      + 9 * 256 * 126) * 2
        # gru h+v: x (256) read twice (once per direction), h read/write
        up_b += P1 * (2 * 256 + 4 * 128) * BF
        up_f += 2 * P1 * 5 * (256 * 384 + 128 * 256 + 128 * 128) * 2
        # head: h in, delta out (hidden 256 stays in VMEM when fused)
        up_b += P1 * (128 + 2) * BF
        up_f += P1 * 9 * (128 * 256 + 256 * 2) * 2
    rows.append(stage("6 update steps", up_b, up_f,
                      note="assumes x-concat and pads fused away"))

    # --- convex upsample: mask 576ch + flow, 4x4 -> full res
    ups_b = P1 * (576 + 2) * BF + H * W * 2 * BF
    rows.append(stage("convex upsample+mask head", ups_b + P1 * 256 * BF,
                      P1 * 9 * (128 * 256 + 256 * 576) * 2))

    return rows


MEASURED = {  # round-4d breakdown (docs/PERF_NOTES.md), update r5 when re-measured
    "backbone": 10.0,
    "transformer-s1": 8.3,
    "s1 volume build": 7.5,
    "6 refine lookups": 13.1,  # build+lookups 20.6 minus build
    "6 update steps": 19.0,
    "convex upsample+mask head": 2.4,
}


def main():
    rows = build_table()
    total_real = 0.0
    print(f"{'stage':28s} {'MB':>8s} {'GFLOP':>7s} {'ms@819':>7s} "
          f"{'ms@real':>8s} {'ms@MXU':>7s} {'measured':>9s}  note")
    for r in rows:
        m = MEASURED.get(r["stage"], None)
        total_real += r["ms_realistic"]
        print(f"{r['stage']:28s} {r['bytes_MB']:8.1f} {r['gflop']:7.1f} "
              f"{r['ms_hbm_peak']:7.2f} {r['ms_realistic']:8.2f} "
              f"{r['ms_mxu']:7.2f} {m if m is not None else '':>9}  {r['note']}")
    print(f"\nsum of realistic floors: {total_real:.1f} ms "
          f"(north star needs <= 40.6 ms total)")
    if "--json" in sys.argv:
        print(json.dumps(rows))


if __name__ == "__main__":
    main()
