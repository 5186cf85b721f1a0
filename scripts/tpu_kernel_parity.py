"""On-TPU Pallas kernel parity: compare Mosaic-compiled kernels against their
pure-jnp twins AND an fp64 numpy ground truth on the real chip, at the
flagship bench shapes.

Interpret-mode tests (tests/test_pallas_kernels.py) validate kernel *logic*;
this script validates the Mosaic *lowering* on real hardware. Both the Pallas
kernel and the jnp twin run matmuls on the MXU (which uses bf16 passes for
fp32 inputs at default precision), so each is compared against an fp64 numpy
reference: the kernel passes if its error is within 2x the twin's error
(plus a small floor) — i.e. the lowering adds no error beyond what XLA's own
MXU matmuls incur. Run manually on a TPU host:

    python scripts/tpu_kernel_parity.py

and commit the printed table to docs/TPU_KERNEL_PARITY.md. Shapes cover the
448x1024 bench resolution: scale-0 tokens L = 56*128 = 7168 (the shape where
the fixed block_q=512 used to overflow the VMEM budget and fall back), and
the scale-1 window-attention shape.
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp


def _softmax_np64(scores):
    m = scores.max(-1, keepdims=True)
    p = np.exp(scores - m)
    return p / p.sum(-1, keepdims=True)


def _err(a, truth):
    return float(np.max(np.abs(np.asarray(a, np.float64) - truth)))


def check_attention_expectation(results):
    from unimatch_tpu.kernels.attention_expectation import attention_expectation

    rng = np.random.RandomState(0)
    # (L, C, V): scale-0 bench shape 56x128=7168 tokens (block_q auto-halves
    # to 256 here); a small-L shape that keeps block_q=512; an odd L to
    # exercise key-padding masking.
    for l, note in [(7168, "bench 448x1024 scale-0 (block_q->256)"),
                    (3584, "half bench (block_q=512)"),
                    (1000, "non-multiple-of-512 L (pad masking)")]:
        for dtype in (jnp.float32, jnp.bfloat16):
            qn = rng.randn(1, l, 128) * 2
            kn = rng.randn(1, l, 128) * 2
            vn = rng.randn(1, l, 2)
            q, k, v = (jnp.asarray(x, dtype) for x in (qn, kn, vn))
            # ground truth from the dtype-rounded inputs, in fp64
            q64, k64, v64 = (np.asarray(x, np.float64) for x in (q, k, v))
            prob = _softmax_np64(np.einsum("blc,bmc->blm", q64, k64) / np.sqrt(128.0))
            truth = np.einsum("blm,bmv->blv", prob, v64)

            out = attention_expectation(q, k, v)
            scores = jnp.einsum("blc,bmc->blm", q, k,
                                preferred_element_type=jnp.float32) / np.sqrt(128.0)
            twin = jnp.einsum("blm,bmv->blv", jax.nn.softmax(scores, axis=-1),
                              v.astype(jnp.float32))

            ek, et = _err(out, truth), _err(twin, truth)
            results.append(("attention_expectation", f"L={l} {dtype.__name__}",
                            note, ek, et))


def check_window_attention(results):
    from unimatch_tpu.kernels.window_attention import window_attention

    rng = np.random.RandomState(1)
    # bench scale-1: 112x256 at attn_splits=8 -> 64 windows of 14x32=448
    # tokens per image; and the scale-0 split-2 shape: 4 windows of 28x64
    for nw, wl, note in [(2 * 64, 14 * 32, "bench scale-1 swin windows"),
                         (2 * 4, 28 * 64, "bench scale-0 split-2 windows")]:
        for dtype in (jnp.float32, jnp.bfloat16):
            q = jnp.asarray(rng.randn(nw, wl, 128), dtype)
            k = jnp.asarray(rng.randn(nw, wl, 128), dtype)
            v = jnp.asarray(rng.randn(nw, wl, 128), dtype)
            mask = jnp.asarray(rng.rand(nw // 2, wl, wl) > 0.9, jnp.float32) * (-100.0)

            for m in (None, mask):
                q64, k64, v64 = (np.asarray(x, np.float64) for x in (q, k, v))
                s64 = np.einsum("nlc,nmc->nlm", q64, k64) / np.sqrt(128.0)
                if m is not None:
                    s64 = s64 + np.tile(np.asarray(m, np.float64), (nw // m.shape[0], 1, 1))
                truth = np.einsum("nlm,nmc->nlc",
                                  _softmax_np64(s64).astype(np.float64
                                  if dtype == jnp.float32 else np.float32), v64)

                out = window_attention(q, k, v, bias=m)
                scores = jnp.einsum("nlc,nmc->nlm", q, k,
                                    preferred_element_type=jnp.float32) / np.sqrt(128.0)
                if m is not None:
                    scores = scores + jnp.tile(m, (nw // m.shape[0], 1, 1))
                p = jax.nn.softmax(scores, axis=-1)
                twin = jnp.einsum("nlm,nmc->nlc", p.astype(v.dtype), v)

                ek, et = _err(out, truth), _err(twin, truth)
                results.append(("window_attention",
                                f"{nw}x{wl} {dtype.__name__} mask={m is not None}",
                                note, ek, et))


def check_swin_spatial(results):
    """Fused spatial layer kernel (projection + window attention + merge +
    LayerNorm [+ residual]) vs fp64 ground truth of the same math."""
    from unimatch_tpu.kernels.window_attention import (
        _swin_spatial_impl, _swin_spatial_reference,
    )
    from unimatch_tpu.ops import windows as W

    rng = np.random.RandomState(2)
    # bench scale-1 (112x256, splits 8 -> 14x32 single-block windows) and
    # scale-0 (56x128, splits 2 -> 28x64=1792 row-sub-blocked windows)
    for h, w, ns, note in [(112, 256, 8, "bench scale-1 single-block"),
                           (56, 128, 2, "bench scale-0 row-sub-blocked")]:
        for dtype in (jnp.float32, jnp.bfloat16):
            for cross in (False, True):
                c = 128
                src = jnp.asarray(rng.randn(2, h, w, c) * 0.5, dtype)
                tgt = jnp.asarray(rng.randn(2, h, w, c) * 0.5, dtype)
                wqkv = jnp.asarray(rng.randn(c, 3 * c) * 0.08, dtype)
                wm = jnp.asarray(rng.randn(c, c) * 0.08, dtype)
                gamma = jnp.asarray(rng.rand(c) + 0.5, jnp.float32)
                beta = jnp.asarray(rng.randn(c) * 0.1, jnp.float32)
                fuse_res = not cross
                if cross:
                    args = (src, tgt, wqkv[:, :c], wqkv[:, c:], None, wm, gamma, beta, ns)
                else:
                    args = (src, None, wqkv, None, None, wm, gamma, beta, ns)

                # fp64 ground truth from dtype-rounded inputs
                s64 = np.asarray(src, np.float64)
                t64 = np.asarray(tgt if cross else src, np.float64)
                w64 = np.asarray(wqkv, np.float64)
                q64 = s64 @ w64[:, :c]
                k64 = t64 @ w64[:, c : 2 * c]
                v64 = t64 @ w64[:, 2 * c :]

                def win64(x):
                    b = x.shape[0]
                    return np.asarray(
                        W.split_feature(jnp.asarray(x), ns)
                    ).reshape(b * ns * ns, (h // ns) * (w // ns), c)

                qs, ks, vs = win64(q64), win64(k64), win64(v64)
                sc = np.einsum("nlc,nmc->nlm", qs, ks) / np.sqrt(float(c))
                o = np.einsum("nlm,nmc->nlc", _softmax_np64(sc), vs)
                o = np.asarray(
                    W.merge_splits(jnp.asarray(o.reshape(-1, h // ns, w // ns, c)), ns)
                )
                y = o @ np.asarray(wm, np.float64)
                mean = y.mean(-1, keepdims=True)
                var = ((y - mean) ** 2).mean(-1, keepdims=True)
                y = (y - mean) / np.sqrt(var + 1e-5)
                truth = y * np.asarray(gamma, np.float64) + np.asarray(beta, np.float64)
                if fuse_res:
                    truth = truth + s64

                out = _swin_spatial_impl(*args, fuse_res=fuse_res)
                twin = _swin_spatial_reference(*args, fuse_res=fuse_res)
                ek, et = _err(out, truth), _err(twin, truth)
                results.append(("swin_spatial_layer",
                                f"{h}x{w} ns={ns} {dtype.__name__} cross={cross}",
                                note, ek, et))


def main():
    assert jax.default_backend() == "tpu", f"needs a TPU, got {jax.default_backend()}"
    dev = jax.devices()[0]
    results = []
    check_attention_expectation(results)
    check_window_attention(results)
    check_swin_spatial(results)

    print(f"\n# On-TPU Pallas kernel parity ({dev.device_kind})\n")
    print("Errors are max-abs vs fp64 numpy ground truth; 'ok' = kernel error")
    print("<= 2x the jnp twin's error + 1e-6 (lowering adds no extra error).\n")
    print("| kernel | shape | note | kernel err | jnp twin err | ok |")
    print("|---|---|---|---|---|---|")
    ok_all = True
    for kernel, shape, note, ek, et in results:
        ok = ek <= 2.0 * et + 1e-6
        ok_all &= ok
        print(f"| {kernel} | {shape} | {note} | {ek:.2e} | {et:.2e} | {'yes' if ok else 'NO'} |")
    print(f"\nall pass: {ok_all}")
    sys.exit(0 if ok_all else 1)


if __name__ == "__main__":
    main()
