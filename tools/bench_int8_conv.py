#!/usr/bin/env python
"""Measure the last unmeasured roofline lever (VERDICT r4 next #2b): int8
convolutions on the UNet's conv bucket.

Context: the UNet forward's conv(+fused GN stats) bucket is ~26% of traced
device time (BENCHMARKS.md "Where every millisecond goes") and already runs
at ~MXU bf16 peak. The v5e int8 MXU is 2x bf16 — and unlike the d=8
attention contractions (where int8 measured ~neutral because the pad wastes
passes, not element rate), conv contractions have K = 9*C >= 1152 real
elements, so the int8 2x packs real work. The open question this tool
answers on hardware: does a *practical* int8 path (per-output-channel
weight scales + dynamic per-tensor activation quantization, int32
accumulate, bf16 dequant) beat the bf16 conv end-to-end once the
quantize/dequantize traffic is paid?

Times, for each of the flagship UNet's real conv shapes (NHWC b32, 3x3,
rangeldm_kitti360 levels 16x256/8x128/4x64 at C 128/256):
  * bf16: conv_general_dilated in bfloat16 (the shipped path)
  * int8: quantize-act -> int8 conv (int32 accum) -> dequant

Prints one JSON line with per-shape ms and the conv-bucket implication.
Run on the TPU; CPU has no int8 MXU so the comparison is meaningless there
(the tool refuses unless FORCE_CPU=1).
"""

import json
import os
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

# (N, H, W, Cin, Cout) — the flagship UNet's conv population by level
# (models/zoo.py rangeldm_kitti360: blocks (128,128,256,256) over
# 16x256 -> 8x128 -> 4x64 -> 2x32)
SHAPES = [
    (32, 16, 256, 128, 128),
    (32, 8, 128, 128, 128),
    (32, 8, 128, 128, 256),
    (32, 4, 64, 256, 256),
    (32, 2, 32, 256, 256),
]
DN = ("NHWC", "HWIO", "NHWC")


def conv_bf16(x, w):
    return lax.conv_general_dilated(x, w, (1, 1), "SAME",
                                    dimension_numbers=DN)


def conv_int8(x, w_i8, w_scale):
    # dynamic per-tensor activation scale + static per-output-channel
    # weight scales: the standard production recipe (no calibration pass)
    a = jnp.max(jnp.abs(x)).astype(jnp.float32) / 127.0
    x_i8 = jnp.clip(jnp.round(x.astype(jnp.float32) / a),
                    -127, 127).astype(jnp.int8)
    y = lax.conv_general_dilated(x_i8, w_i8, (1, 1), "SAME",
                                 dimension_numbers=DN,
                                 preferred_element_type=jnp.int32)
    return (y.astype(jnp.float32) * (a * w_scale)).astype(jnp.bfloat16)


def _fetch(x):
    np.asarray(jnp.ravel(x)[:1])


K = int(os.environ.get("BENCH_INT8_CHAIN", "50"))   # convs per jitted scan


def chain_ms(step, x, rounds=3, calls=2):
    """Per-conv device ms: K conv applications chained inside ONE jitted
    lax.scan — a per-call host->tunnel dispatch is ~1.7 ms here, far above
    a single conv's device time, so per-call timing measures the tunnel,
    not the MXU. Magnitude is renormalized each application so a 50-deep
    chain neither explodes nor denormal-underflows."""

    def body(x, _):
        y = step(x)
        y = y * lax.rsqrt(jnp.mean(jnp.square(
            y.astype(jnp.float32))) + 1e-12).astype(y.dtype)
        return y, ()

    @jax.jit
    def run(x):
        y, _ = lax.scan(body, x, None, length=K)
        return y

    _fetch(run(x))                     # compile+warm
    best = None
    for _ in range(rounds):
        t0 = time.perf_counter()
        out = None
        for _ in range(calls):
            out = run(x)
        _fetch(out)
        dt = (time.perf_counter() - t0) / (calls * K) * 1e3
        best = dt if best is None else min(best, dt)
    return best


def main():
    if jax.devices()[0].platform != "tpu" and not os.environ.get("FORCE_CPU"):
        print(json.dumps({"error": "needs a TPU (int8 MXU); FORCE_CPU=1 to "
                                   "run anyway"}))
        return 1
    rng = np.random.default_rng(0)
    rows = []
    for (n, h, w, ci, co) in SHAPES:
        x = jnp.asarray(rng.standard_normal((n, h, w, ci)), jnp.bfloat16)

        def make_weights(cin, cout):
            wgt = jnp.asarray(rng.standard_normal((3, 3, cin, cout)) * 0.05,
                              jnp.bfloat16)
            w_scale = jnp.max(jnp.abs(wgt.astype(jnp.float32)),
                              axis=(0, 1, 2)) / 127.0
            w_i8 = jnp.clip(jnp.round(wgt.astype(jnp.float32) / w_scale),
                            -127, 127).astype(jnp.int8)
            return wgt, w_i8, w_scale

        w1, w1_i8, w1_s = make_weights(ci, co)
        if ci == co:
            convs_per_step = 1
            step16 = lambda x: conv_bf16(x, w1)                  # noqa: E731
            step8 = lambda x: conv_int8(x, w1_i8, w1_s)          # noqa: E731
        else:
            # channel-changing conv: pair it with its mirror so the scan
            # carry keeps a fixed shape; report per-conv = per-pair / 2
            w2, w2_i8, w2_s = make_weights(co, ci)
            convs_per_step = 2
            step16 = lambda x: conv_bf16(conv_bf16(x, w1), w2)   # noqa: E731
            step8 = lambda x: conv_int8(                         # noqa: E731
                conv_int8(x, w1_i8, w1_s), w2_i8, w2_s)

        ms16 = chain_ms(step16, x) / convs_per_step
        ms8 = chain_ms(step8, x) / convs_per_step
        # numeric sanity: int8 within quantization noise of bf16 (single
        # application, outside the timing chain)
        y8 = conv_int8(x, w1_i8, w1_s).astype(jnp.float32)
        y16 = conv_bf16(x, w1).astype(jnp.float32)
        err = float(jnp.mean(jnp.abs(y8 - y16)))
        ref = float(jnp.mean(jnp.abs(y16)))
        gflop = 2 * n * h * w * 9 * ci * co / 1e9
        rows.append({"shape": [n, h, w, ci, co],
                     "bf16_ms": round(ms16, 4), "int8_ms": round(ms8, 4),
                     "speedup": round(ms16 / ms8, 3),
                     "bf16_tflops": round(gflop / ms16, 1),
                     "int8_tflops": round(gflop / ms8, 1),
                     "rel_err": round(err / max(ref, 1e-9), 4)})
        print(f"[int8] {rows[-1]}", file=sys.stderr)

    tot16 = sum(r["bf16_ms"] for r in rows)
    tot8 = sum(r["int8_ms"] for r in rows)
    print(json.dumps({
        "rows": rows,
        "bucket_bf16_ms": round(tot16, 3),
        "bucket_int8_ms": round(tot8, 3),
        "bucket_speedup": round(tot16 / tot8, 3),
        "note": "conv bucket is ~26% of the UNet forward; a bucket speedup "
                "of S implies a UNet-forward saving of 0.26*(1-1/S)",
    }))
    return 0


if __name__ == "__main__":
    sys.exit(main())
