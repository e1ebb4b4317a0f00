#!/usr/bin/env python
"""Stem GEMM gap attack (VERDICT r3 #5): close or bound the 3.07-vs-~1.0 ms gap.

Post patch-major, the int8 stem GEMM ((M=frames·196, K=768) × (768, 256)) runs
at ~52% of int8 peak while the residual stages run at 88-103% of floor.  Round-3
facts that shape this sweep (outputs/r3q/stem_gemm3.json @4096 frames):
  - f32-out (822 MB write) costs the SAME as int8-out (205 MB): not output-bound
  - reshaping the 4D input to 2D before the dot makes it 2.4× SLOWER (8.25 ms)
  - the pre-centered wire (no byte map at all) is still 3.07 ms
So the dot itself underperforms.  The residual stages' int8 path uses XLA's
CONV emitter (``ops/quant.int8_conv``) and hits floor — the leading hypothesis
is that the conv emitter's int8 tiling beats the dot emitter's at these shapes.

Variants (all bit-exactness-checked against g0 where applicable):
  g0_dot4d      centered int8 4D dot → int32 → >>8 int8 (current best floor probe)
  g1_bf16       same GEMM with bf16 operands/f32 acc (is int8 even winning?)
  g2_ksplit     K split 768 = 2×384, two dots accumulated in int32
  g3_scan       lax.scan over 8 M-chunks (VMEM working-set/pipelining probe)
  g4_conv1x1    the SAME GEMM phrased as a 1×1 int8 conv (the emitter the
                residual stages use)
  g5_conv_ship  g4 + the shipped epilogue (scale/bias/relu/quantize) fused
  g6_dot_ship   shipped stem_gemm_u8 fused epilogue (round-3 baseline, q8 out)
  g7_n512       N=512 control (does wider N lift MXU efficiency?)

Run ON the TPU:  python scripts/perf_stem_gemm4.py [frames=4096]
Output: markdown table (stderr) + one JSON line (stdout).
"""
import json
import sys
import time
from functools import partial
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

MXU_INT8 = 394e12
HBM_BW = 819e9


def log(m):
    print(m, file=sys.stderr, flush=True)


def _time_variant(name, fwd, x0, iters=12):
    """Chained-loop step time, stem_gemm3's exact methodology: the carry adds a
    runtime-0 (unfoldable) delta to the big operand each iteration, so the loop
    cannot be hoisted — at the cost of one elementwise pass over the operand per
    step.  ``g_null`` measures that tax so variants can be reported net of it."""
    import jax
    import jax.numpy as jnp
    from jax import lax

    @partial(jax.jit, static_argnames=("it",))
    def run(x, it):
        def body(i, carry):
            cur, acc = carry
            out = fwd(cur)
            delta = jnp.sum(out.astype(jnp.float32)) * 1e-20
            return cur + delta.astype(cur.dtype), acc + delta

        _, acc = lax.fori_loop(0, it, body, (x, jnp.float32(0)))
        return acc

    def t(k):
        t0 = time.perf_counter()
        _ = float(np.asarray(run(x0, k)))
        return time.perf_counter() - t0

    t(1); t(iters)
    trials = [(t(iters) - t(1)) / (iters - 1) for _ in range(3)]
    ms = float(np.median(trials)) * 1e3
    log(f"{name}: {ms:.3f} ms")
    return ms


def main():
    import jax
    import jax.numpy as jnp

    from tpuhar.ops.stem import stem_gemm_u8

    frames_n = int(sys.argv[1]) if len(sys.argv) > 1 else 4096
    npr = np.random.default_rng(0)
    K, c0, Hp, Wp = 768, 256, 14, 14
    M = frames_n * Hp * Wp

    col_u8_h = (npr.random((frames_n, Hp, Wp, K)) * 255).astype(np.uint8)
    col_c_h = np.clip(col_u8_h.astype(np.int16) - 128, -127, 127).astype(np.int8)
    col = jax.device_put(col_u8_h)
    col_c = jax.device_put(col_c_h)
    w_i8_h = np.clip(npr.normal(0, 40, (K, c0)), -127, 127).astype(np.int8)
    w_i8 = jax.device_put(w_i8_h)
    w512 = jax.device_put(
        np.clip(npr.normal(0, 40, (K, 512)), -127, 127).astype(np.int8)
    )
    scale = jnp.asarray(npr.random(c0).astype(np.float32) * 1e-2)
    bias = jnp.asarray(npr.normal(0, 0.1, c0).astype(np.float32))
    site = 0.05

    def g0_dot4d(x):
        acc = jax.lax.dot_general(
            x, w_i8, (((3,), (0,)), ((), ())), preferred_element_type=jnp.int32
        )
        return (acc >> 8).astype(jnp.int8)

    def g1_bf16(x):
        acc = jax.lax.dot_general(
            x.astype(jnp.bfloat16), w_i8.astype(jnp.bfloat16),
            (((3,), (0,)), ((), ())), preferred_element_type=jnp.float32,
        )
        return (acc * (1.0 / 256.0)).astype(jnp.bfloat16)

    def g2_ksplit(x):
        xa, xb = x[..., : K // 2], x[..., K // 2:]
        wa, wb = w_i8[: K // 2], w_i8[K // 2:]
        acc = jax.lax.dot_general(
            xa, wa, (((3,), (0,)), ((), ())), preferred_element_type=jnp.int32
        ) + jax.lax.dot_general(
            xb, wb, (((3,), (0,)), ((), ())), preferred_element_type=jnp.int32
        )
        return (acc >> 8).astype(jnp.int8)

    def g3_scan(x):
        chunks = x.reshape(8, frames_n // 8, Hp, Wp, K)

        def body(_, xc):
            acc = jax.lax.dot_general(
                xc, w_i8, (((3,), (0,)), ((), ())),
                preferred_element_type=jnp.int32,
            )
            return None, (acc >> 8).astype(jnp.int8)

        _, out = jax.lax.scan(body, None, chunks)
        return out.reshape(frames_n, Hp, Wp, c0)

    def g4_conv1x1(x):
        acc = jax.lax.conv_general_dilated(
            x.reshape(frames_n, Hp * Wp, 1, K),
            w_i8.reshape(1, 1, K, c0),
            (1, 1), "VALID",
            dimension_numbers=jax.lax.conv_dimension_numbers(
                (frames_n, Hp * Wp, 1, K), (1, 1, K, c0), ("NHWC", "HWIO", "NHWC")
            ),
            preferred_element_type=jnp.int32,
        )
        return (acc >> 8).astype(jnp.int8).reshape(frames_n, Hp, Wp, c0)

    def g5_conv_ship(x):
        acc = jax.lax.conv_general_dilated(
            x.reshape(frames_n, Hp * Wp, 1, K),
            w_i8.reshape(1, 1, K, c0),
            (1, 1), "VALID",
            dimension_numbers=jax.lax.conv_dimension_numbers(
                (frames_n, Hp * Wp, 1, K), (1, 1, K, c0), ("NHWC", "HWIO", "NHWC")
            ),
            preferred_element_type=jnp.int32,
        ).reshape(frames_n, Hp, Wp, c0)
        y = acc.astype(jnp.float32) * scale + bias
        y = jnp.maximum(y, 0.0)
        return jnp.clip(jnp.round(y / site), -127, 127).astype(jnp.int8)

    def g6_dot_ship(x):
        return stem_gemm_u8(
            x, w_i8, scale, bias, sub=128, clip_lo=-127, relu=True,
            out_scale=site, out_dtype=jnp.int8,
        )

    def g7_n512(x):
        acc = jax.lax.dot_general(
            x, w512, (((3,), (0,)), ((), ())), preferred_element_type=jnp.int32
        )
        return (acc >> 8).astype(jnp.int8)

    def g_null(x):
        # near-zero work: isolates the chained-loop dependence tax (the
        # carry-add pass over the 616 MB operand) shared by every variant —
        # including bench.py's jnp.roll, so the serving engine's real step may
        # be ~this much faster than any chained-loop number reports
        return x[:1, :1, :1, :128]

    variants = {
        "g_null": (g_null, col_c),
        "g0_dot4d": (g0_dot4d, col_c),
        "g1_bf16": (g1_bf16, col_c),
        "g2_ksplit": (g2_ksplit, col_c),
        "g3_scan": (g3_scan, col_c),
        "g4_conv1x1": (g4_conv1x1, col_c),
        "g5_conv_ship": (g5_conv_ship, col_c),
        "g6_dot_ship": (g6_dot_ship, col),
        "g7_n512": (g7_n512, col_c),
    }

    # full-shape exactness: g4 vs g0
    ya = np.asarray(jax.jit(g0_dot4d)(col_c))
    yb = np.asarray(jax.jit(g4_conv1x1)(col_c))
    assert np.array_equal(ya, yb), "conv1x1 formulation diverges from dot!"
    log("exactness: g4_conv1x1 == g0_dot4d bit-exact OK")

    results = {}
    for name, (fwd, x0) in variants.items():
        results[name] = round(_time_variant(name, fwd, x0), 3)

    flops = 2 * M * K * c0
    in_b, out_b = M * K, M * c0
    floor_ms = max(flops / MXU_INT8, (in_b + out_b) / HBM_BW) * 1e3
    null = results.get("g_null", 0.0)
    log(f"\nfloor (int8 compute {flops / MXU_INT8 * 1e3:.2f} / "
        f"hbm {(in_b + out_b) / HBM_BW * 1e3:.2f}) = {floor_ms:.2f} ms; "
        f"loop-dependence tax = {null:.2f} ms")
    log("| variant | ms | net of tax | x floor (net) |")
    log("|---|---|---|---|")
    for k, v in results.items():
        net = v - null if k != "g_null" else v
        log(f"| {k} | {v:.3f} | {net:.3f} | {net / floor_ms:.2f} |")

    print(json.dumps({
        "bench": "stem_gemm4", "frames": frames_n,
        "floor_ms": round(floor_ms, 3), "null_ms": null, "ms": results,
    }))


if __name__ == "__main__":
    main()
