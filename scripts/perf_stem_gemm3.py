#!/usr/bin/env python
"""Round 3 of the patch-major stem hunt, AFTER the byte-map miscompile fix.

The shipped stem (u8 max-xor-bitcast map + int8 GEMM + q8 epilogue) measures
3.45 ms @4096 frames vs a ~1.0 ms HBM floor (read 616 MB u8 + write 205 MB
int8).  Open questions this script answers on-chip:

  m0_ship       shipped stem_gemm_u8 (fixed u8-space map), q8 out
  m1_centered   pre-centered int8 wire (NO on-device map), q8 out
  m2_2d         shipped map but input reshaped (M,K) 2D before the dot
  m3_floor      centered int8 2D dot, no epilogue (pure GEMM+write floor)
  m4_f32out     shipped map, f32 out (isolate the requant epilogue)

plus the decision-level A/B on the FULL int8-resident tower:

  t_u8          quant_tpucnn_forward_resident, uint8 patch-major wire
  t_centered    same tree, centered int8 wire (host does clip(u8-128,-127,.))

The centered wire was tried once before (commit 1ac01d5, reverted: 13,825 vs
15,450 inf/s headline) — but that measurement ran the MISCOMPILED xor map, so
the comparison is void.  Re-measure both sides with correct numerics.

Run ON the TPU: python scripts/perf_stem_gemm3.py [frames=4096]
"""
import json
import sys
import time
from functools import partial
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def log(m):
    print(m, file=sys.stderr, flush=True)


def main():
    import jax
    import jax.numpy as jnp

    from tpuhar.ops.stem import stem_gemm_u8, to_patch_major
    import tpuhar.ops.quant as Q

    frames_n = int(sys.argv[1]) if len(sys.argv) > 1 else 4096
    npr = np.random.default_rng(0)
    K, c0, Hp, Wp = 768, 256, 14, 14

    col_u8_h = (npr.random((frames_n, Hp, Wp, K)) * 255).astype(np.uint8)
    col_c_h = np.clip(col_u8_h.astype(np.int16) - 128, -127, 127).astype(np.int8)
    col = jax.device_put(col_u8_h)
    col_c = jax.device_put(col_c_h)
    w_i8 = jax.device_put(
        np.clip(npr.normal(0, 40, (K, c0)), -127, 127).astype(np.int8)
    )
    scale = jnp.asarray(npr.random(c0).astype(np.float32) * 1e-2)
    bias = jnp.asarray(npr.normal(0, 0.1, c0).astype(np.float32))
    site = 0.05

    def m0_ship(x):
        return stem_gemm_u8(
            x, w_i8, scale, bias, sub=128, clip_lo=-127, relu=True,
            out_scale=site, out_dtype=jnp.int8,
        )

    def m1_centered(x):
        return stem_gemm_u8(
            x, w_i8, scale, bias, sub=128, clip_lo=-127, relu=True,
            out_scale=site, out_dtype=jnp.int8,
        )

    def m2_2d(x):
        y = stem_gemm_u8(
            x.reshape(-1, K), w_i8, scale, bias, sub=128, clip_lo=-127,
            relu=True, out_scale=site, out_dtype=jnp.int8,
        )
        return y.reshape(frames_n, Hp, Wp, c0)

    def m3_floor(x):
        acc = jax.lax.dot_general(
            x.reshape(-1, K), w_i8, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32,
        )
        # cheapest legal epilogue: shift down to int8 so the write is 1 byte
        return (acc >> 8).astype(jnp.int8)

    def m4_f32out(x):
        return stem_gemm_u8(
            x, w_i8, scale, bias, sub=128, clip_lo=-127, relu=True,
            out_dtype=jnp.float32,
        )

    def m5_sep_q8(x):
        # what quant_tpucnn_forward_resident currently does at the stem: f32
        # stem output, then a separate quantize_activations — if XLA does NOT
        # fuse the two, this materializes the 822 MB f32 intermediate
        y = stem_gemm_u8(
            x, w_i8, scale, bias, sub=128, clip_lo=-127, relu=True,
            out_dtype=jnp.float32,
        )
        return Q.quantize_activations(y, jnp.float32(site))

    micro = {
        "m0_ship": (m0_ship, col),
        "m1_centered": (m1_centered, col_c),
        "m2_2d": (m2_2d, col),
        "m3_floor": (m3_floor, col_c),
        "m4_f32out": (m4_f32out, col),
        "m5_sep_q8": (m5_sep_q8, col),
    }

    # exactness cross-check first (m0 vs m1 must agree bit-for-bit)
    y0 = np.asarray(jax.jit(m0_ship)(col))
    y1 = np.asarray(jax.jit(m1_centered)(col_c))
    assert np.array_equal(y0, y1), "u8 wire and centered wire disagree!"
    log("exactness: m0(u8) == m1(centered) bit-exact OK")

    results = {}
    for name, (fwd, x0) in micro.items():
        results[name] = _time_variant(name, fwd, x0)

    # ---- full int8-resident tower A/B --------------------------------------
    import flax.linen as nn  # noqa: F401  (quant module imports at call time)
    from tpuhar.models.video import TPUVideoCNN
    from tpuhar.ops.video import IMAGENET_MEAN, IMAGENET_STD

    net = TPUVideoCNN(dtype=jnp.float32)
    with jax.default_device(jax.devices("cpu")[0]):
        variables = jax.jit(lambda k, x: net.init(k, x, train=False))(
            jax.random.PRNGKey(0), jnp.zeros((1, 32, 32, 3), jnp.float32)
        )
        calib = npr.normal(0, 1, size=(16, 64, 64, 3)).astype(np.float32)
        stats = Q.calibrate_tpucnn(
            variables["params"], variables["batch_stats"], calib
        )
        qtree = jax.device_get(
            Q.quantize_tpucnn(
                variables["params"], variables["batch_stats"], stats,
                input_fold=(IMAGENET_MEAN, IMAGENET_STD),
            )
        )
    qdev = jax.device_put(qtree)

    def t_u8(x):
        return Q.quant_tpucnn_forward_resident(qdev, x)

    def t_centered(x):
        return Q.quant_tpucnn_forward_resident(qdev, x)

    f0 = np.asarray(jax.jit(t_u8)(col))
    f1 = np.asarray(jax.jit(t_centered)(col_c))
    d = float(np.abs(f0 - f1).max())
    log(f"tower exactness u8-vs-centered: maxdelta {d:.3e}")
    assert d == 0.0, "tower wires disagree!"

    results["t_u8"] = _time_variant("t_u8", t_u8, col)
    results["t_centered"] = _time_variant("t_centered", t_centered, col_c)

    print(json.dumps(
        {"bench": "stem_gemm_patchmajor_r3", "frames_per_step": frames_n,
         "ms": results}))


def _time_variant(name, fwd, x0):
    import jax
    import jax.numpy as jnp

    @partial(jax.jit, static_argnames=("kk",))
    def chained(x, kk: int):
        def body(i, carry):
            cur, acc = carry
            y = fwd(cur)
            delta = jnp.sum(y.astype(jnp.float32)) * 1e-20
            return cur + delta.astype(cur.dtype), acc + delta

        _, acc = jax.lax.fori_loop(0, kk, body, (x, jnp.float32(0)))
        return acc

    def run(kk):
        t0 = time.perf_counter()
        float(np.asarray(chained(x0, kk)))
        return time.perf_counter() - t0

    log(f"compiling {name} ...")
    try:
        run(1); run(13)
        t1 = min(run(1) for _ in range(2))
        tk = min(run(13) for _ in range(2))
        ms = (tk - t1) / 12 * 1e3
    except Exception as e:  # remote-compile 500s etc.
        log(f"  {name}: FAILED {type(e).__name__}: {str(e)[:200]}")
        return None
    log(f"  {name}: {ms:.2f} ms/step")
    return round(ms, 3)


if __name__ == "__main__":
    main()
