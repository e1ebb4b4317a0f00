#!/usr/bin/env python
"""Time the patch-major stem GEMM (ops/stem.stem_gemm_u8) on the TPU.

Baselines @4096 frames: int8 conv 11.06 ms, bf16 conv 10.04 ms; floor ~1-1.6 ms.
Run ON the TPU: python scripts/perf_stem_gemm.py [frames=4096]
"""
import json
import sys
import time
from functools import partial

import numpy as np

sys.path.insert(0, ".")


def log(m):
    print(m, file=sys.stderr, flush=True)


def main():
    import jax
    import jax.numpy as jnp

    from tpuhar.ops.stem import stem_gemm_u8

    frames_n = int(sys.argv[1]) if len(sys.argv) > 1 else 4096
    npr = np.random.default_rng(0)
    K, c0, Hp, Wp = 768, 256, 14, 14
    col = jax.device_put(
        (npr.random((frames_n, Hp, Wp, K)) * 255).astype(np.uint8)
    )
    w_i8 = jax.device_put(
        np.clip(npr.normal(0, 40, (K, c0)), -127, 127).astype(np.int8)
    )
    scale = jnp.asarray(npr.random(c0).astype(np.float32) * 1e-2)
    bias = jnp.asarray(npr.normal(0, 0.1, c0).astype(np.float32))

    variants = {
        "gemm_int8_q8out": lambda x: stem_gemm_u8(
            x, w_i8, scale, bias, out_scale=0.05, out_dtype=jnp.int8,
            mxu_dtype=jnp.int8),
        "gemm_bf16_q8out": lambda x: stem_gemm_u8(
            x, w_i8.astype(jnp.bfloat16), scale, bias, out_scale=0.05,
            out_dtype=jnp.int8, mxu_dtype=jnp.bfloat16),
        "gemm_bf16_bf16out": lambda x: stem_gemm_u8(
            x, w_i8.astype(jnp.bfloat16), scale, bias, sub=0, clip_lo=None,
            out_dtype=jnp.bfloat16, mxu_dtype=jnp.bfloat16),
    }

    results = {}
    for name, fwd in variants.items():
        @partial(jax.jit, static_argnames=("kk",))
        def chained(x, kk: int, fwd=fwd):
            def body(i, carry):
                cur, acc = carry
                y = fwd(cur)
                delta = jnp.sum(y.astype(jnp.float32)) * 1e-20
                return cur + delta.astype(jnp.uint8), acc + delta

            _, acc = jax.lax.fori_loop(0, kk, body, (x, jnp.float32(0)))
            return acc

        def run(kk):
            t0 = time.perf_counter()
            float(np.asarray(chained(col, kk)))
            return time.perf_counter() - t0

        log(f"compiling {name} ...")
        try:
            run(1); run(13)
            t1 = min(run(1) for _ in range(2))
            tk = min(run(13) for _ in range(2))
            ms = (tk - t1) / 12 * 1e3
        except Exception as e:
            log(f"  {name}: FAILED {type(e).__name__}: {str(e)[:200]}")
            results[name] = None
            continue
        results[name] = round(ms, 3)
        log(f"  {name}: {ms:.2f} ms/step")

    print(json.dumps(
        {"bench": "stem_gemm_patchmajor", "frames_per_step": frames_n,
         "ms": results}))


if __name__ == "__main__":
    main()
