#!/usr/bin/env python
"""Stem input-path probe: what does the patch-embed conv's uint8 read actually cost?

Decides whether a Pallas fused uint8 patch-embed kernel can beat XLA. Variants, all
computing the same (B·T, 14, 14, 256) stem output from (B·T, 224, 224, 3) uint8:

  a) normalize:   conv(normalize_clip(u8))       — the pre-fold serving path
  b) cast:        conv(u8.astype(bf16))          — the folded path (ops/fold.py);
                  measures whether XLA fuses a convert-only producer into the conv
                  or materializes a bf16 copy first
  c) pre-patched: u8 reshape/transpose to (B·T·196, 768) on the XLA side (1-byte
                  copy), then a single GEMM — the "patches are just a matmul" lowering
                  a Pallas kernel would fuse into one pass

If (b) ≈ (c) ≈ HBM floor (~1.9 ms at 4096 frames: 0.6 GB u8 read + 0.4 GB bf16
write + GEMM overlap), a custom kernel has nothing left to win. Gap analysis goes
into docs/BENCHMARKS.md.
"""
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

    F = int(sys.argv[1]) if len(sys.argv) > 1 else 4096  # frames (= 256 windows × 16)
    P, C, N = 16, 3, 256
    H = W = 224
    npr = np.random.default_rng(0)
    u8 = jax.device_put(npr.integers(0, 256, size=(F, H, W, C)).astype(np.uint8))
    w = jax.device_put((npr.normal(size=(P, P, C, N)) * 0.02).astype(np.float32))
    from tpuhar.ops.video import normalize_clip

    dn = jax.lax.conv_dimension_numbers(
        (F, H, W, C), (P, P, C, N), ("NHWC", "HWIO", "NHWC")
    )

    def conv(x, w):
        return jax.lax.conv_general_dilated(
            x.astype(jnp.bfloat16), w.astype(jnp.bfloat16), (P, P), "VALID",
            dimension_numbers=dn, preferred_element_type=jnp.float32,
        )

    def v_normalize(u8, w):
        return conv(normalize_clip(u8, dtype=jnp.bfloat16), w)

    def v_cast(u8, w):
        return conv(u8.astype(jnp.bfloat16), w)

    def v_prepatched(u8, w):
        x = u8.reshape(F, 14, P, 14, P * C)          # (F, pr, h, pc, wc)
        x = x.transpose(0, 1, 3, 2, 4)               # u8 copy: (F, pr, pc, h, wc)
        x = x.reshape(F * 196, P * P * C).astype(jnp.bfloat16)
        return (x @ w.astype(jnp.bfloat16).reshape(P * P * C, N)).astype(jnp.float32)

    def chain(fn):
        # Loop-dependence rules (without them this probe printed >peak TFLOP/s):
        #  - the weight input must depend on the accumulator, or XLA hoists the whole
        #    body out as loop-invariant;
        #  - the reduction must consume the FULL output — an out[0, :1] epilogue lets
        #    XLA slice the conv/GEMM down to the one row that feeds it (DCE), timing
        #    a fraction of the advertised FLOPs. The full-sum epilogue costs one
        #    extra HBM read of the f32 output, identical across variants.
        @partial(jax.jit, static_argnames=("k",))
        def run(u8, w, k: int):
            def body(i, acc):
                out = fn(u8, w + acc.astype(w.dtype) * 1e-30)
                return acc + jnp.sum(out) * 1e-20

            return jax.lax.fori_loop(0, k, body, jnp.float32(0.0))

        return run

    for name, fn in [("normalize", v_normalize), ("cast", v_cast),
                     ("prepatched", v_prepatched)]:
        run = chain(fn)

        def t(k):
            t0 = time.perf_counter()
            float(np.asarray(run(u8, w, k)))
            return time.perf_counter() - t0

        t(1); t(8)
        t1 = min(t(1) for _ in range(2))
        t8 = min(t(8) for _ in range(2))
        dt = (t8 - t1) / 7
        flops = 2.0 * F * 196 * (P * P * C) * N
        log(f"{name:11s}: {dt * 1e3:7.3f} ms  ({flops / dt / 1e12:5.1f} TFLOP/s)")


if __name__ == "__main__":
    main()
