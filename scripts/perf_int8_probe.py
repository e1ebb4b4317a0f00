#!/usr/bin/env python
"""Probe: does int8 conv beat bf16 conv on this TPU? Guides the quantized-serving path.

Times a resnet-middle-layer-shaped conv in bf16 vs int8 (int32 accumulation) plus a
MXU-shaped matmul comparison.
"""
import sys
import time

import numpy as np


def log(m):
    print(m, file=sys.stderr, flush=True)


def timeit(fn, *args, iters=30):
    """Chained in-jit loop timing: immune to async-dispatch artifacts over the
    remote-TPU tunnel (see bench.py)."""
    import functools

    import jax
    import jax.numpy as jnp

    @functools.partial(jax.jit, static_argnames=("k",))
    def chained(k, *a):
        def body(_, carry):
            x, acc = carry
            out = fn(x, *a[1:])
            delta = jnp.sum(out).astype(jnp.float32) * 1e-20
            return x + delta.astype(x.dtype), acc + delta

        _, acc = jax.lax.fori_loop(0, k, body, (a[0], jnp.float32(0)))
        return acc

    def run(k):
        t0 = time.perf_counter()
        val = chained(k, *args)
        float(np.asarray(val))
        return time.perf_counter() - t0

    run(1); run(iters)
    t1 = min(run(1) for _ in range(2))
    tk = min(run(iters) for _ in range(2))
    return (tk - t1) / (iters - 1) * 1e3


def probe_tpucnn_shapes():
    """bf16 vs int8 (and int8+fused requantize epilogue) at TPUVideoCNN's layer
    shapes, serving frame count.  The resnet18 int8 PTQ path bought 1.02× because
    that tower is bandwidth/shape-bound; tpu_cnn's stages are MXU-bound (roofline),
    so the int8 MXU rate (2×) could translate directly — IF XLA fuses the
    requantize into the conv epilogue instead of a separate pass."""
    import jax
    import jax.numpy as jnp

    npr = np.random.default_rng(0)
    F = 4096  # serving frames = 256 windows × 16
    for (H, C) in [(14, 256), (7, 512)]:
        x_f = jax.device_put(npr.normal(size=(F, H, H, C)).astype(np.float32))
        w_f = jax.device_put(npr.normal(size=(3, 3, C, C)).astype(np.float32))
        x_i = jax.device_put(npr.integers(-127, 127, size=(F, H, H, C)).astype(np.int8))
        w_i = jax.device_put(npr.integers(-127, 127, size=(3, 3, C, C)).astype(np.int8))
        dn = jax.lax.conv_dimension_numbers(
            x_f.shape, w_f.shape, ("NHWC", "HWIO", "NHWC")
        )

        def conv_bf16(x, w):
            return jax.lax.conv_general_dilated(
                x.astype(jnp.bfloat16), w.astype(jnp.bfloat16), (1, 1), "SAME",
                dimension_numbers=dn, preferred_element_type=jnp.float32,
            )

        def conv_int8(x, w):
            return jax.lax.conv_general_dilated(
                x, w, (1, 1), "SAME", dimension_numbers=dn,
                preferred_element_type=jnp.int32,
            )

        def conv_int8_requant(x, w):
            # full serving epilogue: int32 acc → scale → relu → round → int8
            acc = conv_int8(x, w)
            y = acc.astype(jnp.float32) * 0.0123
            return jnp.clip(jnp.round(jnp.maximum(y, 0.0)), 0, 127).astype(jnp.int8)

        flops = 2.0 * F * H * H * C * C * 9
        t_bf = timeit(jax.jit(conv_bf16), x_f, w_f)
        log(f"({H}²,{C}) conv bf16        : {t_bf:7.2f} ms ({flops / t_bf / 1e9:6.0f} TFLOP/s)")
        for name, fn, xi in [("int8 raw    ", conv_int8, x_i),
                             ("int8+requant", conv_int8_requant, x_i)]:
            try:
                t = timeit(jax.jit(fn), xi, w_i)
                log(f"({H}²,{C}) conv {name}: {t:7.2f} ms ({flops / t / 1e9:6.0f} TOP/s, {t_bf / t:.2f}x vs bf16)")
            except Exception as e:
                log(f"({H}²,{C}) conv {name} FAILED: {type(e).__name__}: {str(e)[:100]}")


def main():
    import jax
    import jax.numpy as jnp

    if len(sys.argv) > 1 and sys.argv[1] == "tpucnn":
        probe_tpucnn_shapes()
        return

    npr = np.random.default_rng(0)
    B, H, W, C = 1024, 56, 56, 64
    K = 64

    x_f = jax.device_put(npr.normal(size=(B, H, W, C)).astype(np.float32))
    w_f = jax.device_put(npr.normal(size=(3, 3, C, K)).astype(np.float32))
    x_i = jax.device_put(npr.integers(-127, 127, size=(B, H, W, C)).astype(np.int8))
    w_i = jax.device_put(npr.integers(-127, 127, size=(3, 3, C, K)).astype(np.int8))

    dn = jax.lax.conv_dimension_numbers(x_f.shape, w_f.shape, ("NHWC", "HWIO", "NHWC"))

    def conv_bf16(x, w):
        return jax.lax.conv_general_dilated(
            x.astype(jnp.bfloat16), w.astype(jnp.bfloat16), (1, 1), "SAME",
            dimension_numbers=dn, preferred_element_type=jnp.float32,
        )

    def conv_int8(x, w):
        return jax.lax.conv_general_dilated(
            x, w, (1, 1), "SAME", dimension_numbers=dn,
            preferred_element_type=jnp.int32,
        )

    t_bf = timeit(jax.jit(conv_bf16), x_f, w_f)
    log(f"conv bf16 : {t_bf:7.2f} ms")
    try:
        t_i8 = timeit(jax.jit(conv_int8), x_i, w_i)
        log(f"conv int8 : {t_i8:7.2f} ms  (speedup {t_bf / t_i8:.2f}x)")
    except Exception as e:
        log(f"conv int8 FAILED: {type(e).__name__}: {e}")

    # matmul comparison
    M = Kd = N = 4096
    a_f = jax.device_put(npr.normal(size=(M, Kd)).astype(np.float32))
    b_f = jax.device_put(npr.normal(size=(Kd, N)).astype(np.float32))
    a_i = jax.device_put(npr.integers(-127, 127, size=(M, Kd)).astype(np.int8))
    b_i = jax.device_put(npr.integers(-127, 127, size=(Kd, N)).astype(np.int8))

    t_mb = timeit(
        jax.jit(
            lambda a, b: jnp.dot(
                a.astype(jnp.bfloat16), b.astype(jnp.bfloat16),
                preferred_element_type=jnp.float32,
            )
        ),
        a_f, b_f,
    )
    log(f"matmul bf16: {t_mb:7.3f} ms ({2 * M * Kd * N / t_mb / 1e9:.0f} TFLOP/s)")
    try:
        t_mi = timeit(
            jax.jit(lambda a, b: jnp.dot(a, b, preferred_element_type=jnp.int32)),
            a_i, b_i,
        )
        log(f"matmul int8: {t_mi:7.3f} ms ({2 * M * Kd * N / t_mi / 1e9:.0f} TOP/s, speedup {t_mb / t_mi:.2f}x)")
    except Exception as e:
        log(f"matmul int8 FAILED: {type(e).__name__}: {e}")


if __name__ == "__main__":
    main()
