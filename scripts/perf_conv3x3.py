#!/usr/bin/env python
"""Pallas fused conv3x3 (ops/conv3x3.py) vs XLA conv at the flagship stage shapes.

The TPUVideoCNN roofline (docs/BENCHMARKS.md) puts the serving step at ~69% of its
structural floor, with the gap in XLA conv utilization at 14²/7² spatial.  This probe
measures the fused Pallas kernel head-to-head at exactly those shapes (4096 frames =
256 windows × 16), chained-loop timing per CLAUDE.md.

Usage: python scripts/perf_conv3x3.py [tower]
  (no arg)  kernel-level head-to-head at s0/s1 shapes
  tower     full TPUVideoCNN forward, conv_backend=xla vs pallas
"""
import sys
import time
from functools import partial

import numpy as np

sys.path.insert(0, ".")


def log(m):
    print(m, file=sys.stderr, flush=True)


def _time_chained(fn_jit, args, iters=20):
    def run(kk):
        t0 = time.perf_counter()
        float(np.asarray(fn_jit(*args, kk)))
        return time.perf_counter() - t0

    run(1); run(iters)
    t1 = min(run(1) for _ in range(2))
    tk = min(run(iters) for _ in range(2))
    return (tk - t1) / (iters - 1)


def bench_kernel(N, S, C, residual, iters=20):
    import jax
    import jax.numpy as jnp

    from tpuhar.ops.conv3x3 import _xla_reference, conv3x3_bn_act

    npr = np.random.default_rng(0)
    x = jax.device_put(npr.normal(size=(N, S, S, C)).astype(np.float32)).astype(
        jnp.bfloat16
    )
    w = jax.device_put((npr.normal(size=(3, 3, C, C)) * 0.05).astype(np.float32))
    scale = jax.device_put(np.ones(C, np.float32))
    bias = jax.device_put(np.zeros(C, np.float32))
    wb = w.astype(jnp.bfloat16)

    def mk(step):
        @partial(jax.jit, static_argnames=("kk",))
        def chained(x, kk: int):
            def body(i, carry):
                cur, acc = carry
                out = step(cur)
                delta = jnp.sum(out.astype(jnp.float32)) * 1e-20
                return (
                    cur + delta.astype(cur.dtype),
                    acc + delta,
                )

            _, acc = jax.lax.fori_loop(0, kk, body, (x, jnp.float32(0)))
            return acc

        return chained

    flops = 2 * N * S * S * 9 * C * C

    res = (lambda c: c) if residual else (lambda c: None)
    xla = mk(lambda c: _xla_reference(c, wb, scale, bias, res(c), True))
    pls = mk(
        lambda c: conv3x3_bn_act(
            c, wb, scale, bias, residual=res(c), relu=True, interpret=False
        )
    )
    pls_col = mk(
        lambda c: conv3x3_bn_act(
            c, wb, scale, bias, residual=res(c), relu=True, interpret=False,
            im2col=True,
        )
    )

    for name, fn in [("xla", xla), ("pallas", pls), ("pls-col", pls_col)]:
        dt = _time_chained(fn, [x], iters)
        tf = flops / dt / 1e12
        log(
            f"  {name:7s} ({N},{S:3},{S:3},{C:4}) res={residual}: "
            f"{dt * 1e3:8.2f} ms  {tf:6.1f} TFLOP/s ({tf / 197 * 100:4.1f}% peak)"
        )


def bench_tower():
    import jax
    import jax.numpy as jnp

    from tpuhar.models.video import TPUVideoCNN

    npr = np.random.default_rng(0)
    frames = jax.device_put(
        (npr.normal(size=(4096, 224, 224, 3)) * 0.5).astype(np.float32)
    ).astype(jnp.bfloat16)

    with jax.default_device(jax.devices("cpu")[0]):
        net = TPUVideoCNN(dtype=jnp.bfloat16)
        variables = net.init(
            jax.random.PRNGKey(0), np.zeros((1, 32, 32, 3), np.float32), train=False
        )
    variables = jax.device_put(variables)

    for backend in ("xla", "pallas"):
        net = TPUVideoCNN(conv_backend=backend, dtype=jnp.bfloat16)

        @partial(jax.jit, static_argnames=("kk",))
        def chained(v, x, kk: int, net=net):
            def body(i, carry):
                cur, acc = carry
                out = net.apply(v, cur, train=False)
                delta = jnp.sum(out.astype(jnp.float32)) * 1e-20
                return cur + delta.astype(cur.dtype), acc + delta

            _, acc = jax.lax.fori_loop(0, kk, body, (x, jnp.float32(0)))
            return acc

        dt = _time_chained(chained, [variables, frames], iters=10)
        log(f"  tower[{backend:6s}]: {dt * 1e3:8.2f} ms for 4096 frames "
            f"(= {4096 / 16 / dt:7.1f} fused-equivalent windows/s)")


def main():
    import jax

    log(f"devices: {jax.devices()}")
    if len(sys.argv) > 1 and sys.argv[1] == "tower":
        bench_tower()
        return
    log("stage-0 shape (s0 block conv):")
    bench_kernel(4096, 14, 256, residual=False)
    bench_kernel(4096, 14, 256, residual=True)
    log("stage-1 shape (s1 block conv):")
    bench_kernel(4096, 7, 512, residual=False)
    bench_kernel(4096, 7, 512, residual=True)


if __name__ == "__main__":
    main()
