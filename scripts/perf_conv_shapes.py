#!/usr/bin/env python
"""Per-shape conv utilization probe on the TPU (chained-loop timing).

Measures bf16 NHWC convs at ResNet-18's shapes and at candidate TPU-friendly shapes
(wider channels, space-to-depth stems) to guide an efficient video-tower design.
"""
import sys
import time
from functools import partial

import numpy as np

sys.path.insert(0, ".")


def log(m):
    print(m, file=sys.stderr, flush=True)


def time_conv(B, H, W, Cin, Cout, k=3, stride=1, iters=20):
    import jax
    import jax.numpy as jnp

    npr = np.random.default_rng(0)
    x = jax.device_put(npr.normal(size=(B, H, W, Cin)).astype(np.float32))
    w = jax.device_put(
        npr.normal(size=(k, k, Cin, Cout)).astype(np.float32) * 0.05
    )
    dn = jax.lax.conv_dimension_numbers(x.shape, w.shape, ("NHWC", "HWIO", "NHWC"))

    def conv(x, w):
        return jax.lax.conv_general_dilated(
            x.astype(jnp.bfloat16), w.astype(jnp.bfloat16), (stride, stride),
            "SAME", dimension_numbers=dn, preferred_element_type=jnp.float32,
        )

    @partial(jax.jit, static_argnames=("kk",))
    def chained(x, w, kk: int):
        def body(i, carry):
            cur, acc = carry
            out = conv(cur[..., :Cin] if Cout != Cin else cur, w)
            delta = jnp.sum(out) * 1e-20
            return cur + delta.astype(cur.dtype), acc + delta

        _, acc = jax.lax.fori_loop(0, kk, body, (x, jnp.float32(0)))
        return acc

    def run(kk):
        t0 = time.perf_counter()
        float(np.asarray(chained(x, w, kk)))
        return time.perf_counter() - t0

    run(1); run(iters)
    t1 = min(run(1) for _ in range(2))
    tk = min(run(iters) for _ in range(2))
    dt = (tk - t1) / (iters - 1)
    Ho, Wo = H // stride, W // stride
    flops = 2 * B * Ho * Wo * Cin * Cout * k * k
    tf = flops / dt / 1e12
    log(
        f"({B:5},{H:3},{W:3},{Cin:4})→{Cout:4} k{k} s{stride}: "
        f"{dt * 1e3:8.2f} ms  {tf:6.1f} TFLOP/s ({tf / 197 * 100:4.1f}% of v5e peak)"
    )
    return dt, tf


def main():
    if len(sys.argv) > 1 and sys.argv[1] == "grid":
        # Flagship grid-shape question: TPUVideoCNN's residual stages run at
        # 14² (patch-16 stem from 224²) — would a patch-14 stem (16² grid, pow-2
        # spatial) tile better on the MXU?  Same-channel comparison at the
        # serving frame count, plus the post-downsample stage (7² vs 8²).
        B = 4096  # frames (= 256 windows × 16), the serving shape
        for s in [
            (B, 14, 14, 256, 256, 3, 1),   # shipped s0
            (B, 16, 16, 256, 256, 3, 1),   # patch-14 stem s0
            (B, 7, 7, 512, 512, 3, 1),     # shipped s1
            (B, 8, 8, 512, 512, 3, 1),     # patch-14 stem s1
            (B, 14, 14, 256, 512, 3, 2),   # shipped down1
            (B, 16, 16, 256, 512, 3, 2),   # patch-14 down1
        ]:
            try:
                time_conv(*s)
            except Exception as e:
                log(f"{s} FAILED: {type(e).__name__}: {str(e)[:120]}")
        return

    B = 1024  # frames (≈ 64 clips × 16)
    shapes = [
        # resnet18's actual layer shapes
        (B, 112, 112, 64, 64, 3, 1),   # layer1-ish at stride-2 stem output? (approx)
        (B, 56, 56, 64, 64, 3, 1),     # layer1
        (B, 28, 28, 128, 128, 3, 1),   # layer2
        (B, 14, 14, 256, 256, 3, 1),   # layer3
        (B, 7, 7, 512, 512, 3, 1),     # layer4
        # candidate TPU-friendly shapes
        (B, 56, 56, 128, 128, 3, 1),
        (B, 56, 56, 48, 128, 3, 1),    # post space-to-depth stem
        (B, 28, 28, 256, 256, 3, 1),
        (B, 14, 14, 512, 512, 3, 1),
    ]
    for s in shapes:
        try:
            time_conv(*s)
        except Exception as e:
            log(f"{s} FAILED: {type(e).__name__}: {str(e)[:120]}")


if __name__ == "__main__":
    main()
