#!/usr/bin/env python
"""A/B the int8 TPUVideoCNN stem lowering on the TPU.

perf_int8_stages.py found the stem eats 11.06 ms of the 22.1 ms int8-resident
tower (9% of its 1.0 ms floor) while every residual stage runs at 88-103% of
floor: XLA's *integer* convolution path does not get the patch-embed -> GEMM
rewrite that makes the bf16 stem cheap (SURVEY conv-shapes table), so the
int8 stem runs like a 3-input-channel conv (~3% lane utilization).

Variants (all bit-exact to the int8 stem's int32 accumulate, since int8 values
and 768-term integer dot products are exact in bf16-in/f32-acc MXU math):
  int8_conv    current: lax.conv int8xint8 -> int32 (the 11 ms baseline)
  bf16_conv    cast the SAME integer values to bf16, float conv, same epilogue
  gemm_reshape explicit uint8 patch transpose + bf16 GEMM
  bf16_conv_u8fold  bf16 conv fed by (u8 - 128) cast, fold epilogue unchanged

Run ON the TPU: python scripts/perf_stem_int8_ab.py [frames=4096]
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

    from tpuhar.models.video import TPUVideoCNN
    from tpuhar.ops import quant as Q
    from tpuhar.ops.video import IMAGENET_MEAN, IMAGENET_STD

    frames_n = int(sys.argv[1]) if len(sys.argv) > 1 else 4096
    npr = np.random.default_rng(0)
    cpu = jax.devices("cpu")[0]
    log("building quantized tree on CPU ...")
    with jax.default_device(cpu):
        net = TPUVideoCNN(dtype=jnp.bfloat16)
        variables = jax.jit(lambda k, x: net.init(k, x, train=False))(
            jax.random.PRNGKey(0), jnp.zeros((1, 32, 32, 3), jnp.float32)
        )
        calib = npr.normal(0, 1, size=(8, 224, 224, 3)).astype(np.float32)
        stats = Q.calibrate_tpucnn(variables["params"], variables["batch_stats"], calib)
        q = jax.device_get(
            Q.quantize_tpucnn(
                variables["params"], variables["batch_stats"], stats,
                input_fold=(IMAGENET_MEAN, IMAGENET_STD),
            )
        )

    patch = q["patch"]
    stem = q["stem"]
    w_q = jnp.asarray(stem["w_q"])           # (16,16,3,256) int8
    w_scale = jnp.asarray(stem["w_scale"])   # (256,)
    bias = jnp.asarray(stem["bias"])

    from flax import linen as nn

    def epilogue(acc_f32):
        # same requant epilogue as ops/quant.int8_conv consumers: scale + bias + relu
        return nn.relu(acc_f32 * w_scale + bias)

    def v_int8_conv(u8):
        x_q = jnp.clip(u8.astype(jnp.int16) - 128, -127, 127).astype(jnp.int8)
        y = Q.int8_conv(
            x_q, w_q, jnp.float32(1.0), w_scale,
            strides=(patch, patch), padding="VALID",
        )
        return nn.relu(y + bias)

    def v_bf16_conv(u8):
        # identical integer values, float conv: exact (sum of 768 int8*int8 < 2^24)
        x_q = jnp.clip(u8.astype(jnp.int16) - 128, -127, 127)
        x = x_q.astype(jnp.bfloat16)
        acc = jax.lax.conv_general_dilated(
            x, w_q.astype(jnp.bfloat16),
            window_strides=(patch, patch), padding="VALID",
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            preferred_element_type=jnp.float32,
        )
        return epilogue(acc)

    def v_gemm_reshape(u8):
        B, H, W, C = u8.shape
        hp, wp = H // patch, W // patch
        x = u8.reshape(B, hp, patch, wp, patch, C)
        x = x.transpose(0, 1, 3, 2, 4, 5).reshape(B, hp, wp, patch * patch * C)
        x_q = (jnp.clip(x.astype(jnp.int16) - 128, -127, 127)).astype(jnp.bfloat16)
        wmat = w_q.astype(jnp.bfloat16).reshape(patch * patch * 3, -1)
        acc = jax.lax.dot_general(
            x_q, wmat, (((3,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        return epilogue(acc)

    def v_bf16_direct(u8):
        # skip the int16 clip: u8 -> bf16 minus 128.0 (exact; u8=0 maps to -128
        # not -127 — the one-LSB black-pixel difference documented in quantize_tpucnn)
        x = u8.astype(jnp.bfloat16) - jnp.bfloat16(128.0)
        acc = jax.lax.conv_general_dilated(
            x, w_q.astype(jnp.bfloat16),
            window_strides=(patch, patch), padding="VALID",
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            preferred_element_type=jnp.float32,
        )
        return epilogue(acc)

    variants = {
        "int8_conv": v_int8_conv,
        "bf16_conv": v_bf16_conv,
        "gemm_reshape": v_gemm_reshape,
        "bf16_direct": v_bf16_direct,
    }

    u8 = jax.device_put((npr.random((frames_n, 224, 224, 3)) * 255).astype(np.uint8))

    # numeric cross-check at tiny shape on CPU first
    with jax.default_device(cpu):
        t = (npr.random((2, 224, 224, 3)) * 255).astype(np.uint8)
        outs = {k: np.asarray(jax.jit(f)(t), np.float32) for k, f in variants.items()}
        ref = outs["int8_conv"]
        for k, o in outs.items():
            md = float(np.max(np.abs(o - ref)))
            log(f"  numeric check {k}: maxdiff vs int8_conv = {md:.3e}")

    results = {}
    for name, fwd in variants.items():
        @partial(jax.jit, static_argnames=("kk",))
        def chained(x, kk: int, fwd=fwd):
            def body(i, carry):
                cur, acc = carry
                feats = fwd(cur)
                delta = jnp.sum(feats) * 1e-20
                return cur + delta.astype(jnp.uint8), acc + delta.astype(jnp.float32)

            _, acc = jax.lax.fori_loop(0, kk, body, (x, jnp.float32(0)))
            return acc

        def run(kk):
            t0 = time.perf_counter()
            float(np.asarray(chained(u8, kk)))
            return time.perf_counter() - t0

        log(f"compiling {name} ...")
        run(1); run(13)
        t1 = min(run(1) for _ in range(2))
        tk = min(run(13) for _ in range(2))
        ms = (tk - t1) / 12 * 1e3
        results[name] = round(ms, 3)
        log(f"  {name}: {ms:.2f} ms/step")

    print(json.dumps({
        "bench": "int8_stem_ab", "frames_per_step": frames_n, "ms": results,
    }))


if __name__ == "__main__":
    main()
