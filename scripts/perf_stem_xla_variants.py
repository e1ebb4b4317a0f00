#!/usr/bin/env python
"""Time XLA stem reformulations (concat-of-slices GEMM) vs the conv lowering.

The Pallas route is blocked: this toolchain's remote Mosaic compiler SIGABRTs
on any >2D int8 block (scripts/debug_stem_pallas*.py) — even a plain 4D
load+sum.  But XLA compiles the concat-of-slices gather fine, which replaces
the 616 MB 6-D transpose with 16 strided reads + linear writes and lets the
GEMM run at full K=768.

Variants at the serving shape (int8-resident epilogue: requant + relu + site
quantize -> int8, matching ops/quant.quant_tpucnn_forward_resident's stem):
  conv_int8     current int8 conv lowering (the 11.06 ms baseline)
  concat_int8   u8 slices+concat -> (x-128 clip) int8 GEMM K=768 -> epilogue
  concat_bf16   same gather, bf16 GEMM (exact for int8 values)
  pcgemm_bf16   14 per-patch-column full-K GEMMs, no concat

Run ON the TPU: python scripts/perf_stem_xla_variants.py [frames=4096]
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
    from flax import linen as nn

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
    w_q = jnp.asarray(q["stem"]["w_q"])          # (16,16,3,256) int8
    w_scale = jnp.asarray(q["stem"]["w_scale"])  # (256,)
    bias = jnp.asarray(q["stem"]["bias"])
    site = float(np.asarray(q["act_scales"]["s0b0.in"]))
    K1 = patch * 3
    wmat = w_q.reshape(patch * K1, -1)           # (768, 256) int8, [r,(col,ch)] rows
    c0 = wmat.shape[-1]

    def epilogue(acc_f32):
        y = nn.relu(acc_f32 * w_scale + bias)
        return jnp.clip(jnp.round(y / site), -127, 127).astype(jnp.int8)

    def gather_col(u8):
        B, H, W, C = u8.shape
        Hp, Wp = H // patch, W // patch
        x5 = u8.reshape(B, Hp, patch, Wp, K1)
        col = jnp.concatenate(
            [x5[:, :, r, :, :] for r in range(patch)], axis=-1
        )  # (B, Hp, Wp, 768) uint8; lane r*48+k == weight row order
        return col, (B, Hp, Wp)

    def v_conv_int8(u8):
        x_q = jnp.clip(u8.astype(jnp.int16) - 128, -127, 127).astype(jnp.int8)
        y = Q.int8_conv(
            x_q, w_q, jnp.float32(1.0), w_scale,
            strides=(patch, patch), padding="VALID",
        )
        y = nn.relu(y + bias)
        return jnp.clip(jnp.round(y / site), -127, 127).astype(jnp.int8)

    def v_concat_int8(u8):
        col, (B, Hp, Wp) = gather_col(u8)
        xi = jnp.clip(col.astype(jnp.int16) - 128, -127, 127).astype(jnp.int8)
        acc = jax.lax.dot_general(
            xi.reshape(B * Hp * Wp, patch * K1), wmat,
            (((1,), (0,)), ((), ())), preferred_element_type=jnp.int32,
        )
        return epilogue(acc.astype(jnp.float32)).reshape(B, Hp, Wp, c0)

    def v_concat_bf16(u8):
        col, (B, Hp, Wp) = gather_col(u8)
        xb = (col.astype(jnp.int16) - 128).astype(jnp.bfloat16)
        xb = jnp.maximum(xb, jnp.bfloat16(-127))
        acc = jax.lax.dot_general(
            xb.reshape(B * Hp * Wp, patch * K1), wmat.astype(jnp.bfloat16),
            (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32,
        )
        return epilogue(acc).reshape(B, Hp, Wp, c0)

    def v_pcgemm_bf16(u8):
        B, H, W, C = u8.shape
        Hp, Wp = H // patch, W // patch
        x5 = u8.reshape(B, Hp, patch, Wp, K1)
        outs = []
        wb = wmat.astype(jnp.bfloat16)
        for pc in range(Wp):
            frag = x5[:, :, :, pc, :].reshape(B * Hp, patch * K1)
            xb = (frag.astype(jnp.int16) - 128).astype(jnp.bfloat16)
            xb = jnp.maximum(xb, jnp.bfloat16(-127))
            outs.append(jax.lax.dot_general(
                xb, wb, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            ))
        acc = jnp.stack(outs, axis=1)  # (B*Hp, Wp, c0)
        return epilogue(acc).reshape(B, Hp, Wp, c0)

    variants = {
        "conv_int8": v_conv_int8,
        "concat_int8": v_concat_int8,
        "concat_bf16": v_concat_bf16,
        "pcgemm_bf16": v_pcgemm_bf16,
    }

    # numeric cross-check on CPU at tiny shape
    with jax.default_device(cpu):
        t = (npr.random((2, 224, 224, 3)) * 255).astype(np.uint8)
        outs = {k: np.asarray(jax.jit(f)(t), np.int32) for k, f in variants.items()}
        ref = outs["conv_int8"]
        for k, o in outs.items():
            log(f"  numeric {k}: maxdiff vs conv_int8 = {int(np.max(np.abs(o - ref)))}")

    u8 = jax.device_put((npr.random((frames_n, 224, 224, 3)) * 255).astype(np.uint8))
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
            float(np.asarray(chained(u8, kk)))
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

    print(json.dumps({
        "bench": "stem_xla_variants", "frames_per_step": frames_n, "ms": results,
    }))


if __name__ == "__main__":
    main()
