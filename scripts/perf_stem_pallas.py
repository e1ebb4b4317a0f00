#!/usr/bin/env python
"""Time the Pallas fused uint8 stem (ops/stem.py) variants on the TPU.

Baselines (perf_stem_int8_ab.py @4096 frames): XLA int8 conv 11.06 ms,
bf16 conv 10.04 ms, explicit reshape+GEMM 7.16 ms.  Floor ~1.0-1.6 ms.

Times every (variant, mxu_dtype) combo of ops/stem.patch_embed_u8 with the
real quantized stem weights at the serving shape, int8-resident epilogue
(requant scale+bias+relu+site-quantize -> int8 out), plus the winner's
bf16-folded flavor (sub=0, bf16 out).

Run ON the TPU: python scripts/perf_stem_pallas.py [frames=4096]
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
    from tpuhar.ops.stem import pack_stem_weights, patch_embed_u8
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
    w_q = np.asarray(q["stem"]["w_q"])          # (16,16,3,256) int8
    w_scale = np.asarray(q["stem"]["w_scale"])  # (256,)
    bias = np.asarray(q["stem"]["bias"])
    site = float(np.asarray(q["act_scales"]["s0b0.in"]))
    wp = pack_stem_weights(w_q)

    u8 = jax.device_put((npr.random((frames_n, 224, 224, 3)) * 255).astype(np.uint8))

    def time_fn(fwd, label):
        @partial(jax.jit, static_argnames=("kk",))
        def chained(x, kk: int):
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

        log(f"compiling {label} ...")
        try:
            run(1); run(13)
            t1 = min(run(1) for _ in range(2))
            tk = min(run(13) for _ in range(2))
            ms = (tk - t1) / 12 * 1e3
        except Exception as e:  # Mosaic lowering failures are data, not crashes
            log(f"  {label}: FAILED {type(e).__name__}: {str(e)[:200]}")
            return None
        log(f"  {label}: {ms:.2f} ms/step")
        return round(ms, 3)

    results = {}
    for variant in ("slicedot", "repack", "dg"):
        for mxu, mname in ((jnp.bfloat16, "bf16"), (jnp.int8, "int8")):
            w_dev = jnp.asarray(wp).astype(mxu) if mname == "bf16" else jnp.asarray(wp)

            def fwd(x, w_dev=w_dev, variant=variant, mxu=mxu):
                return patch_embed_u8(
                    x, w_dev, jnp.asarray(w_scale), jnp.asarray(bias),
                    patch=patch, sub=128, clip_lo=-127,
                    out_scale=site, out_dtype=jnp.int8,
                    mxu_dtype=mxu, variant=variant, block_frames=8,
                )

            results[f"{variant}_{mname}"] = time_fn(fwd, f"{variant}/{mname}")

    ok = {k: v for k, v in results.items() if v is not None}
    if ok:
        best = min(ok, key=ok.get)
        log(f"best int8-epilogue variant: {best} = {ok[best]} ms")
        variant = best.rsplit("_", 1)[0]
        # bf16-folded flavor of the winner (normalize-folded weights, bf16 out)
        kf = np.asarray(variables["params"]["stem_conv"]["kernel"], np.float32)
        s = (1.0 / 255.0) / np.asarray(IMAGENET_STD)
        kf = kf * s[None, None, :, None]
        wbf = jnp.asarray(pack_stem_weights(kf), jnp.bfloat16)

        def fwd_bf16(x):
            return patch_embed_u8(
                x, wbf, jnp.ones((kf.shape[-1],), jnp.float32),
                jnp.zeros((kf.shape[-1],), jnp.float32),
                patch=patch, sub=0, out_dtype=jnp.bfloat16,
                mxu_dtype=jnp.bfloat16, variant=variant, block_frames=8,
            )

        results[f"{variant}_bf16fold"] = time_fn(fwd_bf16, f"{variant}/bf16-folded")

    print(json.dumps({
        "bench": "stem_pallas_ab", "frames_per_step": frames_n, "ms": results,
        "xla_baselines_ms": {"int8_conv": 11.058, "bf16_conv": 10.045,
                             "gemm_reshape": 7.161},
    }))


if __name__ == "__main__":
    main()
