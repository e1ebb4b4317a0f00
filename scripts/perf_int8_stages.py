#!/usr/bin/env python
"""Measured per-stage decomposition of the int8-resident TPUVideoCNN tower.

roofline_int8.py puts the resident tower's structural floor at 11.8 ms @4096
frames while the full serving step measures 23.4 ms (bench.py, int8 headline).
This script locates the gap: it times PREFIX programs of
``ops/quant.quant_tpucnn_forward_resident`` (stem; +s0 block; +down1; +s1
block; full tower) with the chained-loop methodology, so successive
differences give measured per-stage times to set against the per-layer floors.

Run ON the TPU (each prefix is one remote compile, ~30-60 s):
    python scripts/perf_int8_stages.py [batch_frames=4096]

Output: markdown table (stderr) + one JSON line (stdout).
"""
import json
import sys
import time
from functools import partial

import numpy as np

sys.path.insert(0, ".")
sys.path.insert(0, "scripts")


def log(m):
    print(m, file=sys.stderr, flush=True)


def main():
    import jax
    import jax.numpy as jnp
    from flax import linen as nn

    from tpuhar.models.video import TPUVideoCNN
    from tpuhar.ops import quant as Q

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
        stats = Q.calibrate_tpucnn(
            variables["params"], variables["batch_stats"], calib
        )
        from tpuhar.ops.video import IMAGENET_MEAN, IMAGENET_STD

        q = jax.device_get(
            Q.quantize_tpucnn(
                variables["params"], variables["batch_stats"], stats,
                input_fold=(IMAGENET_MEAN, IMAGENET_STD),
            )
        )

    scales = q["act_scales"]
    stages, blocks = q["layout"]
    patch = q["patch"]
    assert (stages, blocks) == (2, 1), "prefix slicing assumes flagship layout"

    def conv_f32(x_q, packed, x_scale, *, strides, pad, relu):
        y = Q.int8_conv(
            x_q, packed["w_q"], x_scale, packed["w_scale"], strides=strides,
            padding=pad,
        ) + packed["bias"]
        return nn.relu(y) if relu else y

    def resident_prefix(frames, n_units: int):
        """First ``n_units`` units of the resident forward.

        Units: 1=stem, 2=+s0b0 (2 convs + skip), 3=+down1, 4=+s1b0, 5=+pool.
        Mirrors ops/quant.quant_tpucnn_forward_resident exactly (same sites).
        """
        x_q = jnp.clip(frames.astype(jnp.int16) - 128, -127, 127).astype(jnp.int8)
        y = conv_f32(
            x_q, q["stem"], jnp.float32(1.0), strides=(patch, patch), pad="VALID",
            relu=True,
        )
        if n_units == 1:
            return y
        site = "s0b0.in"
        x_q = Q.quantize_activations(y, scales[site])
        h = conv_f32(x_q, q["s0b0"]["a"], scales[site], strides=(1, 1), pad="SAME",
                     relu=True)
        h_q = Q.quantize_activations(h, scales["s0b0.mid"])
        o = conv_f32(h_q, q["s0b0"]["b"], scales["s0b0.mid"], strides=(1, 1),
                     pad="SAME", relu=False)
        y = nn.relu(o + x_q.astype(jnp.float32) * scales[site])
        if n_units == 2:
            return y
        site = "down1.in"
        x_q = Q.quantize_activations(y, scales[site])
        y = conv_f32(x_q, q["down1"], scales[site], strides=(2, 2), pad="SAME",
                     relu=True)
        if n_units == 3:
            return y
        site = "s1b0.in"
        x_q = Q.quantize_activations(y, scales[site])
        h = conv_f32(x_q, q["s1b0"]["a"], scales[site], strides=(1, 1), pad="SAME",
                     relu=True)
        h_q = Q.quantize_activations(h, scales["s1b0.mid"])
        o = conv_f32(h_q, q["s1b0"]["b"], scales["s1b0.mid"], strides=(1, 1),
                     pad="SAME", relu=False)
        y = nn.relu(o + x_q.astype(jnp.float32) * scales[site])
        if n_units == 4:
            return y
        return jnp.mean(y, axis=(1, 2))

    frames = (npr.random((frames_n, 224, 224, 3)) * 255).astype(np.uint8)
    x = jax.device_put(frames)

    def timed(n_units, label):
        @partial(jax.jit, static_argnames=("kk",))
        def chained(x, kk: int):
            def body(i, carry):
                cur, acc = carry
                feats = resident_prefix(cur, n_units)
                delta = jnp.sum(feats) * 1e-20
                # carry-dependent input: the cast of the (tiny, data-dependent)
                # delta is 0 at runtime but not foldable at compile time, so the
                # loop body cannot be hoisted (cf. the perf_stem_probe bug).
                return cur + delta.astype(jnp.uint8), acc + delta.astype(jnp.float32)

            _, acc = jax.lax.fori_loop(0, kk, body, (x, jnp.float32(0)))
            return acc

        def run(kk):
            t0 = time.perf_counter()
            float(np.asarray(chained(x, kk)))
            return time.perf_counter() - t0

        log(f"compiling prefix {label} ...")
        run(1)   # compile kk=1
        run(13)  # compile kk=13 (distinct program — must be warm before timing)
        t1 = min(run(1) for _ in range(2))
        tk = min(run(13) for _ in range(2))
        ms = (tk - t1) / 12 * 1e3
        log(f"  {label}: {ms:.2f} ms/step")
        return ms

    units = [
        (1, "stem (16x16 GEMM, uint8-fold)"),
        (2, "+ s0b0 (2x 14^2x256 conv + skip)"),
        (3, "+ down1 (14->7, 256->512)"),
        (4, "+ s1b0 (2x 7^2x512 conv + skip)"),
        (5, "full tower (+ pool)"),
    ]
    cum = {}
    for n, label in units:
        cum[n] = timed(n, label)

    # per-layer floors at this shape (from roofline_int8.analyze, resident path)
    from roofline_int8 import analyze

    floors = {r["layer"]: r["floor_resident_ms"] for r in analyze(frames_n)}
    stage_floor = {
        1: floors["stem"],
        2: floors["s0b0a"] + floors["s0b0b"],
        3: floors["down1"],
        4: floors["s1b0a"] + floors["s1b0b"],
        5: 0.0,
    }

    log("| unit | measured ms | floor ms | util vs floor |")
    log("|---|---|---|---|")
    rows = []
    prev = 0.0
    for n, label in units:
        d = cum[n] - prev
        prev = cum[n]
        fl = stage_floor[n]
        rows.append({"unit": label, "measured_ms": round(d, 3),
                     "floor_ms": round(fl, 3),
                     "util": round(fl / d, 3) if d > 0 and fl > 0 else None})
        log(f"| {label} | {d:.2f} | {fl:.2f} | "
            f"{(fl / d * 100 if d > 0 and fl > 0 else 0):.0f}% |")

    print(json.dumps({
        "bench": "int8_resident_stage_decompose", "frames_per_step": frames_n,
        "cumulative_ms": {str(k): round(v, 3) for k, v in cum.items()},
        "stages": rows,
    }))


if __name__ == "__main__":
    main()
