#!/usr/bin/env python
"""int8 TPUVideoCNN roofline + A/B of the int8-resident serving rewrite.

Answers roadmap #3's "measure first": how much of the int8 flagship step (24.4 ms,
10,499 inf/s, docs/BENCHMARKS.md) is the baseline path's f32 inter-conv activations,
and does the int8-resident rewrite (``ops/quant.quant_tpucnn_forward_resident`` —
producer-side quantization, int8 activations in HBM) recover it?

Static analysis (always): per-layer FLOPs and HBM bytes of the quantized tower at
the serving shape under both activation regimes, with v5e int8 floors
(394 TOPS ≈ 2× bf16 peak; 819 GB/s HBM).

--measure (TPU): chained-loop times (bench.py methodology) of the VIDEO TOWER ONLY
at the serving frame batch for three programs — bf16 ``TPUVideoCNN.apply``,
``quant_tpucnn_forward`` (baseline int8), ``quant_tpucnn_forward_resident`` — so
the conv-path delta is isolated from the (identical) IMU/fusion stack.

Output: markdown table (stdout) + one JSON line.
"""
import argparse
import json
import sys
import time
from functools import partial

import numpy as np

sys.path.insert(0, ".")

PEAK_INT8 = 394e12  # v5e int8 TOPS (2x bf16 197 TFLOP/s)
PEAK_BF16 = 197e12
HBM_GBPS = 819e9


def log(m):
    print(m, file=sys.stderr, flush=True)


def tpucnn_layers(widths=(256, 512), blocks=1, patch=16, hw=224):
    """(name, H_in, Cin, Cout, k, stride) per frame."""
    L = [("stem", hw, 3, widths[0], patch, patch)]
    h = hw // patch
    for si, c in enumerate(widths):
        cin = widths[si - 1] if si > 0 else widths[0]
        if si > 0:
            L.append((f"down{si}", h, cin, c, 3, 2))
            h //= 2
        for bi in range(blocks):
            L.append((f"s{si}b{bi}a", h, c, c, 3, 1))
            L.append((f"s{si}b{bi}b", h, c, c, 3, 1))
    return L


def resnet18_int8_layers():
    """Flatten roofline_resnet's layer map to (name, H, Cin, Cout, k, stride)."""
    sys.path.insert(0, "scripts")
    from roofline_resnet import resnet18_layers

    out = []
    for name, H, _W, Cin, Cout, k, s, count in resnet18_layers():
        for i in range(count):
            out.append((f"{name}.{i}" if count > 1 else name, H, Cin, Cout, k, s))
    return out


def analyze(frames_per_step, tower="tpu_cnn"):
    layers = tpucnn_layers() if tower.startswith("tpu_cnn") else resnet18_int8_layers()
    rows = []
    for name, H, Cin, Cout, k, s in layers:
        Ho = H // s
        flops = 2.0 * Ho * Ho * Cin * Cout * k * k * frames_per_step
        # weights are int8, batch-amortized; activations in+out per conv
        act_elems = (H * H * Cin + Ho * Ho * Cout) * frames_per_step
        w_bytes = k * k * Cin * Cout * 1.0
        # baseline path: inter-conv tensors are f32 (4 B); the conv reads its int8
        # quantized copy too, but the f32 write+read dominates.  stem input is
        # uint8 either way (input fold).
        in_bytes = H * H * Cin * frames_per_step * (1.0 if name == "stem" else 4.0)
        out_bytes = Ho * Ho * Cout * frames_per_step * 4.0
        b_f32 = in_bytes + out_bytes + w_bytes
        # resident path: every inter-conv tensor is int8 (1 B)
        b_int8 = act_elems * 1.0 + w_bytes
        # MXU is a 128x128 systolic array: Cout < 128 output lanes cap the usable
        # peak regardless of precision (same shape cap as roofline_resnet.py)
        t_mxu = flops / (PEAK_INT8 * min(Cout / 128.0, 1.0))
        rows.append({
            "layer": name, "gflops": flops / 1e9,
            "mb_f32path": b_f32 / 1e6, "mb_residentpath": b_int8 / 1e6,
            "t_mxu_ms": t_mxu * 1e3,
            "t_mem_f32_ms": b_f32 / HBM_GBPS * 1e3,
            "t_mem_int8_ms": b_int8 / HBM_GBPS * 1e3,
            "floor_f32path_ms": max(t_mxu, b_f32 / HBM_GBPS) * 1e3,
            "floor_resident_ms": max(t_mxu, b_int8 / HBM_GBPS) * 1e3,
        })
    return rows


def build_towers(batch_frames, tower="tpu_cnn"):
    """Init a full-size tower on CPU, quantize, return the three programs."""
    import jax
    import jax.numpy as jnp

    from tpuhar.models.video import ResNet18, TPUVideoCNN
    from tpuhar.ops import quant as Q

    if tower.startswith("tpu_cnn"):
        net = TPUVideoCNN(dtype=jnp.bfloat16)
        calibrate, quantize = Q.calibrate_tpucnn, Q.quantize_tpucnn
        fwd_base, fwd_res = Q.quant_tpucnn_forward, Q.quant_tpucnn_forward_resident
    else:
        net = ResNet18(dtype=jnp.bfloat16)
        calibrate, quantize = Q.calibrate_resnet18, Q.quantize_resnet18
        fwd_base, fwd_res = (
            Q.quant_resnet18_forward, Q.quant_resnet18_forward_resident,
        )
    npr = np.random.default_rng(0)
    cpu = jax.devices("cpu")[0]
    with jax.default_device(cpu):
        # param shapes are spatial-size independent: init tiny (CLAUDE.md)
        variables = jax.jit(
            lambda k, x: net.init(k, x, train=False)
        )(jax.random.PRNGKey(0), jnp.zeros((1, 32, 32, 3), jnp.float32))
        calib = npr.normal(0, 1, size=(8, 224, 224, 3)).astype(np.float32)
        stats = calibrate(variables["params"], variables["batch_stats"], calib)
        q = jax.device_get(
            quantize(variables["params"], variables["batch_stats"], stats)
        )
    frames = npr.normal(0, 1, size=(batch_frames, 224, 224, 3)).astype(np.float32)

    def bf16_fwd(x):
        return net.apply(variables, x, train=False)

    return {
        "bf16": bf16_fwd,
        "int8_baseline": lambda x: fwd_base(q, x),
        "int8_resident": lambda x: fwd_res(q, x),
    }, frames


def time_tower(fwd, frames, iters=12):
    """Chained-loop step time: carry-dependent input defeats loop hoisting."""
    import jax
    import jax.numpy as jnp

    x = jax.device_put(frames)

    @partial(jax.jit, static_argnames=("kk",))
    def chained(x, kk: int):
        def body(i, carry):
            cur, acc = carry
            feats = fwd(cur)
            delta = (jnp.sum(feats) * 1e-20).astype(cur.dtype)
            return cur + delta, acc + delta.astype(jnp.float32)

        _, acc = jax.lax.fori_loop(0, kk, body, (x, jnp.float32(0)))
        return acc

    def run(kk):
        t0 = time.perf_counter()
        float(np.asarray(chained(x, kk)))
        return time.perf_counter() - t0

    run(1); run(iters)
    t1 = min(run(1) for _ in range(2))
    tk = min(run(iters) for _ in range(2))
    return (tk - t1) / (iters - 1)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=256, help="windows per step")
    ap.add_argument("--frames", type=int, default=16, help="frames per window")
    ap.add_argument("--measure", action="store_true", help="time towers on the TPU")
    ap.add_argument("--tower", default="tpu_cnn", choices=["tpu_cnn", "resnet18"])
    args = ap.parse_args()

    fps = args.batch * args.frames
    rows = analyze(fps, args.tower)
    cols = ["layer", "gflops", "mb_f32path", "mb_residentpath", "t_mxu_ms",
            "t_mem_f32_ms", "t_mem_int8_ms", "floor_f32path_ms", "floor_resident_ms"]
    print("| " + " | ".join(cols) + " |")
    print("|" + "---|" * len(cols))
    for r in rows:
        print("| " + " | ".join(
            f"{r[c]:.2f}" if isinstance(r[c], float) else str(r[c]) for c in cols
        ) + " |")

    floor_f32 = sum(r["floor_f32path_ms"] for r in rows)
    floor_res = sum(r["floor_resident_ms"] for r in rows)
    summary = {
        "bench": "int8_tower_roofline",
        "tower": args.tower,
        "frames_per_step": fps,
        "tower_gflops_per_step": round(sum(r["gflops"] for r in rows), 1),
        "floor_f32path_ms": round(floor_f32, 2),
        "floor_resident_ms": round(floor_res, 2),
        "floor_f32path_inf_per_s": round(args.batch / (floor_f32 / 1e3)),
        "floor_resident_inf_per_s": round(args.batch / (floor_res / 1e3)),
    }
    if args.measure:
        towers, frames = build_towers(fps, args.tower)
        for name, fwd in towers.items():
            dt = time_tower(fwd, frames)
            summary[f"{name}_ms"] = round(dt * 1e3, 2)
            summary[f"{name}_inf_per_s"] = round(args.batch / dt)
            log(f"{name}: {dt * 1e3:.2f} ms/step  {args.batch / dt:.0f} inf/s")
    print(json.dumps(summary))


if __name__ == "__main__":
    main()
