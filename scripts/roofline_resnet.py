#!/usr/bin/env python
"""Roofline analysis of the ResNet-18 parity tower at the serving shape.

Answers "can the resnet18 flagship (1,970 inf/s) get near the tpu_cnn flagship
(6,757), or is it at its ceiling?" with per-layer arithmetic:

  - FLOPs and HBM bytes (bf16 activations in+out, batch-amortized weights) per layer
  - arithmetic intensity vs the v5e ridge point (197 TFLOP/s ÷ 819 GB/s ≈ 241 FLOP/B)
  - a *shape-limited* compute peak: the MXU is a 128×128 systolic array, so a conv
    whose GEMM view has N = Cout < 128 output lanes cannot exceed peak·Cout/128
    regardless of software (the K = 9·Cin contraction dim is deep enough everywhere).

With --measure, times every distinct conv shape on the real chip (chained-loop
method, see bench.py) and compares the summed per-layer times against the measured
full-model step, attributing the gap.

Output: markdown table (stdout) + JSON line.
"""
import argparse
import json
import sys

sys.path.insert(0, ".")
sys.path.insert(0, "scripts")

PEAK_TFLOPS = 197e12  # v5e bf16
HBM_GBPS = 819e9      # v5e HBM bandwidth
MXU_N = 128           # systolic array output lanes


def resnet18_layers():
    """(name, H_in, W_in, Cin, Cout, k, stride, count) per frame at 224²."""
    L = [("stem7x7", 224, 224, 3, 64, 7, 2, 1)]
    # maxpool 112→56 handled as a memory-only op below
    specs = [(64, 56), (128, 28), (256, 14), (512, 7)]
    prev_c = 64
    for li, (c, hw_out) in enumerate(specs):
        hw_in = hw_out if li == 0 else hw_out * 2
        if li == 0:
            L.append((f"layer{li}.conv3x3", hw_in, hw_in, c, c, 3, 1, 4))
        else:
            L.append((f"layer{li}.down3x3", hw_in, hw_in, prev_c, c, 3, 2, 1))
            L.append((f"layer{li}.down1x1", hw_in, hw_in, prev_c, c, 1, 2, 1))
            L.append((f"layer{li}.conv3x3", hw_out, hw_out, c, c, 3, 1, 3))
        prev_c = c
    return L


def analyze(frames_per_step: int):
    rows = []
    for name, H, W, Cin, Cout, k, s, count in resnet18_layers():
        Ho, Wo = H // s, W // s
        flops = 2.0 * Ho * Wo * Cin * Cout * k * k * frames_per_step * count
        act_bytes = (H * W * Cin + Ho * Wo * Cout) * 2.0 * frames_per_step * count
        w_bytes = k * k * Cin * Cout * 2.0 * count  # once per step, not per frame
        bytes_ = act_bytes + w_bytes
        ai = flops / bytes_
        t_mem = bytes_ / HBM_GBPS
        shape_peak = PEAK_TFLOPS * min(Cout / MXU_N, 1.0)
        t_mxu = flops / shape_peak
        rows.append({
            "layer": name, "count": count,
            "gflops": flops / 1e9, "mbytes": bytes_ / 1e6, "ai": ai,
            "t_mem_ms": t_mem * 1e3, "t_mxu_ms": t_mxu * 1e3,
            "bound": "memory" if t_mem > t_mxu else "mxu-shape",
            "t_floor_ms": max(t_mem, t_mxu) * 1e3,
            "shape": (H, W, Cin, Cout, k, s),
        })
    # memory-only ops: maxpool (112²·64 → 56²·64 read+write) and the residual adds.
    # XLA fuses each add into the preceding conv's epilogue, so the only *extra*
    # HBM traffic is one read of the residual tensor per block (2 blocks per stage).
    pool_bytes = (112 * 112 * 64 + 56 * 56 * 64) * 2.0 * frames_per_step
    res_bytes = sum(
        (hw * hw * c) * 2.0 * n
        for hw, c, n in ((56, 64, 2), (28, 128, 2), (14, 256, 2), (7, 512, 2))
    ) * frames_per_step
    rows.append({
        "layer": "maxpool+residual-adds", "count": 1, "gflops": 0.0,
        "mbytes": (pool_bytes + res_bytes) / 1e6, "ai": 0.0,
        "t_mem_ms": (pool_bytes + res_bytes) / HBM_GBPS * 1e3, "t_mxu_ms": 0.0,
        "bound": "memory", "t_floor_ms": (pool_bytes + res_bytes) / HBM_GBPS * 1e3,
        "shape": None,
    })
    return rows


def measure_shapes(rows, frames_per_step):
    """Time each conv shape on the device at a 1024-frame batch, scale to the step."""
    from perf_conv_shapes import time_conv  # same chained-loop methodology

    B = 1024
    scale = frames_per_step / B
    for r in rows:
        if r["shape"] is None:
            continue
        H, W, Cin, Cout, k, s = r["shape"]
        dt, tf = time_conv(B, H, W, Cin, Cout, k=k, stride=s)
        r["t_meas_ms"] = dt * 1e3 * scale * r["count"]
        r["meas_tflops"] = tf
    return rows


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=256, help="windows per step")
    ap.add_argument("--frames", type=int, default=16, help="frames per window")
    ap.add_argument("--measure", action="store_true", help="time shapes on the TPU")
    ap.add_argument("--step-ms", type=float, default=129.9,
                    help="measured full-model step for comparison (BENCHMARKS.md)")
    args = ap.parse_args()

    fps = args.batch * args.frames
    rows = analyze(fps)
    if args.measure:
        rows = measure_shapes(rows, fps)

    cols = ["layer", "count", "gflops", "mbytes", "ai", "t_mem_ms", "t_mxu_ms",
            "t_floor_ms", "bound"]
    if args.measure:
        cols += ["t_meas_ms", "meas_tflops"]
    print("| " + " | ".join(cols) + " |")
    print("|" + "---|" * len(cols))
    for r in rows:
        print("| " + " | ".join(
            f"{r.get(c, ''):.2f}" if isinstance(r.get(c), float) else str(r.get(c, ""))
            for c in cols) + " |")

    floor = sum(r["t_floor_ms"] for r in rows)
    tot_flops = sum(r["gflops"] for r in rows) / 1e3
    summary = {
        "bench": "resnet18_roofline",
        "frames_per_step": fps,
        "total_tflops_per_step": round(tot_flops, 2),
        "floor_ms": round(floor, 2),
        "floor_inf_per_s": round(args.batch / (floor / 1e3)),
        "measured_step_ms": args.step_ms,
        "measured_inf_per_s": round(args.batch / (args.step_ms / 1e3)),
        "floor_vs_measured": round(args.step_ms / floor, 2),
    }
    # Perfect-world int8 projection: 394 TOPS (2× bf16 peak) on every mxu-shape term
    # and half the HBM bytes — i.e. a fully fused int8 conv pipeline with in-kernel
    # requantize everywhere (what ops/quant.py's XLA path could NOT deliver).
    int8_floor = sum(
        max(r["t_mem_ms"] / 2.0, r["t_mxu_ms"] / 2.0) for r in rows
    )
    summary["int8_speed_of_light_ms"] = round(int8_floor, 2)
    summary["int8_speed_of_light_inf_per_s"] = round(args.batch / (int8_floor / 1e3))
    if args.measure:
        meas = sum(r.get("t_meas_ms", 0.0) for r in rows) + rows[-1]["t_floor_ms"]
        summary["sum_layer_meas_ms"] = round(meas, 2)
    print(json.dumps(summary))


if __name__ == "__main__":
    main()
