#!/usr/bin/env python
"""Roofline for the flagship TPUVideoCNN tower at the serving shape.

Same methodology as roofline_resnet.py (HBM-bytes bound vs shape-limited MXU bound
per layer) applied to the tower that carries the north star, to quantify what
headroom remains and where. All TPUVideoCNN layers have C_out ≥ 128, so the MXU
shape cap never binds — the bounds are pure compute peak vs HBM traffic.

Includes the *input path* (uint8 clip read + stem) under both the pre-fold serving
program (normalize materializes bf16) and the folded program (ops/fold.py), which is
where round 2's serving-rewrite win comes from.
"""
import json
import sys

PEAK = 197e12     # v5e bf16 FLOP/s
HBM = 819e9       # v5e bytes/s
MXU_N = 128


def conv_row(name, hw_in, cin, cout, k, s, count, frames):
    ho = hw_in // s
    flops = 2.0 * ho * ho * cin * cout * k * k * frames * count
    act = (hw_in * hw_in * cin + ho * ho * cout) * 2.0 * frames * count
    w = k * k * cin * cout * 2.0 * count
    t_mem = (act + w) / HBM
    t_mxu = flops / (PEAK * min(cout / MXU_N, 1.0))
    return {
        "layer": name, "gflops": flops / 1e9, "mbytes": (act + w) / 1e6,
        "t_mem_ms": t_mem * 1e3, "t_mxu_ms": t_mxu * 1e3,
        "t_floor_ms": max(t_mem, t_mxu) * 1e3,
        "bound": "memory" if t_mem > t_mxu else "mxu",
    }


def main():
    batch = int(sys.argv[1]) if len(sys.argv) > 1 else 256
    frames = batch * 16
    widths, patch = (256, 512), 16
    rows = []

    # input path: uint8 (224²·3) per frame
    in_px = 224 * 224 * 3 * frames
    rows.append({
        "layer": "input u8 read (stem)", "gflops": 0.0, "mbytes": in_px / 1e6,
        "t_mem_ms": in_px / HBM * 1e3, "t_mxu_ms": 0.0,
        "t_floor_ms": in_px / HBM * 1e3, "bound": "memory",
    })
    # pre-fold only: normalize writes + conv re-reads a bf16 copy (2 extra passes)
    prefold_extra = 2 * (in_px * 2) / HBM * 1e3

    # stem GEMM: (14²) × K=768 → 256; input counted above, output 14²·256
    stem_flops = 2.0 * 196 * 768 * 256 * frames
    stem_out = 196 * 256 * 2.0 * frames
    rows.append({
        "layer": "stem GEMM 768→256", "gflops": stem_flops / 1e9,
        "mbytes": stem_out / 1e6,
        "t_mem_ms": stem_out / HBM * 1e3, "t_mxu_ms": stem_flops / PEAK * 1e3,
        "t_floor_ms": max(stem_out / HBM, stem_flops / PEAK) * 1e3, "bound": "mxu",
    })
    rows.append(conv_row("s0 2×3×3 (256,14²)", 14, 256, 256, 3, 1, 2, frames))
    rows.append(conv_row("down1 3×3 s2 256→512", 14, 256, 512, 3, 2, 1, frames))
    rows.append(conv_row("s1 2×3×3 (512,7²)", 7, 512, 512, 3, 1, 2, frames))
    # residual reads (1 per block; adds fuse into conv epilogues)
    res = (14 * 14 * 256 + 7 * 7 * 512) * 2.0 * frames
    rows.append({
        "layer": "residual reads", "gflops": 0.0, "mbytes": res / 1e6,
        "t_mem_ms": res / HBM * 1e3, "t_mxu_ms": 0.0,
        "t_floor_ms": res / HBM * 1e3, "bound": "memory",
    })

    cols = ["layer", "gflops", "mbytes", "t_mem_ms", "t_mxu_ms", "t_floor_ms", "bound"]
    print("| " + " | ".join(cols) + " |")
    print("|" + "---|" * len(cols))
    for r in rows:
        print("| " + " | ".join(
            f"{r[c]:.2f}" if isinstance(r[c], float) else str(r[c]) for c in cols
        ) + " |")

    floor = sum(r["t_floor_ms"] for r in rows)
    tot_tflops = sum(r["gflops"] for r in rows) / 1e3
    print(json.dumps({
        "bench": "tpucnn_roofline", "batch": batch,
        "total_tflops_per_step": round(tot_tflops, 2),
        "tower_floor_ms": round(floor, 2),
        "prefold_extra_ms": round(prefold_extra, 2),
        "floor_inf_per_s": round(batch / (floor / 1e3)),
        # measured (BENCHMARKS.md): 37.9 ms/step at 256, of which IMU+fusion ≈ 2 ms
        "measured_step_ms": 37.9,
        "measured_minus_imu_fusion_ms": 35.9,
        "floor_vs_measured": round(35.9 / floor, 2),
    }))


if __name__ == "__main__":
    main()
