#!/usr/bin/env python
"""Perf sweep for the fused-inference flagship: batch sizes × backbones.

Writes one line per variant to stderr and a JSON summary to stdout.
Usage: python scripts/perf_sweep.py [variant ...]
  variant = backbone:batch, e.g. resnet18:512 videomae_small:256
"""
import json
import sys
import time

import numpy as np


def log(m):
    print(m, file=sys.stderr, flush=True)


def measure(backbone: str, batch: int, iters: int = 20):
    import jax

    sys.path.insert(0, ".")
    from __graft_entry__ import _build_forward, _flagship_config

    cfg = _flagship_config()
    cfg.model.video_backbone = backbone
    fn, (imu_ex, video_ex) = _build_forward(cfg, batch)
    jfn = jax.jit(fn)
    npr = np.random.default_rng(0)
    imu = jax.device_put(npr.normal(0, 8000, size=imu_ex.shape).astype(np.float32))
    video = jax.device_put((npr.random(video_ex.shape) * 255).astype(np.uint8))

    t0 = time.perf_counter()
    out = jfn(imu, video)
    jax.block_until_ready(out)
    compile_s = time.perf_counter() - t0

    for _ in range(3):
        out = jfn(imu, video)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = jfn(imu, video)
    jax.block_until_ready(out)
    dt = time.perf_counter() - t0
    thr = batch * iters / dt
    log(
        f"{backbone}:{batch}  {thr:8.0f} inf/s  step {dt / iters * 1e3:7.2f} ms  "
        f"(compile {compile_s:.0f}s)"
    )
    return {"backbone": backbone, "batch": batch, "throughput": round(thr, 1),
            "step_ms": round(dt / iters * 1e3, 2)}


def main():
    variants = sys.argv[1:] or ["resnet18:512", "videomae_small:256"]
    results = []
    for v in variants:
        backbone, batch = v.split(":")
        try:
            results.append(measure(backbone, int(batch)))
        except Exception as e:
            log(f"{v} FAILED: {type(e).__name__}: {e}")
    print(json.dumps(results))


if __name__ == "__main__":
    main()
