#!/usr/bin/env python
"""Capture a jax.profiler trace of the flagship step and print the op-level breakdown.

Parses the XPlane protobuf directly (no TensorBoard needed) and prints the top device
ops by total self-time.
"""
import glob
import gzip
import sys
from collections import defaultdict

import numpy as np


def log(m):
    print(m, file=sys.stderr, flush=True)


def capture(logdir: str, batch: int = 256):
    import jax

    sys.path.insert(0, ".")
    from __graft_entry__ import _build_forward, _flagship_config

    cfg = _flagship_config()
    if len(sys.argv) > 1:
        cfg.model.video_backbone = sys.argv[1]
    fn, (imu_ex, video_ex) = _build_forward(cfg, batch)
    jfn = jax.jit(fn)
    npr = np.random.default_rng(0)
    imu = jax.device_put(npr.normal(0, 8000, size=imu_ex.shape).astype(np.float32))
    video = jax.device_put((npr.random(video_ex.shape) * 255).astype(np.uint8))
    jax.block_until_ready(jfn(imu, video))  # compile
    jax.block_until_ready(jfn(imu, video))

    jax.profiler.start_trace(logdir)
    for _ in range(3):
        out = jfn(imu, video)
    jax.block_until_ready(out)
    jax.profiler.stop_trace()


def summarize(logdir: str, top: int = 30):
    import json as _json

    paths = glob.glob(f"{logdir}/**/*.trace.json.gz", recursive=True)
    if not paths:
        log("no trace json found")
        return
    totals = defaultdict(float)
    counts = defaultdict(int)
    for path in paths:
        data = _json.loads(gzip.open(path).read())
        for e in data.get("traceEvents", []):
            if e.get("ph") == "X" and "dur" in e:
                totals[e.get("name", "?")] += e["dur"] / 1e3
                counts[e.get("name", "?")] += 1
    items = sorted(totals.items(), key=lambda kv: -kv[1])[:top]
    for name, ms in items:
        log(f"{ms:10.2f} ms  x{counts[name]:<4} {name[:100]}")


if __name__ == "__main__":
    logdir = "/tmp/tpuhar_trace"
    capture(logdir)
    summarize(logdir)
