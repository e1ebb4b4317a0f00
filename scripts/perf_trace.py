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
    paths = glob.glob(f"{logdir}/**/*.xplane.pb", recursive=True)
    if not paths:
        log("no xplane files found")
        return
    from tensorflow.core.profiler.protobuf import xplane_pb2

    totals = defaultdict(float)
    for path in paths:
        xs = xplane_pb2.XSpace()
        xs.ParseFromString(open(path, "rb").read())
        for plane in xs.planes:
            if "TPU" not in plane.name and "tpu" not in plane.name.lower():
                continue
            ev_meta = plane.event_metadata
            for line in plane.lines:
                for ev in line.events:
                    name = ev_meta[ev.metadata_id].name
                    totals[name] += ev.duration_ps / 1e9  # → ms
    items = sorted(totals.items(), key=lambda kv: -kv[1])[:top]
    total = sum(totals.values())
    log(f"total device event time: {total:.1f} ms (3 steps)")
    for name, ms in items:
        log(f"{ms:10.2f} ms  {name[:110]}")


if __name__ == "__main__":
    logdir = "/tmp/tpuhar_trace"
    capture(logdir)
    summarize(logdir)
