#!/usr/bin/env python
"""Preprocessing throughput: reference scipy chain vs on-device fused pipeline.

The reference preprocesses on host: per-sequence pandas CSV parse + 6× scipy.signal
.medfilt + numpy z-score + Python window loop (its hot loop, SURVEY §3.1). Our
device path fuses unit conversion, medfilt, masked z-score, and windowing into one
jitted program per padding bucket. This measures the signal-path throughput of both
on identical synthetic sequences (CSV parsing excluded from both).
"""
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def log(m):
    print(m, file=sys.stderr, flush=True)


def main():
    from tpuhar.config import Config
    from tpuhar.data.preprocess import Preprocessor

    cfg = Config()
    npr = np.random.default_rng(0)
    seqs = [
        npr.normal(0, 8000, size=(int(n), 6)).astype(np.float32)
        for n in npr.integers(1000, 4000, size=64)
    ]
    total_windows = sum((len(s) - 250) // 125 + 1 for s in seqs)

    for backend, label in (("host", "host scipy chain"), ("device", "device batched")):
        cfg.data.featurize_backend = backend
        pp = Preprocessor(cfg)
        pp.make_windows_batch(seqs[:8])  # warmup/compile
        t0 = time.perf_counter()
        n = sum(len(w) for w in pp.make_windows_batch(seqs))
        dt = time.perf_counter() - t0
        log(
            f"{label:18}: {len(seqs) / dt:7.1f} sequences/s  "
            f"{n / dt:8.0f} windows/s  ({dt * 1e3 / len(seqs):6.1f} ms/seq)"
        )


if __name__ == "__main__":
    main()
