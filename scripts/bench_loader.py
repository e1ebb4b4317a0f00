#!/usr/bin/env python
"""Host data-feeding benchmark: windows/sec and clips/sec from the BatchLoader.

The training path's host side must outrun the device step (~130 ms per 256 clips →
~2000 clips/s needed to keep the flagship fed). Generates a synthetic fixture,
preprocesses it, and measures IMU-only and cross-modal batch rates, comparing the
packed-bank fast path against per-file loads.
"""
import shutil
import sys
import tempfile
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def log(m):
    print(m, file=sys.stderr, flush=True)


def main():
    from tpuhar.data.loader import BatchLoader
    from tpuhar.data.preprocess import Preprocessor
    from tpuhar.data.synthetic import generate_synthetic_dataset, make_synthetic_config

    tmp = Path(tempfile.mkdtemp(prefix="tpuhar_loaderbench_"))
    try:
        generate_synthetic_dataset(
            tmp / "data", num_classes=8, samples_per_class=6, seq_len=1500,
            video_size=(224, 224), seed=0, splits=("train",),
        )
        cfg = make_synthetic_config(tmp / "data", tmp / "out", num_classes=8)
        cfg.data.video_resize = (224, 224)
        cfg.data.video_frames_per_window = 16
        df = Preprocessor(cfg).preprocess_split("train", save=True)
        log(f"{len(df)} windows")

        # IMU-only loading: bank vs per-file
        for label, strip_bank in (("bank", False), ("per-file", True)):
            d = df.drop(columns=["bank_idx"]) if strip_bank else df
            loader = BatchLoader(d, cfg, mode="classification", batch_size=64, prefetch=0)
            list(loader)  # warm page cache
            t0 = time.perf_counter()
            n = sum(int(b["n_valid"]) for b in loader)
            dt = time.perf_counter() - t0
            log(f"imu {label:8}: {n / dt:9.0f} windows/s")

        # cross-modal (decode-dominated)
        for workers in (1, 8):
            loader = BatchLoader(
                df, cfg, mode="cross_modal", batch_size=32, prefetch=2,
                decode_workers=workers,
            )
            t0 = time.perf_counter()
            n = sum(int(b["n_valid"]) for b in loader)
            dt = time.perf_counter() - t0
            log(f"clips ({workers} decode threads): {n / dt:7.0f} clips/s")

        # process-pool decode (--workers N; scales with cores on real hosts —
        # this container has ONE core, so expect parity at best here)
        procs = [int(a.split("=")[1]) for a in sys.argv[1:] if a.startswith("--workers=")]
        for p in procs or [2]:
            loader = BatchLoader(
                df, cfg, mode="cross_modal", batch_size=32, prefetch=2,
                decode_processes=p,
            )
            t0 = time.perf_counter()
            n = sum(int(b["n_valid"]) for b in loader)
            dt = time.perf_counter() - t0
            log(f"clips ({p} decode processes): {n / dt:7.0f} clips/s "
                f"(includes one-time spawn)")
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


if __name__ == "__main__":
    main()
