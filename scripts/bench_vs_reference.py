#!/usr/bin/env python
"""Head-to-head vs the reference implementation on identical data.

Runs the reference's own ``MMEAPreprocessor`` (mounted read-only at /root/reference;
pure pandas/scipy — its only stage that runs without GPU/torchvision/network) and our
preprocessor on the same synthetic dataset, comparing wall time and output parity.
"""
import shutil
import sys
import tempfile
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

REFERENCE = Path("/root/reference")


def log(m):
    print(m, file=sys.stderr, flush=True)


def main():
    from tpuhar.data.preprocess import Preprocessor
    from tpuhar.data.synthetic import generate_synthetic_dataset, make_synthetic_config

    tmp = Path(tempfile.mkdtemp(prefix="tpuhar_vsref_"))
    try:
        generate_synthetic_dataset(
            tmp / "data", num_classes=8, samples_per_class=8, seq_len=3000,
            video_size=(64, 64), seed=0, splits=("train",),
        )
        cfg = make_synthetic_config(tmp / "data", tmp / "ours", num_classes=8)
        cfg.data.extract_frames = False  # compare the signal path 1:1
        cfg.data.featurize_backend = "host"

        # --- ours ------------------------------------------------------------------
        t0 = time.perf_counter()
        df_ours = Preprocessor(cfg).preprocess_split("train", save=True)
        t_ours = time.perf_counter() - t0
        log(f"ours (host backend): {t_ours:6.2f} s  ({len(df_ours)} windows)")

        # --- reference ---------------------------------------------------------------
        sys.path.insert(0, str(REFERENCE / "src" / "data"))
        import importlib

        ref_mod = importlib.import_module("preprocessing")

        class _Paths:
            base_input = tmp / "data"
            base_output = tmp / "ref"
            preprocessed_dir = tmp / "ref" / "preprocessed"
            train_file, val_file, test_file = "train.txt", "val.txt", "test.txt"

        class _Data:
            imu_window_size = 250
            imu_stride = 125
            imu_sampling_rate = 50
            median_filter_kernel = 5
            normalize_imu = True
            video_fps = 25

        class _Cfg:
            paths = _Paths()
            data = _Data()

        _Paths.preprocessed_dir.mkdir(parents=True, exist_ok=True)
        ref = ref_mod.MMEAPreprocessor(_Cfg())
        t0 = time.perf_counter()
        df_ref = ref.preprocess_split("train", save=True)
        t_ref = time.perf_counter() - t0
        log(f"reference          : {t_ref:6.2f} s  ({len(df_ref)} windows)")
        log(f"speedup            : {t_ref / t_ours:6.2f}x")

        # --- parity -------------------------------------------------------------------
        assert len(df_ours) == len(df_ref), (len(df_ours), len(df_ref))
        mism = 0
        for i in range(0, len(df_ours), max(len(df_ours) // 20, 1)):
            a = np.load(df_ours.iloc[i]["imu_window_path"])
            b = np.load(df_ref.iloc[i]["imu_window_path"])
            if not np.allclose(a, b, atol=1e-5):
                mism += 1
        log(f"window parity      : {'EXACT' if mism == 0 else f'{mism} mismatches'} "
            f"(spot-checked every 20th window, atol=1e-5)")
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


if __name__ == "__main__":
    main()
