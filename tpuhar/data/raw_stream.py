"""Raw-input serving streams: manifest → (raw IMU counts [, uint8 clips]) batches.

The serving engine's contract is the RAW sensor data (it featurizes on device:
unit conversion, median filter, z-score — the train==serve closure), while the
offline manifest indexes *featurized* windows.  This module reconstructs the raw
windows the preprocessor consumed — same slicing math as
``preprocess.Preprocessor`` (``window_idx * imu_stride``) against the original
sensor CSVs — and pairs them with clips decoded through ``BatchLoader``'s real
video path (frame cache / mp4), yielding exactly what
``InferenceEngine.predict_stream`` consumes.

Used by ``tpuhar.cli --mode serve`` and ``scripts/bench_serving_stream.py``
(reference serving-equivalent hot loop: the per-item decode in
``/root/reference/src/data/datasets.py:211-221`` — which has no raw path and no
overlap at all).
"""
from __future__ import annotations

from pathlib import Path
from typing import Dict, Iterator, Optional, Tuple

import numpy as np
import pandas as pd


class RawWindowReader:
    """Slice raw ``(window, channels)`` count windows out of sensor CSVs, with a
    per-file cache (one parse per sequence, as the preprocessor does)."""

    def __init__(self, config, base_input=None):
        self.d = config.data
        self.base = Path(base_input) if base_input is not None else Path(
            config.paths.base_input
        )
        self._cache: Dict[str, np.ndarray] = {}

    def window(self, row) -> np.ndarray:
        path = str(self.base / row.sensor_path)
        if path not in self._cache:
            self._cache[path] = np.loadtxt(path, delimiter=",", dtype=np.float32)
        start = int(row.window_idx) * int(self.d.imu_stride)
        w = self._cache[path][start : start + int(self.d.imu_window_size)]
        if len(w) < int(self.d.imu_window_size):  # preprocessor zero-pads tails
            w = np.pad(w, ((0, int(self.d.imu_window_size) - len(w)), (0, 0)))
        return w


def raw_serving_stream(
    config,
    df: pd.DataFrame,
    *,
    batch_size: int,
    with_video: bool = True,
    base_input=None,
    max_windows: Optional[int] = None,
) -> Iterator[Tuple[np.ndarray, ...]]:
    """Yield ``(imu_raw, video_u8)`` (or ``(imu_raw,)``) serving batches in
    manifest order.

    Video decodes ride ``BatchLoader(mode="fusion")``'s production path (frame
    bank → JPEG decode → stack, or one-seek mp4 fallback); its featurized "imu"
    output is discarded — the engine featurizes raw counts on device.
    """
    from .loader import BatchLoader

    reader = RawWindowReader(config, base_input)
    df = df.reset_index(drop=True)
    served = 0
    if not with_video:
        for start in range(0, len(df), batch_size):
            rows = df.iloc[start : start + batch_size]
            if max_windows is not None and served >= max_windows:
                return
            imu = np.stack([reader.window(r) for r in rows.itertuples()])
            served += len(imu)
            yield (imu,)
        return

    loader = BatchLoader(df, config, mode="fusion", batch_size=batch_size, prefetch=2)
    i = 0
    for batch in loader:
        n = int(batch.get("n_valid", len(batch["video"])))
        rows = df.iloc[i : i + n]
        i += n
        imu = np.stack([reader.window(r) for r in rows.itertuples()])
        yield imu, np.asarray(batch["video"])[:n]
        served += n
        if max_windows is not None and served >= max_windows:
            return
