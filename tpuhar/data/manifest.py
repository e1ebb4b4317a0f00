"""Split-file parsing and the window-manifest schema.

Host-side (pandas) layer matching the reference's data contracts:
- split lines ``.../data/<class_dir>/<sample_prefix> <start> <end> <label>``
  (reference ``src/data/preprocessing.py:88-148``),
- per-window metadata CSV schema (``preprocessing.py:332-358``),
- few-shot k-per-class sampling (``src/data/datasets.py:343-366``).

Everything here is pure parsing/bookkeeping — cheap on host; the manifest keeps one row
per window so every device-side shape stays static (SURVEY.md §7 "Static shapes").
"""
from __future__ import annotations

from dataclasses import dataclass
from pathlib import Path
from typing import Dict, List, Optional

import numpy as np
import pandas as pd

# Column order of {split}_metadata.csv — identical to the reference's record dict
# (preprocessing.py:332-358) so downstream tooling can consume either framework's output.
METADATA_COLUMNS = [
    "split",
    "class_dir",
    "class_name",
    "class_num",
    "label",
    "sample_id",
    "window_idx",
    "split_line",
    "sensor_path",
    "video_path",
    "video_exists",
    "start_frame",
    "imu_shape_0",
    "imu_shape_1",
    "split_start",
    "split_end",
    "imu_window_path",
    # TPU-build addition: row position inside the packed {split}_windows.npy bank
    # (all reference columns above are preserved verbatim).
    "bank_idx",
]


@dataclass
class SampleInfo:
    """Parsed split line (reference ``parse_split_line`` return dict)."""

    class_dir: str
    class_num: int
    class_name: str
    sample_prefix: str
    sensor_path: str
    video_path: str
    start: int
    end: int
    label: int


class SplitLineError(ValueError):
    """Raised for malformed split lines; callers count and skip (preprocessing.py:274-277)."""


def load_split_lines(config, split: str) -> List[str]:
    """Read non-empty, non-comment lines from a split file (preprocessing.py:62-83)."""
    names = {
        "train": config.paths.train_file,
        "val": config.paths.val_file,
        "test": config.paths.test_file,
    }
    if split not in names:
        raise ValueError(f"Unknown split: {split}")
    split_file = Path(config.paths.base_input) / names[split]
    if not split_file.exists():
        raise FileNotFoundError(f"Split file not found: {split_file}")
    lines = []
    with open(split_file, encoding="utf-8") as f:
        for line in f:
            line = line.strip()
            if line and not line.startswith("#"):
                lines.append(line)
    return lines


def parse_split_line(line: str) -> SampleInfo:
    """Parse ``.../data/<class_dir>/<prefix> start end label``.

    Matches the reference semantics (preprocessing.py:88-148): start/end swapped if
    reversed, class dir split on first underscore into ``<num>_<name>`` with -1 for
    non-numeric prefixes, sensor/video relpaths derived under ``sensor/``/``video/``.
    """
    toks = line.strip().split()
    if len(toks) < 4:
        raise SplitLineError(f"Invalid split line: {line}")

    path_token, start_s, end_s, label_s = toks[0], toks[1], toks[2], toks[3]
    start, end, label = int(start_s), int(end_s), int(label_s)
    if start > end:
        start, end = end, start

    parts = Path(path_token).parts
    if "data" not in parts:
        raise SplitLineError(f"No 'data' directory in: {line}")
    i = parts.index("data")
    if len(parts) < i + 3:
        raise SplitLineError(f"Expected .../data/<class>/<sample>: {line}")

    class_dir = parts[i + 1]
    sample_prefix = parts[i + 2]

    if "_" in class_dir:
        num_str, class_name = class_dir.split("_", 1)
        class_num = int(num_str) if num_str.isdigit() else -1
    else:
        class_num, class_name = -1, class_dir

    return SampleInfo(
        class_dir=class_dir,
        class_num=class_num,
        class_name=class_name,
        sample_prefix=sample_prefix,
        sensor_path=str(Path("sensor") / class_dir / f"{sample_prefix}.csv"),
        video_path=str(Path("video") / class_dir / f"{sample_prefix}.mp4"),
        start=start,
        end=end,
        label=label,
    )


def estimate_start_frame(window_idx: int, stride: float, sampling_rate: float, fps: float) -> int:
    """Map IMU window index → video start frame (preprocessing.py:245-250)."""
    start_time = window_idx * (stride / sampling_rate)
    return int(round(start_time * fps))


def window_record(
    split: str,
    info: SampleInfo,
    line: str,
    window_idx: int,
    video_exists: bool,
    window_shape,
    start_frame: int,
    imu_window_path: Optional[str] = None,
) -> Dict:
    """One manifest row, keys matching METADATA_COLUMNS."""
    rec = {
        "split": split,
        "class_dir": info.class_dir,
        "class_name": info.class_name,
        "class_num": info.class_num,
        "label": info.label,
        "sample_id": info.sample_prefix,
        "window_idx": window_idx,
        "split_line": line,
        "sensor_path": info.sensor_path,
        "video_path": info.video_path,
        "video_exists": bool(video_exists),
        "start_frame": start_frame,
        "imu_shape_0": int(window_shape[0]),
        "imu_shape_1": int(window_shape[1]),
        "split_start": info.start,
        "split_end": info.end,
    }
    if imu_window_path is not None:
        rec["imu_window_path"] = str(imu_window_path)
    return rec


class FewShotSampler:
    """Per-class stratified window sampling (reference ``datasets.py:343-366``).

    Classes with fewer than k windows contribute all of them, matching the reference.
    """

    def __init__(self, metadata_df: pd.DataFrame, config=None):
        self.df = metadata_df
        self.config = config

    def sample_k_per_class(
        self, k: int, seed: Optional[int] = None, verbose: bool = False
    ) -> pd.DataFrame:
        if seed is not None:
            np.random.seed(seed)
        sampled = []
        for class_name in self.df["class_name"].unique():
            class_df = self.df[self.df["class_name"] == class_name]
            if len(class_df) >= k:
                sampled.append(class_df.sample(n=k, random_state=seed))
            else:
                sampled.append(class_df)
        result = pd.concat(sampled, ignore_index=True)
        if verbose:
            # reference console summary (datasets.py:362) — opt-in: the vmapped
            # harness calls this R×cells times and the line would be pure noise
            print(
                f"[FewShotSampler] {len(result)} samples "
                f"({k}/class × {self.df['class_name'].nunique()} classes)"
            )
        return result

    def sample_balanced_test_set(self, n_per_class: int = 20, seed: Optional[int] = None):
        return self.sample_k_per_class(n_per_class, seed)


def get_class_weights(metadata_df: pd.DataFrame) -> np.ndarray:
    """Inverse-frequency class weights (reference ``datasets.py:437-441``)."""
    counts = metadata_df["label"].value_counts().sort_index()
    total = len(metadata_df)
    return (total / (len(counts) * counts.values)).astype(np.float32)
