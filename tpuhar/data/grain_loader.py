"""Grain-backed input pipeline option (``data.loader_backend = "grain"``).

An alternative to ``BatchLoader`` built on Google Grain (the JAX-ecosystem data
loader): the window manifest becomes a ``grain.MapDataset`` whose per-sample map
runs in Grain's spawn-context worker processes, giving deterministic, reproducible,
multi-core decode with battle-tested prefetch/backpressure — the production-scale
answer to the reference's torch ``DataLoader(num_workers=...)``
(``src/data/datasets.py:398-434``).

Contract-compatible with ``BatchLoader``: same batch dicts ({imu, video, label, idx,
n_valid}), same zero-pad-final-batch semantics, same per-epoch deterministic
shuffle (``set_epoch``), so trainers/evaluators take either loader unchanged.

The sample mapper is a plain picklable object that opens its packed-bank memmaps and
JPEG frame-bank readers lazily *per process* (file descriptors don't survive
pickling), mirroring ``parallel_decode``'s worker design. ``tpuhar.data`` stays
JAX-free at import time; Grain itself is imported lazily so environments without it
simply keep the default loader.
"""
from __future__ import annotations

from pathlib import Path
from typing import Dict, Optional

import numpy as np
import pandas as pd


class _SampleMapper:
    """Picklable per-row sample builder: manifest row index → sample dict."""

    def __init__(self, df: pd.DataFrame, config, mode: str):
        d = config.data
        self.mode = mode
        self.channels = int(d.imu_channels)
        self.window = int(d.imu_window_size)
        self.window_seconds = self.window / float(d.imu_sampling_rate)
        self.resize_hw = tuple(d.video_resize)
        self.num_frames = int(d.video_frames_per_window)
        self.fallback_fps = float(d.video_fps)
        self.preprocessed_dir = str(config.paths.preprocessed_dir)
        self.base_input = str(config.paths.base_input)

        # plain-array row columns (cheap to pickle into each worker)
        n = len(df)
        self.labels = (
            df["label"].to_numpy(dtype=np.int32) if "label" in df else np.zeros(n, np.int32)
        )
        self.splits = df["split"].astype(str).to_numpy() if "split" in df else None
        self.bank_idx = (
            df["bank_idx"].to_numpy(dtype=np.int64) if "bank_idx" in df else None
        )
        self.imu_paths = (
            df["imu_window_path"].astype(str).to_numpy()
            if "imu_window_path" in df else None
        )
        self.video_paths = (
            df["video_path"].astype(str).to_numpy() if "video_path" in df else None
        )
        self.start_frames = (
            df["start_frame"].to_numpy(dtype=np.int64)
            if "start_frame" in df else np.zeros(n, np.int64)
        )
        self.video_exists = (
            df["video_exists"].to_numpy(dtype=bool)
            if "video_exists" in df else np.ones(n, bool)
        )
        # lazy per-process state
        self._imu_banks: Optional[Dict] = None
        self._frame_banks: Optional[Dict] = None

    # -- lazy per-process bank opening ------------------------------------------------
    def _ensure_open(self):
        """Open banks once per process. Grain prefetches with a thread pool, so the
        dicts are built completely and published in one (GIL-atomic) assignment —
        a concurrent thread must never observe a half-opened bank set (it would
        silently fall back to online mp4 decode for its rows)."""
        if self._imu_banks is not None:
            return
        imu_banks, frame_banks = {}, {}
        if self.splits is not None and self.bank_idx is not None:
            from .frames import FrameBankReader

            pre = Path(self.preprocessed_dir)
            for split in np.unique(self.splits):
                wpath = pre / f"{split}_windows.npy"
                if wpath.exists():
                    bank = np.load(wpath, mmap_mode="r")
                    if bank.ndim == 3 and bank.shape[1:] == (self.window, self.channels):
                        imu_banks[split] = bank
                bpath = pre / f"{split}_frames.bin"
                ipath = pre / f"{split}_frame_index.npy"
                if bpath.exists() and ipath.exists():
                    reader = FrameBankReader(bpath, ipath)
                    if reader.table.shape[1] == self.num_frames:
                        frame_banks[split] = reader
        self._frame_banks = frame_banks
        self._imu_banks = imu_banks

    def __getstate__(self):
        state = dict(self.__dict__)
        state["_imu_banks"] = None  # re-open in the worker process
        state["_frame_banks"] = None
        return state

    # -- the map -----------------------------------------------------------------------
    def __call__(self, idx: int) -> Dict[str, np.ndarray]:
        from .loader import decode_clip, load_imu_window

        self._ensure_open()
        i = int(idx)
        split = self.splits[i] if self.splits is not None else None
        sample: Dict[str, np.ndarray] = {"idx": np.int32(i)}

        bank = self._imu_banks.get(split) if split is not None else None
        if bank is not None and self.bank_idx is not None:
            sample["imu"] = np.ascontiguousarray(bank[int(self.bank_idx[i])].T)
        else:
            sample["imu"] = load_imu_window(
                self.imu_paths[i], self.preprocessed_dir, self.channels, self.window
            )

        if self.mode in ("classification", "fusion"):
            sample["label"] = np.int32(self.labels[i])
        if self.mode in ("cross_modal", "fusion"):
            H, W = self.resize_hw
            clip = None
            reader = self._frame_banks.get(split) if split is not None else None
            if reader is not None and self.bank_idx is not None:
                r = int(self.bank_idx[i])
                if reader.has_frames(r):
                    clip = reader.read_clip(r, (H, W))
                elif not bool(self.video_exists[i]):
                    clip = np.zeros((self.num_frames, H, W, 3), np.uint8)  # black clip
            if clip is None:
                clip = decode_clip(
                    Path(self.base_input) / self.video_paths[i],
                    int(self.start_frames[i]),
                    num_frames=self.num_frames,
                    window_seconds=self.window_seconds,
                    fallback_fps=self.fallback_fps,
                    resize_hw=(H, W),
                )
            sample["video"] = clip
        return sample


class GrainBatchLoader:
    """Drop-in ``BatchLoader`` alternative driven by Grain.

    ``workers > 0`` runs the sample map in Grain's multiprocess prefetch (spawn
    context); ``workers = 0`` stays in-process (still useful for its uniform
    determinism contract). Iteration rebuilds the dataset each epoch so shuffling
    matches ``BatchLoader``'s seed+epoch reproducibility.
    """

    def __init__(
        self,
        df: pd.DataFrame,
        config,
        *,
        mode: str = "classification",
        batch_size: Optional[int] = None,
        shuffle: bool = False,
        drop_last: bool = False,
        seed: int = 0,
        workers: Optional[int] = None,
        prefetch_per_worker: int = 2,
    ):
        self.df = df.reset_index(drop=True)
        self.config = config
        self.mode = mode
        t = config.training
        self.batch_size = batch_size or (
            t.pretrain_batch_size if mode == "cross_modal" else t.train_batch_size
        )
        self.shuffle = shuffle
        self.drop_last = drop_last
        self.seed = seed
        self.epoch = 0
        self.workers = int(
            workers if workers is not None
            else getattr(config.data, "grain_workers", 0) or 0
        )
        self.prefetch_per_worker = prefetch_per_worker
        self._mapper = _SampleMapper(self.df, config, mode)

    def __len__(self) -> int:
        n = len(self.df)
        if self.drop_last:
            return n // self.batch_size
        return (n + self.batch_size - 1) // self.batch_size

    def set_epoch(self, epoch: int) -> None:
        self.epoch = epoch

    def _pad_batch(self, batch: Dict[str, np.ndarray]) -> Dict[str, np.ndarray]:
        B = self.batch_size
        n_valid = len(batch["idx"])
        out = {}
        for k, v in batch.items():
            v = np.asarray(v)
            if n_valid < B:
                pad = [(0, B - n_valid)] + [(0, 0)] * (v.ndim - 1)
                v = np.pad(v, pad)
            out[k] = v
        out["imu"] = out["imu"].astype(np.float32)
        out["n_valid"] = np.int32(n_valid)
        return out

    def __iter__(self):
        import grain

        ds = grain.MapDataset.source(list(range(len(self.df))))
        if self.shuffle:
            ds = ds.shuffle(seed=self.seed + self.epoch)
        ds = ds.map(self._mapper).batch(
            self.batch_size, drop_remainder=self.drop_last
        )
        it = ds.to_iter_dataset()
        if self.workers > 0:
            it = it.mp_prefetch(
                grain.MultiprocessingOptions(
                    num_workers=self.workers,
                    per_worker_buffer_size=self.prefetch_per_worker,
                )
            )
        for batch in it:
            yield self._pad_batch(batch)
