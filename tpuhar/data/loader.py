"""Host-side batch loaders: IMU windows + decoded video clips → numpy batches.

Replaces the reference's torch ``DataLoader`` stack (``src/data/datasets.py:30-434``)
with a thin numpy pipeline tuned for TPU feeding:

- **Element specs match the reference**: cross-modal batches carry
  ``imu (B, C, T) f32`` and ``video (B, T, H, W, 3) uint8`` (feature-last, the TPU
  layout; the reference's ``(T, C, H, W)`` torch layout is a transpose away), plus
  ``idx``; classification batches carry ``imu``, ``label``, ``idx``
  (``datasets.py:33``, ``:244``, ``:329``).
- **Normalization moved on-device**: the loader ships uint8 pixels (4× less host→device
  bandwidth than f32); ImageNet scaling/normalization happens inside the jitted step
  (``tpuhar.ops.video.normalize_clip``), fused into the XLA program.
- **Sequential video decode**: the reference seeks 16 times per clip
  (``datasets.py:211-221``); here each clip is decoded with one seek + a linear read of
  the window span, picking the same uniform ``linspace`` frame indices
  (``datasets.py:201-206``).
- **Robust fallbacks preserved**: missing/corrupt IMU → zeros, missing/corrupt/short
  video → black frames (``datasets.py:113-145``, ``:147-153``, ``:164-178``).
- Train loaders shuffle per epoch (seeded) and drop the last partial batch
  (``drop_last=True``, ``datasets.py:398-408``); eval loaders pad the final batch and
  report ``n_valid`` so device shapes stay static for jit.
"""
from __future__ import annotations

import concurrent.futures as cf
import queue
import threading
from pathlib import Path
from typing import Dict, Iterator, Optional

import numpy as np
import pandas as pd


# ---------------------------------------------------------------------------------
# IMU window loading (datasets.py:105-145 semantics)
# ---------------------------------------------------------------------------------
def resolve_imu_path(imu_path: str, preprocessed_dir) -> Path:
    p = Path(str(imu_path))
    if p.is_absolute():
        return p
    cand = Path(preprocessed_dir) / p
    if cand.exists():
        return cand
    cand2 = Path.cwd() / p
    if cand2.exists():
        return cand2
    return cand


def load_imu_window(imu_path: str, preprocessed_dir, channels: int, window: int) -> np.ndarray:
    """Load one preprocessed window as ``(C, T)`` f32 with the reference's shape fixing:
    transpose detection, pad/crop to (T, C), zeros on any failure."""
    try:
        f = resolve_imu_path(imu_path, preprocessed_dir)
        if not f.exists():
            return np.zeros((channels, window), dtype=np.float32)
        data = np.asarray(np.load(str(f)), dtype=np.float32)
        if data.ndim != 2:
            return np.zeros((channels, window), dtype=np.float32)
        if data.shape == (channels, window):
            data = data.T
        if data.shape != (window, channels):
            out = np.zeros((window, channels), dtype=np.float32)
            t, c = min(window, data.shape[0]), min(channels, data.shape[1])
            out[:t, :c] = data[:t, :c]
            data = out
        return np.ascontiguousarray(data.T)
    except Exception:
        return np.zeros((channels, window), dtype=np.float32)


# ---------------------------------------------------------------------------------
# Video clip decoding (datasets.py:155-235 semantics, sequential read)
# ---------------------------------------------------------------------------------
def clip_frame_indices(
    total_frames: int,
    fps: float,
    start_frame: int,
    *,
    num_frames: int,
    window_seconds: float,
) -> np.ndarray:
    """Uniform frame-index selection for one clip (reference ``datasets.py:191-206``).

    Shared by the online decoder and the offline frame extractor so the cached frames
    are exactly the frames the online path would pick.
    """
    window_frames = max(int(round(window_seconds * fps)), 1)
    start = int(np.clip(start_frame, 0, max(total_frames - 1, 0)))
    end = min(start + window_frames - 1, total_frames - 1)
    if end >= start:
        idx = np.linspace(start, end, num_frames).astype(int)
    else:
        idx = np.full((num_frames,), start, dtype=int)
    return np.clip(idx, 0, total_frames - 1)


def decode_clip(
    video_path,
    start_frame: int,
    *,
    num_frames: int,
    window_seconds: float,
    fallback_fps: float,
    resize_hw,
) -> np.ndarray:
    """Decode one clip → ``(num_frames, H, W, 3)`` uint8 RGB, resized.

    Frame selection matches the reference: uniform ``linspace(start, end, n)`` over the
    window span with clipping (``datasets.py:191-206``); decode is one seek followed by
    a sequential read instead of n random seeks.  Any failure → black frames.
    """
    import cv2

    H, W = resize_hw
    black = np.zeros((num_frames, H, W, 3), dtype=np.uint8)
    video_path = Path(video_path)
    if not video_path.exists():
        return black
    try:
        cap = cv2.VideoCapture(str(video_path))
        if not cap.isOpened():
            cap.release()
            return black
        total = int(cap.get(cv2.CAP_PROP_FRAME_COUNT)) or 0
        fps = float(cap.get(cv2.CAP_PROP_FPS)) or 0.0
        if total <= 0:
            cap.release()
            return black
        if fps <= 1e-6:
            fps = fallback_fps

        idx = clip_frame_indices(
            total, fps, start_frame, num_frames=num_frames,
            window_seconds=window_seconds,
        )

        out = black.copy()
        cap.set(cv2.CAP_PROP_POS_FRAMES, int(idx[0]))
        pos = int(idx[0])
        frame = None
        want = 0
        while want < num_frames and pos <= int(idx[-1]):
            ret, frame = cap.read()
            if not ret or frame is None:
                break
            while want < num_frames and idx[want] == pos:
                rgb = cv2.cvtColor(frame, cv2.COLOR_BGR2RGB)
                if rgb.shape[:2] != (H, W):
                    rgb = cv2.resize(rgb, (W, H), interpolation=cv2.INTER_LINEAR)
                out[want] = rgb
                want += 1
            pos += 1
        cap.release()
        return out
    except Exception:
        return black


# ---------------------------------------------------------------------------------
# Batch loaders
# ---------------------------------------------------------------------------------
class BatchLoader:
    """Deterministic, optionally shuffled batch iterator over a window manifest.

    ``mode``: "classification" → {imu, label, idx}; "cross_modal" → {imu, video, idx};
    "fusion" → {imu, video, label, idx} (supervised fusion-classifier training — the
    north-star serving model trained end-to-end; no reference equivalent).
    Train semantics (``shuffle=True, drop_last=True``) match the reference factory
    (``datasets.py:398-408``); eval batches are zero-padded to the batch size with
    ``n_valid`` recording the real count (static shapes for jit).
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
        decode_workers: int = 8,
        decode_processes: Optional[int] = None,
        prefetch: int = 2,
        return_info: bool = False,
    ):
        self.df = df.reset_index(drop=True)
        self.config = config
        self.mode = mode
        d, t = config.data, config.training
        self.batch_size = batch_size or (
            t.pretrain_batch_size if mode == "cross_modal" else t.train_batch_size
        )
        self.shuffle = shuffle
        self.drop_last = drop_last
        self.seed = seed
        self.epoch = 0
        self.decode_workers = decode_workers
        # Multi-core hosts: decode clips in a spawn-context process pool (scales with
        # cores; threads are partially GIL-bound). 0/None = in-process threads.
        self.decode_processes = int(
            decode_processes
            if decode_processes is not None
            else getattr(d, "decode_processes", 0) or 0
        )
        self._decode_pool = None  # created lazily on the first cross-modal batch
        self.prefetch = prefetch
        # reference IMUClassificationDataset's return_info (datasets.py:331-336):
        # pass identity columns through for analysis tooling (host-side lists,
        # not device arrays)
        self.return_info = return_info
        self.channels = d.imu_channels
        self.window = d.imu_window_size
        self.window_seconds = d.imu_window_size / float(d.imu_sampling_rate)
        self._banks = self._open_banks()
        self._frame_banks = (
            self._open_frame_banks() if mode in ("cross_modal", "fusion") else None
        )

    def _open_frame_banks(self):
        """Open per-split JPEG frame banks written by the preprocessor, if present.

        Cached frames replace per-epoch mp4 seek-decoding (~100 ms/clip) with ~16
        small JPEG decodes (~1 ms each); rows without cached frames fall back to the
        online decoder.
        """
        if "bank_idx" not in self.df.columns or "split" not in self.df.columns:
            return None
        from .frames import FrameBankReader

        banks = {}
        self._frame_bank_paths = {}
        for split in self.df["split"].unique():
            base = Path(self.config.paths.preprocessed_dir)
            bin_path = base / f"{split}_frames.bin"
            idx_path = base / f"{split}_frame_index.npy"
            if not (bin_path.exists() and idx_path.exists()):
                return None
            reader = FrameBankReader(bin_path, idx_path)
            if reader.table.shape[1] != self.config.data.video_frames_per_window:
                return None
            if int(self.df[self.df["split"] == split]["bank_idx"].max()) >= len(reader):
                return None
            banks[split] = reader
            self._frame_bank_paths[split] = (str(bin_path), str(idx_path))
        return banks

    def _open_banks(self):
        """Memory-map packed per-split window banks when available.

        The preprocessor writes ``{split}_windows.npy`` alongside the metadata;
        gathering rows from a memmap replaces one tiny-file read + parse per window
        (the reference does ``np.load`` per item per epoch, ``datasets.py:117``).
        Falls back to per-file loads for manifests without bank columns.
        """
        if "bank_idx" not in self.df.columns or "split" not in self.df.columns:
            return None
        banks = {}
        for split in self.df["split"].unique():
            path = Path(self.config.paths.preprocessed_dir) / f"{split}_windows.npy"
            if not path.exists():
                return None
            bank = np.load(path, mmap_mode="r")
            if bank.ndim != 3 or bank.shape[1:] != (self.window, self.channels):
                return None
            if int(self.df[self.df["split"] == split]["bank_idx"].max()) >= len(bank):
                return None
            banks[split] = bank
        return banks

    def __len__(self) -> int:
        n = len(self.df)
        if self.drop_last:
            return n // self.batch_size
        return (n + self.batch_size - 1) // self.batch_size

    def set_epoch(self, epoch: int) -> None:
        self.epoch = epoch

    def _order(self) -> np.ndarray:
        order = np.arange(len(self.df))
        if self.shuffle:
            np.random.default_rng(self.seed + self.epoch).shuffle(order)
        return order

    def _make_batch(self, rows_idx: np.ndarray) -> Dict[str, np.ndarray]:
        B = self.batch_size
        n_valid = len(rows_idx)
        d = self.config.data
        rows = self.df.iloc[rows_idx]

        imu = np.zeros((B, self.channels, self.window), dtype=np.float32)
        if self._banks is not None:
            for i, (_, row) in enumerate(rows.iterrows()):
                w = self._banks[row["split"]][int(row["bank_idx"])]  # (T, C)
                imu[i] = np.ascontiguousarray(w.T)
        else:
            for i, (_, row) in enumerate(rows.iterrows()):
                imu[i] = load_imu_window(
                    row["imu_window_path"],
                    self.config.paths.preprocessed_dir,
                    self.channels,
                    self.window,
                )
        batch = {
            "imu": imu,
            "idx": np.pad(rows_idx.astype(np.int32), (0, B - n_valid)),
            "n_valid": np.int32(n_valid),
        }
        if self.mode in ("classification", "fusion"):
            labels = rows["label"].to_numpy(dtype=np.int32)
            batch["label"] = np.pad(labels, (0, B - n_valid))
            if self.return_info:
                for col in ("class_name", "user_id"):
                    if col in rows.columns:
                        batch[col] = rows[col].tolist() + [None] * (B - n_valid)
        if self.mode in ("cross_modal", "fusion"):
            H, W = d.video_resize
            T = d.video_frames_per_window
            video = np.zeros((B, T, H, W, 3), dtype=np.uint8)
            base = Path(self.config.paths.base_input)

            if self.decode_processes > 0:
                self._decode_with_processes(rows, video, base, H, W, T, d)
                batch["video"] = video
                return batch

            def _decode(i_row):
                i, row = i_row
                if self._frame_banks is not None:
                    reader = self._frame_banks[row["split"]]
                    r = int(row["bank_idx"])
                    if reader.has_frames(r):
                        video[i] = reader.read_clip(
                            r, (H, W),
                            threads=int(getattr(d, "decode_threads", 1) or 1),
                        )
                        return
                    if not bool(row.get("video_exists", True)):
                        return  # black clip
                video[i] = decode_clip(
                    base / str(row["video_path"]),
                    int(row.get("start_frame", 0)),
                    num_frames=T,
                    window_seconds=self.window_seconds,
                    fallback_fps=float(d.video_fps),
                    resize_hw=(H, W),
                )

            if self.decode_workers > 1 and n_valid > 1:
                with cf.ThreadPoolExecutor(self.decode_workers) as ex:
                    list(ex.map(_decode, enumerate(r for _, r in rows.iterrows())))
            else:
                for item in enumerate(r for _, r in rows.iterrows()):
                    _decode(item)
            batch["video"] = video
        return batch

    def _decode_with_processes(self, rows, video, base, H, W, T, d) -> None:
        """Decode a batch's clips in the shared process pool (multi-core hosts)."""
        from .parallel_decode import ProcessDecodePool

        if self._decode_pool is None:
            self._decode_pool = ProcessDecodePool(self.decode_processes)
        specs = []
        for i, (_, row) in enumerate(rows.iterrows()):
            if self._frame_banks is not None:
                r = int(row["bank_idx"])
                split = row["split"]
                if self._frame_banks[split].has_frames(r):
                    bin_path, idx_path = self._frame_bank_paths[split]
                    specs.append(
                        {
                            "kind": "bank", "i": i, "bin_path": bin_path,
                            "idx_path": idx_path, "row": r, "resize_hw": (H, W),
                        }
                    )
                    continue
                if not bool(row.get("video_exists", True)):
                    specs.append({"kind": "black", "i": i})
                    continue
            specs.append(
                {
                    "kind": "video", "i": i,
                    "path": str(base / str(row["video_path"])),
                    "start_frame": int(row.get("start_frame", 0)),
                    "num_frames": T,
                    "window_seconds": self.window_seconds,
                    "fallback_fps": float(d.video_fps),
                    "resize_hw": (H, W),
                }
            )
        self._decode_pool.decode_batch(specs, video)

    def _batch_indices(self):
        order = self._order()
        n = len(order)
        nb = len(self)
        for b in range(nb):
            yield order[b * self.batch_size : min((b + 1) * self.batch_size, n)]

    def __iter__(self) -> Iterator[Dict[str, np.ndarray]]:
        if self.prefetch <= 0:
            for rows_idx in self._batch_indices():
                yield self._make_batch(rows_idx)
            return
        # background producer thread with bounded queue
        q: "queue.Queue" = queue.Queue(maxsize=self.prefetch)
        stop = threading.Event()

        def producer():
            try:
                for rows_idx in self._batch_indices():
                    if stop.is_set():
                        return
                    q.put(self._make_batch(rows_idx))
            finally:
                q.put(None)

        t = threading.Thread(target=producer, daemon=True)
        t.start()
        try:
            while True:
                item = q.get()
                if item is None:
                    break
                yield item
        finally:
            stop.set()
            # drain so the producer can exit
            while t.is_alive():
                try:
                    q.get_nowait()
                except queue.Empty:
                    break


def create_dataloaders(
    config,
    train_df: pd.DataFrame,
    val_df: pd.DataFrame,
    test_df: pd.DataFrame,
    mode: str = "cross_modal",
    shuffle_train: bool = True,
) -> Dict[str, BatchLoader]:
    """Loader factory matching the reference signature (``datasets.py:372-434``).

    ``data.loader_backend="grain"`` swaps in the Grain-backed pipeline
    (``grain_loader.GrainBatchLoader``, same batch contract) with
    ``data.grain_workers`` decode processes.
    """
    if mode not in ("cross_modal", "classification", "fusion"):
        raise ValueError(f"Unknown mode: {mode}")
    cls = BatchLoader
    if getattr(config.data, "loader_backend", "default") == "grain":
        from .grain_loader import GrainBatchLoader

        cls = GrainBatchLoader
    seed = config.training.seed
    return {
        "train": cls(
            train_df, config, mode=mode, shuffle=shuffle_train, drop_last=True, seed=seed
        ),
        "val": cls(val_df, config, mode=mode),
        "test": cls(test_df, config, mode=mode),
    }
