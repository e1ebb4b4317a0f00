"""Offline preprocessing: raw UESTC-MMEA-CL layout → per-window ``.npy`` + metadata CSV.

Capability-parity port of the reference ``MMEAPreprocessor`` (``src/data/preprocessing.py:31-415``)
with the signal path moved on-device: instead of a per-line Python loop calling
``scipy.signal.medfilt`` six times per sequence (the reference hot loop,
``preprocessing.py:272-360``), sequences are padded to static buckets and pushed through
one jitted XLA program (``tpuhar.ops.featurize.preprocess_sequence``) — unit conversion,
median filter, masked z-score, and window slicing fused into one compiled function per
bucket.  ``featurize_backend="host"`` keeps a numpy/scipy path for golden comparisons.

Artifacts are byte-compatible with the reference:
``preprocessed/{split}/{class_dir}_{prefix}_w{idx}.npy`` float32 ``(window, 6)``,
``{split}_metadata.csv`` (METADATA_COLUMNS order), ``preprocessing_stats.json`` with the
same 11 counters (``preprocessing.py:45-57``).
"""
from __future__ import annotations

import json
from pathlib import Path
from typing import Dict, List, Optional

import numpy as np
import pandas as pd
import scipy.signal as _scipy_signal  # imported at module load: the lazy import costs
                                      # ~3 s and would otherwise land in the first run

from ..config import Config
from ..ops import featurize as F
from . import manifest as M


def data_fingerprint(
    preprocessed_dir, splits=("train", "val", "test")
) -> Dict[str, str]:
    """sha256 digest of the serving-relevant preprocessed artifacts, per split.

    Covers exactly what a trained checkpoint is bound to: the packed IMU window
    bank (``{split}_windows.npy``), the JPEG frame bank + its index
    (``{split}_frames.bin`` / ``{split}_frame_index.npy``), and the metadata
    *label sequence* (row→label pairing).  Deliberately path-independent — the
    CSV's absolute ``imu_window_path`` prefixes differ between output roots
    while the data is identical — so two byte-identical regenerations into
    different directories produce equal fingerprints.

    Motivation (caught live, 2026-08-19): ``scripts/bench_accuracy.py``
    regenerates the shared preprocessed dir on every invocation while
    ``--resume`` reuses checkpoints from an earlier one.  When a
    data-affecting code change lands between the two runs, every cross-run
    scorer (``validate_int8_ood``, ``rescore_ood_hard``) silently scores a
    model against data it was never trained on — observed as a clean class
    permutation (id-acc 99 → 5) that left label-free OOD scores looking
    plausible.  Checkpoint writers record this fingerprint; cross-run readers
    verify it and fail loudly instead.
    """
    import hashlib

    d = Path(preprocessed_dir)
    out: Dict[str, str] = {}
    for split in splits:
        h = hashlib.sha256()
        found = False
        for name in (
            f"{split}_windows.npy",
            f"{split}_frames.bin",
            f"{split}_frame_index.npy",
        ):
            p = d / name
            if p.exists():
                found = True
                h.update(name.encode())
                with open(p, "rb") as f:
                    for chunk in iter(lambda: f.read(1 << 22), b""):
                        h.update(chunk)
        meta = d / f"{split}_metadata.csv"
        if meta.exists():
            found = True
            labels = pd.read_csv(meta, usecols=["label"])["label"]
            h.update(b"labels")
            h.update(np.asarray(labels, np.int64).tobytes())
        if found:
            out[split] = h.hexdigest()
    return out


FINGERPRINT_FILENAME = "data_fingerprint.json"


def verify_data_fingerprint(
    recorded_path, preprocessed_dir, *, context: str = ""
) -> bool:
    """Compare a checkpoint's recorded fingerprint against the current data.

    Returns True when they match (or the recorded file doesn't exist — legacy
    checkpoints predate the guard; a warning is printed).  Raises RuntimeError
    on a mismatch: scoring would silently compare a model against data it was
    never trained on.
    """
    recorded_path = Path(recorded_path)
    if not recorded_path.exists():
        print(
            f"WARNING{f' [{context}]' if context else ''}: no recorded data "
            f"fingerprint at {recorded_path} (checkpoints predate the guard); "
            "results are only valid if the preprocessed data is unchanged "
            "since training"
        )
        return True
    recorded = json.loads(recorded_path.read_text())
    current = data_fingerprint(preprocessed_dir, splits=tuple(recorded))
    if recorded != current:
        bad = sorted(k for k in recorded if current.get(k) != recorded[k])
        raise RuntimeError(
            f"data fingerprint mismatch{f' [{context}]' if context else ''}: "
            f"splits {bad} under {preprocessed_dir} differ from what these "
            f"checkpoints were trained on ({recorded_path}). The shared "
            "preprocessed data was regenerated differently since training — "
            "retrain (or re-point --root) instead of scoring a mismatched "
            "model/data pair."
        )
    return True


def _bucket_length(n: int, window: int, max_len: int) -> int:
    """Static bucket for a length-n sequence: next power-of-two >= max(n, window)."""
    b = max(window, 256)
    while b < n and b < max_len:
        b *= 2
    return min(max(b, window), max_len)


class Preprocessor:
    """Dataset preprocessor with reference-identical bookkeeping."""

    def __init__(self, config: Config):
        self.config = config
        self.paths = config.paths
        self.data_cfg = config.data
        # Same counter set as the reference (preprocessing.py:45-57).
        self.preprocessing_stats = {
            "total_samples": 0,
            "skipped_samples": 0,
            "total_windows": 0,
            "samples_with_video": 0,
            "samples_without_video": 0,
            "classes_found": set(),
            "bad_format_lines": 0,
            "missing_sensor_files": 0,
            "missing_video_files": 0,
            "prefix_mismatch": 0,
            "too_short_no_pad": 0,
            # TPU-native addition: sequences longer than max_sequence_length are
            # truncated on the device path (static-shape cap) — counted and warned so
            # the host/device backend divergence is visible (not silent).
            "truncated_sequences": 0,
        }

    # -- IO ------------------------------------------------------------------------
    def load_raw_imu(self, sensor_relpath: str) -> Optional[np.ndarray]:
        """Load an N×6 raw sensor CSV, coercing to 6 columns (preprocessing.py:156-187).

        Returns *raw counts* (unit conversion happens on device), or None on error.
        """
        full_path = Path(self.paths.base_input) / sensor_relpath
        if not full_path.exists():
            self.preprocessing_stats["missing_sensor_files"] += 1
            return None
        try:
            data = pd.read_csv(full_path, header=None).values.astype(np.float32)
            if data.ndim == 1:
                data = data.reshape(1, -1)
            if data.shape[1] < 6:
                pad = np.zeros((data.shape[0], 6 - data.shape[1]), dtype=np.float32)
                data = np.hstack([data, pad])
            elif data.shape[1] > 6:
                data = data[:, :6]
            return data
        except Exception:
            return None

    # -- signal path ---------------------------------------------------------------
    def _windows_device(self, raw: np.ndarray) -> List[np.ndarray]:
        """On-device featurization via bucketed padding + the jitted fused pipeline."""
        import jax.numpy as jnp

        d = self.data_cfg
        n = raw.shape[0]
        window, stride = int(d.imu_window_size), int(d.imu_stride)

        if d.imu_original_rate is not None and float(d.imu_original_rate) != float(
            d.imu_sampling_rate
        ):
            n_target = int(round(n * float(d.imu_sampling_rate) / float(d.imu_original_rate)))
            if n_target > 1:
                raw = np.asarray(F.fourier_resample(jnp.asarray(raw), n_target))
                n = raw.shape[0]

        if n < window and not d.pad_short_sequences:
            self.preprocessing_stats["too_short_no_pad"] += 1
            return []

        bucket = _bucket_length(n, window, int(d.max_sequence_length))
        n_eff = min(n, bucket)
        if n_eff < n:
            self._warn_truncation(n, bucket)
        padded = np.zeros((bucket, raw.shape[1]), dtype=np.float32)
        padded[:n_eff] = raw[:n_eff]

        windows, n_valid = F.preprocess_sequence(
            jnp.asarray(padded),
            jnp.asarray(n_eff, dtype=jnp.int32),
            window=window,
            stride=stride,
            kernel_size=int(d.median_filter_kernel),
            normalize=bool(d.normalize_imu),
            racc=float(d.Racc),
            rgyro=float(d.Rgyro),
        )
        n_valid = int(n_valid)
        out = np.asarray(windows[:n_valid], dtype=np.float32)
        return [out[i] for i in range(n_valid)]

    def _windows_host(self, raw: np.ndarray) -> List[np.ndarray]:
        """Host scipy/numpy path reproducing the reference exactly (for golden tests)."""
        signal = _scipy_signal

        d = self.data_cfg
        acc = raw[:, :3] / float(d.Racc)
        gyro = raw[:, 3:6] / float(d.Rgyro)
        imu = np.concatenate([acc, gyro], axis=1).astype(np.float32)

        if d.imu_original_rate is not None and float(d.imu_original_rate) != float(
            d.imu_sampling_rate
        ):
            n_target = int(
                round(imu.shape[0] * float(d.imu_sampling_rate) / float(d.imu_original_rate))
            )
            if n_target > 1:
                imu = np.stack(
                    [signal.resample(imu[:, c], n_target) for c in range(imu.shape[1])],
                    axis=1,
                ).astype(np.float32)

        k = int(d.median_filter_kernel)
        if k > 1:
            if k % 2 == 0:
                k += 1
            imu = np.stack(
                [signal.medfilt(imu[:, c], kernel_size=k) for c in range(imu.shape[1])],
                axis=1,
            ).astype(np.float32)
        if d.normalize_imu:
            mean = imu.mean(axis=0, keepdims=True)
            std = imu.std(axis=0, keepdims=True) + 1e-8
            imu = ((imu - mean) / std).astype(np.float32)

        window, stride = int(d.imu_window_size), int(d.imu_stride)
        n = imu.shape[0]
        if n < window:
            if not d.pad_short_sequences:
                self.preprocessing_stats["too_short_no_pad"] += 1
                return []
            imu = np.vstack(
                [imu, np.zeros((window - n, imu.shape[1]), dtype=np.float32)]
            )
            n = window
        return [imu[s : s + window] for s in range(0, n - window + 1, stride)]

    def _warn_truncation(self, n: int, bucket: int) -> None:
        self.preprocessing_stats["truncated_sequences"] += 1
        print(
            f"[Preprocess] WARNING: sequence of length {n} truncated to "
            f"{bucket} on the device path (data.max_sequence_length); windows past "
            f"the cap are dropped and z-score stats cover the prefix only — use "
            f"featurize_backend='host' or raise the cap for full-sequence parity"
        )

    def make_windows(self, raw: np.ndarray) -> List[np.ndarray]:
        if self.data_cfg.zscore_scope == "window":
            return self._windows_per_window_batch([raw])[0]
        if self.data_cfg.featurize_backend == "host":
            return self._windows_host(raw)
        return self._windows_device(raw)

    def make_windows_batch(self, raws: List[np.ndarray]) -> List[List[np.ndarray]]:
        """Window many sequences at once.

        The device path groups sequences by padding bucket and runs ONE vmapped
        program per bucket (chunks of ≤128) — per-dispatch latency (which dominates
        small programs on remote/tunneled TPUs) is amortized across the whole split
        instead of paid per sequence.
        """
        if self.data_cfg.zscore_scope == "window":
            return self._windows_per_window_batch(raws)
        if self.data_cfg.featurize_backend == "host":
            return [self._windows_host(r) for r in raws]
        return self._windows_device_batch(raws)

    def _windows_per_window_batch(self, raws: List[np.ndarray]) -> List[List[np.ndarray]]:
        """Serving-consistent featurization (``zscore_scope == "window"``).

        Raw counts are sliced into windows FIRST, then each window goes through the
        exact serving transform (``ops.featurize.featurize_windows``: unit scale,
        medfilt with zero-padded *window* edges, per-window z-score) — so a model
        trained on these windows sees the same input distribution the
        ``InferenceEngine`` produces at serving time, eliminating the per-sequence vs
        per-window z-score skew.
        """
        import jax.numpy as jnp

        d = self.data_cfg
        window, stride = int(d.imu_window_size), int(d.imu_stride)

        slices: List[np.ndarray] = []
        owners: List[int] = []
        for i, raw in enumerate(raws):
            n = raw.shape[0]
            if d.imu_original_rate is not None and float(d.imu_original_rate) != float(
                d.imu_sampling_rate
            ):
                n_target = int(
                    round(n * float(d.imu_sampling_rate) / float(d.imu_original_rate))
                )
                if n_target > 1:
                    raw = np.asarray(F.fourier_resample(jnp.asarray(raw), n_target))
                    n = raw.shape[0]
            if n < window:
                if not d.pad_short_sequences:
                    self.preprocessing_stats["too_short_no_pad"] += 1
                    continue
                raw = np.vstack(
                    [raw, np.zeros((window - n, raw.shape[1]), np.float32)]
                )
                n = window
            for s in range(0, n - window + 1, stride):
                slices.append(raw[s : s + window])
                owners.append(i)

        results: List[List[np.ndarray]] = [[] for _ in raws]
        CHUNK = 1024
        for start in range(0, len(slices), CHUNK):
            chunk = np.stack(slices[start : start + CHUNK]).astype(np.float32)
            feats = np.asarray(
                F.featurize_windows(
                    jnp.asarray(chunk),
                    kernel_size=int(d.median_filter_kernel),
                    normalize=bool(d.normalize_imu),
                    racc=float(d.Racc),
                    rgyro=float(d.Rgyro),
                )
            )  # (B, C, T) → store time-major (T, C) like the sequence path
            feats = np.swapaxes(feats, 1, 2)
            for j, owner in enumerate(owners[start : start + CHUNK]):
                results[owner].append(feats[j].astype(np.float32))
        return results

    def _windows_device_batch(self, raws: List[np.ndarray]) -> List[List[np.ndarray]]:
        import jax
        import jax.numpy as jnp

        d = self.data_cfg
        window, stride = int(d.imu_window_size), int(d.imu_stride)

        # per-sequence host-side fixups (resample / too-short skip), as in the
        # streaming path
        prepped: List[Optional[np.ndarray]] = []
        for raw in raws:
            n = raw.shape[0]
            if d.imu_original_rate is not None and float(d.imu_original_rate) != float(
                d.imu_sampling_rate
            ):
                n_target = int(
                    round(n * float(d.imu_sampling_rate) / float(d.imu_original_rate))
                )
                if n_target > 1:
                    raw = np.asarray(F.fourier_resample(jnp.asarray(raw), n_target))
                    n = raw.shape[0]
            if n < window and not d.pad_short_sequences:
                self.preprocessing_stats["too_short_no_pad"] += 1
                prepped.append(None)
            else:
                prepped.append(raw)

        results: List[List[np.ndarray]] = [[] for _ in raws]
        by_bucket: Dict[int, List[int]] = {}
        for i, raw in enumerate(prepped):
            if raw is None:
                continue
            bucket = _bucket_length(raw.shape[0], window, int(d.max_sequence_length))
            by_bucket.setdefault(bucket, []).append(i)

        batched = jax.jit(
            jax.vmap(
                lambda r, n: F.preprocess_sequence(
                    r, n,
                    window=window,
                    stride=stride,
                    kernel_size=int(d.median_filter_kernel),
                    normalize=bool(d.normalize_imu),
                    racc=float(d.Racc),
                    rgyro=float(d.Rgyro),
                )
            )
        )
        CHUNK = 128
        for bucket, idxs in by_bucket.items():
            for start in range(0, len(idxs), CHUNK):
                chunk = idxs[start : start + CHUNK]
                stacked = np.zeros((len(chunk), bucket, 6), np.float32)
                lengths = np.zeros((len(chunk),), np.int32)
                for j, i in enumerate(chunk):
                    raw = prepped[i]
                    n_eff = min(raw.shape[0], bucket)
                    if n_eff < raw.shape[0]:
                        self._warn_truncation(raw.shape[0], bucket)
                    stacked[j, :n_eff] = raw[:n_eff]
                    lengths[j] = n_eff
                windows, n_valid = jax.device_get(
                    batched(jnp.asarray(stacked), jnp.asarray(lengths))
                )
                for j, i in enumerate(chunk):
                    k = int(n_valid[j])
                    w = np.asarray(windows[j, :k], dtype=np.float32)
                    results[i] = [w[m] for m in range(k)]
        return results

    # -- split driver (preprocessing.py:255-374) -----------------------------------
    def preprocess_split(self, split: str, save: bool = True) -> pd.DataFrame:
        lines = M.load_split_lines(self.config, split)
        self.preprocessing_stats["total_samples"] += len(lines)
        d = self.data_cfg
        records = []
        all_windows = []

        frame_writer = None
        if save and getattr(d, "extract_frames", False):
            from .frames import FrameBankWriter

            frame_writer = FrameBankWriter(
                Path(self.paths.preprocessed_dir) / f"{split}_frames.bin",
                num_frames=int(d.video_frames_per_window),
                resize_hw=tuple(d.video_resize),
                jpeg_quality=int(d.frame_jpeg_quality),
            )

        # Phase 1: parse, validate, and load raw sequences (host).
        samples = []  # (info, line, video_ok, raw)
        for line in lines:
            try:
                info = M.parse_split_line(line)
            except M.SplitLineError:
                self.preprocessing_stats["bad_format_lines"] += 1
                self.preprocessing_stats["skipped_samples"] += 1
                continue

            self.preprocessing_stats["classes_found"].add(info.class_dir)
            base = Path(self.paths.base_input)
            sensor_ok = (base / info.sensor_path).exists()
            video_ok = (base / info.video_path).exists()

            if not sensor_ok:
                self.preprocessing_stats["missing_sensor_files"] += 1
                self.preprocessing_stats["skipped_samples"] += 1
                continue
            if video_ok:
                self.preprocessing_stats["samples_with_video"] += 1
            else:
                self.preprocessing_stats["samples_without_video"] += 1
                self.preprocessing_stats["missing_video_files"] += 1
                if d.require_video:
                    self.preprocessing_stats["skipped_samples"] += 1
                    continue

            if Path(info.sensor_path).stem != Path(info.video_path).stem:
                self.preprocessing_stats["prefix_mismatch"] += 1
                self.preprocessing_stats["skipped_samples"] += 1
                continue

            raw = self.load_raw_imu(info.sensor_path)
            if raw is None or raw.size == 0:
                self.preprocessing_stats["skipped_samples"] += 1
                continue
            samples.append((info, line, video_ok, raw))

        # Phase 2: windowing for ALL sequences at once (device path batches per
        # padding bucket → one vmapped dispatch per bucket chunk).
        all_sample_windows = self.make_windows_batch([s[3] for s in samples])

        # Phase 3: write artifacts in original sample order.
        for (info, line, video_ok, _), windows in zip(samples, all_sample_windows):
            if not windows:
                self.preprocessing_stats["skipped_samples"] += 1
                continue

            out_dir = Path(self.paths.preprocessed_dir) / split
            if save:
                out_dir.mkdir(parents=True, exist_ok=True)

            window_start_frames = []
            for w_idx, window in enumerate(windows):
                self.preprocessing_stats["total_windows"] += 1
                start_frame = M.estimate_start_frame(
                    w_idx,
                    float(d.imu_stride),
                    float(d.imu_sampling_rate),
                    float(d.video_fps),
                )
                imu_path = None
                if save:
                    fname = f"{info.class_dir}_{info.sample_prefix}_w{w_idx}.npy"
                    fpath = out_dir / fname
                    np.save(fpath, window.astype(np.float32))
                    imu_path = str(fpath)
                rec = M.window_record(
                    split, info, line, w_idx, video_ok, window.shape, start_frame, imu_path
                )
                rec["bank_idx"] = len(records)
                records.append(rec)
                all_windows.append(window.astype(np.float32))
                window_start_frames.append(start_frame)

            if frame_writer is not None:
                if video_ok:
                    frame_writer.add_video(
                        Path(self.paths.base_input) / info.video_path,
                        window_start_frames,
                        window_seconds=float(d.imu_window_size)
                        / float(d.imu_sampling_rate),
                        fallback_fps=float(d.video_fps),
                    )
                else:
                    frame_writer.add_missing(len(window_start_frames))

        df = pd.DataFrame(records)
        if save:
            Path(self.paths.preprocessed_dir).mkdir(parents=True, exist_ok=True)
            df.to_csv(Path(self.paths.preprocessed_dir) / f"{split}_metadata.csv", index=False)
            # Packed window bank: one contiguous (N, T, C) array, memory-mapped by the
            # loader — removes the per-window tiny-file reads from the feeding hot
            # path. The per-window .npy files above remain for reference-layout parity.
            if all_windows:
                np.save(
                    Path(self.paths.preprocessed_dir) / f"{split}_windows.npy",
                    np.stack(all_windows),
                )
            if frame_writer is not None:
                frame_writer.finalize(
                    Path(self.paths.preprocessed_dir) / f"{split}_frame_index.npy"
                )
        return df

    def run_full_preprocessing(self) -> Dict[str, pd.DataFrame]:
        results = {}
        for split in ["train", "val", "test"]:
            try:
                results[split] = self.preprocess_split(split, save=True)
            except FileNotFoundError:
                print(f"Warning: split '{split}' not found, skipping")

        stats = dict(self.preprocessing_stats)
        stats["classes_found"] = sorted(stats["classes_found"])
        stats_path = Path(self.paths.preprocessed_dir) / "preprocessing_stats.json"
        stats_path.parent.mkdir(parents=True, exist_ok=True)
        with open(stats_path, "w", encoding="utf-8") as f:
            json.dump(stats, f, indent=2)
        fp_path = Path(self.paths.preprocessed_dir) / FINGERPRINT_FILENAME
        fp_path.write_text(
            json.dumps(data_fingerprint(self.paths.preprocessed_dir), indent=2)
        )
        return results


# Alias matching the reference class name for drop-in familiarity.
MMEAPreprocessor = Preprocessor
