"""Offline frame extraction: decode each video once, cache per-window JPEG frames.

The reference re-decodes video every epoch with 16 random seeks per clip
(``datasets.py:211-221``); each backward seek re-decodes from the last keyframe, so a
clip costs ~100 ms even on fast hosts.  Production video pipelines extract frames
once; this module does that at preprocessing time:

- each sample's video is decoded **sequentially once**,
- the union of all its windows' frame indices (same selection math as the online
  decoder — ``loader.clip_frame_indices``) is resized and JPEG-encoded,
- bytes are appended to one ``{split}_frames.bin`` blob; a ``(n_windows, F, 2)``
  int64 table ``{split}_frame_index.npy`` maps window → (offset, length) per frame.

Training then costs 16 small JPEG decodes per clip (~1 ms each) instead of a full
seek-decode — and storage stays compact (JPEG, not raw pixels).
"""
from __future__ import annotations

import os
from pathlib import Path
from typing import Dict, List, Optional

import numpy as np

from .loader import clip_frame_indices


class FrameBankWriter:
    """Appends JPEG frames for one split; produces the per-window offset table."""

    def __init__(self, bin_path, *, num_frames: int, resize_hw, jpeg_quality: int = 90):
        self.bin_path = Path(bin_path)
        self.bin_path.parent.mkdir(parents=True, exist_ok=True)
        self._f = open(self.bin_path, "wb")
        self._offset = 0
        self.num_frames = num_frames
        self.resize_hw = resize_hw
        self.jpeg_quality = jpeg_quality
        self.rows: List[np.ndarray] = []  # one (F, 2) per window, or -1s

    def add_missing(self, n_windows: int = 1) -> None:
        """Windows without (usable) video → sentinel rows (loader falls back)."""
        for _ in range(n_windows):
            self.rows.append(np.full((self.num_frames, 2), -1, dtype=np.int64))

    def add_video(
        self,
        video_path,
        window_start_frames: List[int],
        *,
        window_seconds: float,
        fallback_fps: float,
    ) -> None:
        """Extract all windows' frames from one video with a single sequential pass."""
        import cv2

        H, W = self.resize_hw
        try:
            cap = cv2.VideoCapture(str(video_path))
            if not cap.isOpened():
                cap.release()
                self.add_missing(len(window_start_frames))
                return
            total = int(cap.get(cv2.CAP_PROP_FRAME_COUNT)) or 0
            fps = float(cap.get(cv2.CAP_PROP_FPS)) or 0.0
            if total <= 0:
                cap.release()
                self.add_missing(len(window_start_frames))
                return
            if fps <= 1e-6:
                fps = fallback_fps

            per_window = [
                clip_frame_indices(
                    total, fps, sf, num_frames=self.num_frames,
                    window_seconds=window_seconds,
                )
                for sf in window_start_frames
            ]
            needed = np.unique(np.concatenate(per_window))
            entries: Dict[int, tuple] = {}
            pos = 0
            ni = 0
            while ni < len(needed):
                ret, frame = cap.read()
                if not ret or frame is None:
                    break
                if pos == needed[ni]:
                    # keep the decoder's BGR order: imencode assumes BGR input, so
                    # the stored JPEG has CORRECT colors (readable by any tool) and
                    # the reader's single BGR→RGB flip yields true RGB.  A previous
                    # BGR2RGB here made a double flip with the reader's — cached
                    # clips came back channel-swapped vs the online decode path.
                    bgr = frame
                    if bgr.shape[:2] != (H, W):
                        bgr = cv2.resize(bgr, (W, H), interpolation=cv2.INTER_LINEAR)
                    ok, buf = cv2.imencode(
                        ".jpg", bgr, [cv2.IMWRITE_JPEG_QUALITY, self.jpeg_quality]
                    )
                    if ok:
                        data = buf.tobytes()
                        self._f.write(data)
                        entries[pos] = (self._offset, len(data))
                        self._offset += len(data)
                    ni += 1
                pos += 1
            cap.release()

            for idx in per_window:
                row = np.full((self.num_frames, 2), -1, dtype=np.int64)
                for j, fi in enumerate(idx):
                    if int(fi) in entries:
                        row[j] = entries[int(fi)]
                self.rows.append(row)
        except Exception:
            self.add_missing(len(window_start_frames))

    def finalize(self, index_path) -> Optional[np.ndarray]:
        self._f.close()
        if not self.rows:
            # nothing extracted: remove the empty blob
            try:
                self.bin_path.unlink()
            except OSError:
                pass
            return None
        table = np.stack(self.rows)
        np.save(index_path, table)
        # Format sidecar. v2 = standard-color JPEGs (BGR fed to imencode); banks
        # without a sidecar predate the channel-order fix and store true RGB
        # under a BGR label — the reader serves them correctly by SKIPPING its
        # BGR→RGB flip instead of silently returning swapped channels.
        import json

        Path(index_path).with_suffix(".meta.json").write_text(
            json.dumps({"bank_format_version": 2, "color": "standard-jpeg"})
        )
        return table


class FrameBankReader:
    """Random-access JPEG frame reads from a split's frame bank (pread: thread-safe)."""

    def __init__(self, bin_path, index_path):
        self.fd = os.open(str(bin_path), os.O_RDONLY)
        self.table = np.load(index_path)  # (N, F, 2)
        # banks without the v2 sidecar were written before the channel-order fix
        # and hold true RGB under a BGR label: serve them via cv2 WITHOUT the
        # flip (and never through the native RGB decoder)
        meta = Path(index_path).with_suffix(".meta.json")
        self.legacy_color = True
        if meta.exists():
            import json

            try:
                self.legacy_color = (
                    int(json.loads(meta.read_text()).get("bank_format_version", 1))
                    < 2
                )
            except (ValueError, OSError):
                pass

    def __len__(self):
        return len(self.table)

    def has_frames(self, row: int) -> bool:
        return bool((self.table[row, :, 0] >= 0).any())

    def read_clip(self, row: int, resize_hw, *, backend: str = "auto",
                  threads: int = 1) -> np.ndarray:
        """Decode one window's cached frames → (F, H, W, 3) uint8 RGB (black gaps).

        ``backend="auto"`` uses the native batched libjpeg decoder
        (``tpuhar.native``: one GIL-released C call for the whole clip) when it
        is built and the stored frames already match ``resize_hw``, falling back
        to the per-frame cv2 path (which also resizes) otherwise.  ``"native"``
        requires the native path (raises when unavailable/mismatched);
        ``"cv2"`` forces the fallback.
        """
        H, W = resize_hw
        if backend in ("auto", "native"):
            clip = self._read_clip_native(row, H, W, threads)
            if clip is not None:
                return clip
            if backend == "native":
                raise RuntimeError(
                    "native decode unavailable or stored frame size != "
                    f"{resize_hw} (see tpuhar.native.decode_available())"
                )
        import cv2

        F = self.table.shape[1]
        out = np.zeros((F, H, W, 3), dtype=np.uint8)
        for j in range(F):
            off, length = self.table[row, j]
            if off < 0:
                continue
            data = os.pread(self.fd, int(length), int(off))
            img = cv2.imdecode(np.frombuffer(data, np.uint8), cv2.IMREAD_COLOR)
            if img is None:
                continue
            if img.shape[:2] != (H, W):
                img = cv2.resize(img, (W, H), interpolation=cv2.INTER_LINEAR)
            # legacy (pre-v2) banks already hold RGB under cv2's BGR label
            out[j] = img if self.legacy_color else img[..., ::-1]
        return out

    def _read_clip_native(self, row: int, H: int, W: int, threads: int):
        """One C call decodes the whole clip; None → caller falls back to cv2."""
        from .. import native

        if self.legacy_color or not native.decode_available():
            return None
        entries = self.table[row]  # (F, 2) of (offset, length)
        parts = []
        offs = np.zeros(len(entries), np.int64)
        lens = np.zeros(len(entries), np.int64)
        pos = 0
        for j, (off, length) in enumerate(entries):
            if off < 0 or length <= 0:
                continue
            parts.append(os.pread(self.fd, int(length), int(off)))
            offs[j] = pos
            lens[j] = int(length)
            pos += int(length)
        return native.decode_jpeg_bank(
            b"".join(parts), offs, lens, H, W, threads=threads
        )

    def close(self):
        try:
            os.close(self.fd)
        except OSError:
            pass
