"""Multi-process clip decoding for multi-core hosts.

``BatchLoader``'s in-process decode (a per-batch thread pool) is the right choice on
this 1-core container, but on real multi-core hosts JPEG/mp4 decode is CPU-bound and
partially GIL-serialized — a process pool scales it with cores. This module provides
a long-lived spawn-context pool whose workers import only numpy/cv2/pandas (no JAX:
``tpuhar.data`` is deliberately JAX-free at import time), open their own
``FrameBankReader`` per process (pread file descriptors don't survive pickling), and
receive plain-dict task specs.

Enable via ``data.decode_processes > 0`` (config) or ``BatchLoader(...,
decode_processes=N)``. Reference counterpart: torch ``DataLoader(num_workers=...)``
(``src/data/datasets.py:398-434``) — same role, but scoped to the video decode (the
IMU side is a memory-mapped bank gather that needs no parallelism).
"""
from __future__ import annotations

import multiprocessing as mp
from concurrent import futures
from typing import Dict, List, Optional, Tuple

import numpy as np

# per-worker-process reader cache: {(bin_path, idx_path): FrameBankReader}
_READERS: Dict = {}


def _get_reader(bin_path: str, idx_path: str):
    key = (bin_path, idx_path)
    reader = _READERS.get(key)
    if reader is None:
        from .frames import FrameBankReader

        reader = FrameBankReader(bin_path, idx_path)
        _READERS[key] = reader
    return reader


def decode_task(spec: Dict) -> Tuple[int, Optional[np.ndarray]]:
    """Decode one clip in a worker. ``spec`` is picklable plain data:

    - ``kind="bank"``: cached JPEG frames — needs bin_path/idx_path/row/resize_hw
    - ``kind="video"``: online mp4 decode — needs path/start_frame/num_frames/
      window_seconds/fallback_fps/resize_hw
    - ``kind="black"``: missing video → ``None`` (the batch buffer is already zero)
    """
    i = int(spec["i"])
    kind = spec["kind"]
    if kind == "black":
        return i, None
    if kind == "bank":
        reader = _get_reader(spec["bin_path"], spec["idx_path"])
        return i, reader.read_clip(int(spec["row"]), tuple(spec["resize_hw"]))
    from .loader import decode_clip

    return i, decode_clip(
        spec["path"],
        int(spec["start_frame"]),
        num_frames=int(spec["num_frames"]),
        window_seconds=float(spec["window_seconds"]),
        fallback_fps=float(spec["fallback_fps"]),
        resize_hw=tuple(spec["resize_hw"]),
    )


class ProcessDecodePool:
    """Long-lived spawn-context process pool for clip decoding.

    Spawn (not fork): the parent typically holds live JAX/XLA runtime threads, which
    do not survive fork safely. Workers import ``tpuhar.data`` only (~1 s startup,
    paid once per loader lifetime, amortized over every epoch).
    """

    def __init__(self, workers: int):
        self.workers = int(workers)
        self._pool = futures.ProcessPoolExecutor(
            max_workers=self.workers, mp_context=mp.get_context("spawn")
        )

    def decode_batch(self, specs: List[Dict], out: np.ndarray) -> None:
        """Fill ``out[i]`` for each spec (skips black clips — buffer is pre-zeroed)."""
        for i, clip in self._pool.map(decode_task, specs, chunksize=1):
            if clip is not None:
                out[i] = clip

    def close(self) -> None:
        self._pool.shutdown(wait=False, cancel_futures=True)

    def __del__(self):  # best-effort cleanup
        try:
            self.close()
        except Exception:
            pass
