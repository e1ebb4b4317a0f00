"""Native (C) runtime components, built on demand with the system toolchain.

Currently: a batched libjpeg-turbo frame decoder for the serving hot loop
(``decode.c``; used by ``tpuhar.data.frames.FrameBankReader``).  The build is a
single ``cc -O2 -shared`` invocation cached next to the source; everything
degrades gracefully to the pure-Python/cv2 paths when a compiler or libjpeg is
unavailable (``decode_available()`` gates call sites).
"""
from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from pathlib import Path
from typing import Optional

import numpy as np

_DIR = Path(__file__).resolve().parent
_SRC = _DIR / "decode.c"
_SO = _DIR / "libtpuhar_decode.so"
_lock = threading.Lock()
_lib = None
_build_failed = False


def _build() -> bool:
    """Compile decode.c → libtpuhar_decode.so (idempotent, mtime-cached).

    Compiles to a per-pid temp name and ``os.rename``s into place so concurrent
    worker processes on a fresh checkout (``data.decode_processes``/Grain) never
    observe a truncated .so — rename is atomic within a filesystem, and a loser
    just overwrites the winner with identical bytes.
    """
    if _SO.exists() and _SO.stat().st_mtime >= _SRC.stat().st_mtime:
        return True
    cc = os.environ.get("CC", "cc")
    tmp = _SO.with_suffix(f".{os.getpid()}.tmp.so")
    cmd = [
        cc, "-O2", "-shared", "-fPIC", str(_SRC), "-o", str(tmp),
        "-ljpeg", "-lpthread",
    ]
    try:
        r = subprocess.run(cmd, capture_output=True, text=True, timeout=120)
        if r.returncode != 0 or not tmp.exists():
            return False
        os.rename(tmp, _SO)
    except (OSError, subprocess.TimeoutExpired):
        return False
    finally:
        try:
            tmp.unlink(missing_ok=True)
        except OSError:
            pass
    return _SO.exists()


def _load():
    global _lib, _build_failed
    with _lock:
        if _lib is not None or _build_failed:
            return _lib
        if not _build():
            _build_failed = True
            return None
        try:
            lib = ctypes.CDLL(str(_SO))
        except OSError:
            _build_failed = True
            return None
        lib.tpuhar_decode_jpeg_bank.restype = ctypes.c_int
        lib.tpuhar_decode_jpeg_bank.argtypes = [
            ctypes.c_char_p,                  # blob
            ctypes.POINTER(ctypes.c_longlong),  # offsets
            ctypes.POINTER(ctypes.c_longlong),  # lengths
            ctypes.c_int,                     # n
            ctypes.POINTER(ctypes.c_ubyte),   # out
            ctypes.c_int, ctypes.c_int,       # H, W
            ctypes.c_int,                     # threads
        ]
        _lib = lib
        return _lib


def decode_available() -> bool:
    """True when the native decoder built/loaded (compiler + libjpeg present)."""
    return _load() is not None


def decode_jpeg_bank(
    blob: bytes,
    offsets: np.ndarray,
    lengths: np.ndarray,
    H: int,
    W: int,
    *,
    out: Optional[np.ndarray] = None,
    threads: int = 1,
) -> Optional[np.ndarray]:
    """Decode ``n`` JPEGs at ``(offsets[i], lengths[i])`` in ``blob`` → (n,H,W,3) RGB.

    ``lengths[i] <= 0`` marks a gap (left black).  Returns None when any image
    fails or has non-(H,W,3) dimensions — the caller must fall back to the cv2
    path (which also resizes).  The GIL is released for the whole batch; pass
    ``threads > 1`` on multi-core hosts.
    """
    lib = _load()
    if lib is None:
        return None
    offs = np.ascontiguousarray(offsets, dtype=np.int64)
    lens = np.ascontiguousarray(lengths, dtype=np.int64)
    n = int(len(offs))
    if out is None:
        out = np.zeros((n, H, W, 3), dtype=np.uint8)
    else:
        # hard check, not assert: the C side writes n*H*W*3 bytes unconditionally
        # and a smaller buffer under `python -O` would be heap corruption
        if out.shape != (n, H, W, 3) or out.dtype != np.uint8:
            raise ValueError(
                f"out must be uint8 {(n, H, W, 3)}, got {out.dtype} {out.shape}"
            )
        if not out.flags.c_contiguous:
            raise ValueError("out must be C-contiguous")
        out[lens <= 0] = 0
    rc = lib.tpuhar_decode_jpeg_bank(
        blob,
        offs.ctypes.data_as(ctypes.POINTER(ctypes.c_longlong)),
        lens.ctypes.data_as(ctypes.POINTER(ctypes.c_longlong)),
        n,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_ubyte)),
        int(H), int(W), int(threads),
    )
    if rc != 0:
        return None
    return out
