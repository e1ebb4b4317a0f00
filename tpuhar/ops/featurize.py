"""On-device IMU featurization: unit conversion, median filter, z-score, windowing,
Fourier resampling, and STFT spectrograms — all pure ``jnp`` with static shapes.

This replaces the reference's host-side scipy pipeline (``src/data/preprocessing.py``:
``load_imu_data`` unit conversion :171-183, ``signal.medfilt`` loop :204-213, z-score
:215-219, ``create_imu_windows`` :223-243, ``signal.resample`` :192-202) with vectorized
XLA ops so featurization fuses into the same program as the encoder.  Numerical contracts
match scipy/numpy exactly (golden-tested in ``tests/test_featurize.py``); a fused Pallas
kernel for the serving path lives in ``tpuhar/ops/fused_window.py``.

Convention: sequences/windows are time-major ``(T, C)`` float32 (the reference's on-disk
layout); model-facing helpers transpose to ``(C, T)`` at the end.
"""
from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp


# ---------------------------------------------------------------------------------
# Unit conversion (preprocessing.py:178-183)
# ---------------------------------------------------------------------------------
def raw_to_physical(raw: jax.Array, racc: float = 16384.0, rgyro: float = 16.4) -> jax.Array:
    """Convert raw 6-channel IMU counts to physical units: acc/Racc [g], gyro/Rgyro [deg/s].

    Accepts ``(..., T, 6)``; columns 0:3 are accel, 3:6 gyro.
    """
    scale = jnp.concatenate(
        [jnp.full((3,), 1.0 / racc), jnp.full((3,), 1.0 / rgyro)]
    ).astype(raw.dtype)
    return raw * scale


# ---------------------------------------------------------------------------------
# Median filter (scipy.signal.medfilt semantics: zero-padded edges)
# ---------------------------------------------------------------------------------
def median_filter_time(x: jax.Array, kernel_size: int = 5) -> jax.Array:
    """Per-channel median filter along the time axis of ``(..., T, C)``.

    Matches ``scipy.signal.medfilt(x[:, ch], k)`` (preprocessing.py:210-213): the signal
    is implicitly zero-padded by k//2 on both ends.  Even kernels are bumped to the next
    odd size, as the reference does (preprocessing.py:208-209).

    Implementation: stack the k time-shifted views on a new leading axis and take the
    median via a full sort — for the small k used here (5) this is k log k VPU work per
    element and fuses cleanly; the Pallas serving kernel uses a sorting network instead.
    """
    if kernel_size <= 1:
        return x
    k = kernel_size + 1 if kernel_size % 2 == 0 else kernel_size
    pad = k // 2
    time_axis = x.ndim - 2
    pad_widths = [(0, 0)] * x.ndim
    pad_widths[time_axis] = (pad, pad)
    xp = jnp.pad(x, pad_widths)
    T = x.shape[time_axis]
    taps = jnp.stack(
        [jax.lax.slice_in_dim(xp, i, i + T, axis=time_axis) for i in range(k)], axis=0
    )
    return jnp.sort(taps, axis=0)[k // 2]


# ---------------------------------------------------------------------------------
# Z-score normalization (preprocessing.py:215-219)
# ---------------------------------------------------------------------------------
def zscore_time(x: jax.Array, eps: float = 1e-8) -> jax.Array:
    """Per-channel z-score over the time axis of ``(..., T, C)`` (population std + eps)."""
    time_axis = x.ndim - 2
    mean = jnp.mean(x, axis=time_axis, keepdims=True)
    std = jnp.std(x, axis=time_axis, keepdims=True) + eps
    return (x - mean) / std


def masked_zscore_time(x: jax.Array, length: jax.Array, eps: float = 1e-8) -> jax.Array:
    """Z-score of a zero-padded ``(T, C)`` sequence using only the first ``length`` rows.

    Enables on-device processing of variable-length sequences padded to a static bucket:
    the statistics match ``zscore_time(x[:length])`` exactly, while shapes stay static.
    Rows at or beyond ``length`` come out as ``-mean/std`` times zero-input, i.e. they are
    normalized padding and must be masked/cropped by the caller.
    """
    T = x.shape[-2]
    mask = (jnp.arange(T) < length)[:, None].astype(x.dtype)
    n = jnp.maximum(length.astype(x.dtype), 1.0)
    mean = jnp.sum(x * mask, axis=-2, keepdims=True) / n
    var = jnp.sum(((x - mean) * mask) ** 2, axis=-2, keepdims=True) / n
    std = jnp.sqrt(var) + eps
    return (x - mean) / std


# ---------------------------------------------------------------------------------
# Sliding windows (preprocessing.py:223-243)
# ---------------------------------------------------------------------------------
def num_windows(length: int, window: int, stride: int) -> int:
    """Number of full windows over a length-``length`` sequence (0 if too short)."""
    if length < window:
        return 0
    return (length - window) // stride + 1


def window_slice(x: jax.Array, window: int, stride: int) -> jax.Array:
    """Slice ``(T, C)`` into ``(num_windows, window, C)`` full windows.

    Static-shape equivalent of the reference's Python loop (preprocessing.py:240-242);
    sequences shorter than ``window`` must be padded first (see ``pad_to_window``).
    """
    T = x.shape[0]
    n = num_windows(T, window, stride)
    starts = jnp.arange(n) * stride
    idx = starts[:, None] + jnp.arange(window)[None, :]
    return x[idx]


def window_slice_padded(
    x: jax.Array, length: jax.Array, window: int, stride: int
) -> Tuple[jax.Array, jax.Array]:
    """Windows of a zero-padded sequence with runtime valid length.

    Returns ``(windows (max_n, window, C), n_valid)`` where ``max_n`` is the static
    maximum for the padded buffer and ``n_valid`` counts windows fully inside
    ``max(length, window)`` — i.e. a short-but-padded sequence yields exactly one
    window, matching ``pad_short_sequences=True`` (preprocessing.py:230-238).
    """
    T = x.shape[0]
    max_n = num_windows(T, window, stride)
    starts = jnp.arange(max_n) * stride
    idx = starts[:, None] + jnp.arange(window)[None, :]
    windows = x[idx]
    eff_len = jnp.maximum(length, window)
    n_valid = jnp.where(
        length > 0, (eff_len - window) // stride + 1, 0
    ).astype(jnp.int32)
    return windows, n_valid


def pad_to_window(x, window: int):
    """Zero-pad a too-short ``(T, C)`` array to ``(window, C)`` (host-side helper)."""
    import numpy as np

    if x.shape[0] >= window:
        return x
    pad = np.zeros((window - x.shape[0], x.shape[1]), dtype=x.dtype)
    return np.vstack([x, pad])


# ---------------------------------------------------------------------------------
# Fourier resampling (scipy.signal.resample semantics; preprocessing.py:192-202)
# ---------------------------------------------------------------------------------
def fourier_resample(x: jax.Array, n_target: int) -> jax.Array:
    """FFT-based resampling of a real ``(T, C)`` signal to ``(n_target, C)``.

    Reproduces ``scipy.signal.resample`` for real input, including the Nyquist-bin
    adjustment for even lengths.
    """
    Nx = x.shape[0]
    X = jnp.fft.rfft(x, axis=0)
    N = min(n_target, Nx)
    nyq = N // 2 + 1
    Y = jnp.zeros((n_target // 2 + 1,) + x.shape[1:], dtype=X.dtype)
    Y = Y.at[:nyq].set(X[:nyq])
    if N % 2 == 0:
        if n_target < Nx:
            Y = Y.at[N // 2].multiply(2.0)
        elif n_target > Nx:
            Y = Y.at[N // 2].multiply(0.5)
    y = jnp.fft.irfft(Y, n=n_target, axis=0)
    return (y * (n_target / Nx)).astype(x.dtype)


# ---------------------------------------------------------------------------------
# Full per-sequence pipeline (device equivalent of preprocess_imu + create_imu_windows)
# ---------------------------------------------------------------------------------
@functools.partial(
    jax.jit, static_argnames=("window", "stride", "kernel_size", "normalize")
)
def preprocess_sequence(
    raw: jax.Array,
    length: jax.Array,
    *,
    window: int,
    stride: int,
    kernel_size: int = 5,
    normalize: bool = True,
    racc: float = 16384.0,
    rgyro: float = 16.4,
) -> Tuple[jax.Array, jax.Array]:
    """Raw padded sequence → preprocessed windows, fully on device.

    ``raw`` is ``(T_bucket, 6)`` float32 raw counts zero-padded past ``length``; output
    is ``(max_windows, window, 6)`` float32 plus the valid-window count.  Matches the
    reference chain load_imu_data → preprocess_imu → create_imu_windows
    (preprocessing.py:156-243): unit conversion, medfilt(k), per-sequence z-score over
    the valid region, then stride-``stride`` windows.

    Note the zero-padding interacts with medfilt exactly as scipy's implicit zero
    padding does at the sequence end, so in-range outputs are bit-identical.
    """
    x = raw_to_physical(raw, racc, rgyro)
    x = median_filter_time(x, kernel_size)
    if normalize:
        x = masked_zscore_time(x, length)
        # re-zero the padding so windows of short sequences see zeros, matching the
        # reference which pads *after* normalization (preprocessing.py:232-238)
        T = x.shape[0]
        mask = (jnp.arange(T) < length)[:, None].astype(x.dtype)
        x = x * mask
    return window_slice_padded(x, length, window, stride)


# ---------------------------------------------------------------------------------
# STFT spectrogram featurizer (north-star; absent from the reference)
# ---------------------------------------------------------------------------------
def stft_featurize(
    x: jax.Array,
    nperseg: int = 64,
    hop: int = 32,
    *,
    log_eps: float = 1e-6,
) -> jax.Array:
    """Per-channel log-magnitude spectrogram of ``(..., T, C)``.

    Returns ``(..., C, F, nperseg//2 + 1)`` where ``F`` is the number of Hann-windowed
    frames.  This is the north-star "IMU transformer over STFT/spectrogram features"
    input (BASELINE.json configs); frames become tokens, bins become the patch features.
    """
    T = x.shape[-2]
    n_frames = (T - nperseg) // hop + 1
    starts = jnp.arange(n_frames) * hop
    idx = starts[:, None] + jnp.arange(nperseg)[None, :]
    # (..., F, nperseg, C)
    frames = jnp.take(x, idx.reshape(-1), axis=-2).reshape(
        x.shape[:-2] + (n_frames, nperseg, x.shape[-1])
    )
    win = jnp.hanning(nperseg).astype(x.dtype)[:, None]
    spec = jnp.fft.rfft(frames * win, axis=-2)  # (..., F, bins, C)
    logmag = jnp.log(jnp.abs(spec) + log_eps)
    # → (..., C, F, bins)
    return jnp.moveaxis(logmag, -1, -3).astype(x.dtype)


# ---------------------------------------------------------------------------------
# Serving-path featurization: batched raw windows → model input
# ---------------------------------------------------------------------------------
def featurize_windows(
    raw_windows: jax.Array,
    *,
    kernel_size: int = 5,
    normalize: bool = True,
    racc: float = 16384.0,
    rgyro: float = 16.4,
    already_physical: bool = False,
) -> jax.Array:
    """Fused per-window featurization for inference: ``(B, T, C)`` raw → ``(B, C, T)``.

    The offline path normalizes per *sequence*; at serving time only the window exists,
    so statistics are per window.  This is the jnp reference for the Pallas fused
    kernel (``tpuhar/ops/fused_window.py``).
    """
    x = raw_windows if already_physical else raw_to_physical(raw_windows, racc, rgyro)
    x = median_filter_time(x, kernel_size)
    if normalize:
        x = zscore_time(x)
    return jnp.swapaxes(x, -1, -2)
