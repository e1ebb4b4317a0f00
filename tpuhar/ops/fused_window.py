"""Pallas TPU kernel: fused per-window IMU featurization.

One VMEM-resident pass over each raw window doing what the reference does in three
host-side scipy/numpy passes (``preprocessing.py:171-219``): raw-count → physical-unit
scaling, median-filter(5) along time, per-window per-channel z-score — emitting the
``(B, C, T)`` tensor the encoders consume.  The jnp reference implementation is
``tpuhar.ops.featurize.featurize_windows``; this kernel is bit-compatible with it (same
zero-padded medfilt edges, same ``std + 1e-8`` normalization) and is golden-tested
against it in interpret mode.

Layout strategy: windows are viewed as ``(B*C, T)`` rows — each row one channel's time
series — padded to a lane multiple (256 for T=250).  Time-shifts for the median filter
are then lane-axis slices of the block; the median-of-5 is a 6-op min/max network on
the VPU; mean/variance are lane reductions.  Rows are tiled in sublane-aligned chunks.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _med3(a, b, c):
    return jnp.maximum(jnp.minimum(a, b), jnp.minimum(jnp.maximum(a, b), c))


def _med5(a, b, c, d, e):
    """Median of 5 via min/max network (no sort lowering needed)."""
    f = jnp.maximum(jnp.minimum(a, b), jnp.minimum(c, d))
    g = jnp.minimum(jnp.maximum(a, b), jnp.maximum(c, d))
    return _med3(e, f, g)


def _fused_kernel(
    raw_ref, scale_ref, out_ref, *, t_valid: int, normalize: bool, apply_medfilt: bool
):
    """One block: rows = (batch·channel) slices, cols = padded time axis.

    ``raw_ref``/(out_ref): (ROWS, T_pad) f32; ``scale_ref``: (ROWS, 1) per-row unit
    scale (1/Racc or 1/Rgyro depending on the row's channel).
    """
    x = raw_ref[:] * scale_ref[:]
    rows, t_pad = x.shape

    # zero out the padded tail so it behaves like scipy's implicit zero padding
    col = jax.lax.broadcasted_iota(jnp.int32, (rows, t_pad), 1)
    valid = col < t_valid
    x = jnp.where(valid, x, 0.0)

    if apply_medfilt:
        # median filter k=5 with zero-padded edges: shifts along the lane axis
        zero_col = jnp.zeros((rows, 1), x.dtype)

        def shift(arr, k):
            if k < 0:  # left-shift: value from the right, zero-fill at the end
                return jnp.concatenate(
                    [arr[:, -k:], jnp.tile(zero_col, (1, -k))], axis=1
                )
            if k > 0:
                return jnp.concatenate(
                    [jnp.tile(zero_col, (1, k)), arr[:, :-k]], axis=1
                )
            return arr

        m = _med5(shift(x, -2), shift(x, -1), x, shift(x, 1), shift(x, 2))
        m = jnp.where(valid, m, 0.0)
    else:
        m = x

    if normalize:
        n = float(t_valid)
        mean = jnp.sum(m, axis=1, keepdims=True) / n
        centered = jnp.where(valid, m - mean, 0.0)
        var = jnp.sum(centered * centered, axis=1, keepdims=True) / n
        inv = 1.0 / (jnp.sqrt(var) + 1e-8)
        out = centered * inv
    else:
        out = m
    out_ref[:] = jnp.where(valid, out, 0.0)


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


@functools.partial(
    jax.jit,
    static_argnames=("kernel_size", "normalize", "racc", "rgyro", "interpret"),
)
def featurize_windows_pallas(
    raw_windows: jax.Array,
    *,
    kernel_size: int = 5,
    normalize: bool = True,
    racc: float = 16384.0,
    rgyro: float = 16.4,
    interpret: bool = False,
) -> jax.Array:
    """Fused serving-path featurization: ``(B, T, C)`` raw counts → ``(B, C, T)``.

    Drop-in replacement for ``featurize.featurize_windows`` with ``kernel_size=5``
    (the only shipped setting, ``configs/config.py:65``).
    """
    if kernel_size not in (1, 4, 5):  # 4 bumps to 5 like the reference
        raise NotImplementedError("Pallas kernel supports k in {1,4,5}")
    B, T, C = raw_windows.shape
    t_pad = _round_up(T, 128)
    rows = B * C

    # (B, T, C) → (B, C, T) rows-of-channels layout
    x = jnp.swapaxes(raw_windows, 1, 2).reshape(rows, T)
    if t_pad != T:
        x = jnp.pad(x, ((0, 0), (0, t_pad - T)))

    # per-row unit scale: rows cycle through channels fastest
    ch_scale = jnp.concatenate(
        [jnp.full((3,), 1.0 / racc), jnp.full((3,), 1.0 / rgyro)]
    ).astype(jnp.float32)
    scale = jnp.tile(ch_scale, (B,)).reshape(rows, 1)

    row_tile = min(_round_up(rows, 8), 512)
    rows_pad = _round_up(rows, row_tile)
    if rows_pad != rows:
        x = jnp.pad(x, ((0, rows_pad - rows), (0, 0)))
        scale = jnp.pad(scale, ((0, rows_pad - rows), (0, 0)))

    kernel = functools.partial(
        _fused_kernel,
        t_valid=T,
        normalize=normalize,
        apply_medfilt=kernel_size > 1,
    )

    out = pl.pallas_call(
        kernel,
        grid=(rows_pad // row_tile,),
        in_specs=[
            pl.BlockSpec((row_tile, t_pad), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((row_tile, 1), lambda i: (i, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (row_tile, t_pad), lambda i: (i, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((rows_pad, t_pad), jnp.float32),
        interpret=interpret,
    )(x, scale)

    return out[:rows, :T].reshape(B, C, T)


def _auto_platform() -> str:
    """Platform the next jitted computation will actually run on.

    ``jax.devices()[0].platform`` alone is wrong inside a
    ``jax.default_device(cpu)`` scope in a TPU process: the computation compiles
    for CPU but the Pallas TPU kernel would still be selected, failing with
    "Only interpret mode is supported on CPU backend" (hit by serving_quant's
    CPU-side recalibration scoring in a live-tunnel process).  The explicit
    default-device config wins when set.
    """
    dev = jax.config.jax_default_device
    if dev is not None:  # Device object, or a platform string in newer jax
        return dev if isinstance(dev, str) else dev.platform
    return jax.devices()[0].platform


def featurize_windows_auto(
    raw_windows: jax.Array,
    *,
    kernel_size: int = 5,
    normalize: bool = True,
    racc: float = 16384.0,
    rgyro: float = 16.4,
) -> jax.Array:
    """Serving featurization with automatic backend dispatch.

    On TPU, runs the fused Pallas kernel (hardware-validated bit-compatible with the
    jnp path, maxdiff < 1e-6); elsewhere — and for kernel sizes the Pallas kernel
    doesn't cover — falls back to the XLA-fused jnp implementation.
    """
    platform = _auto_platform()
    if platform == "tpu" and kernel_size in (1, 4, 5):
        return featurize_windows_pallas(
            raw_windows,
            kernel_size=kernel_size,
            normalize=normalize,
            racc=racc,
            rgyro=rgyro,
        )
    from .featurize import featurize_windows

    return featurize_windows(
        raw_windows,
        kernel_size=kernel_size,
        normalize=normalize,
        racc=racc,
        rgyro=rgyro,
    )
