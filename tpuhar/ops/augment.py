"""On-device IMU augmentation: jitter and time-warp.

The reference *declares* ``use_augmentation`` / ``jitter_strength`` /
``time_warp_strength`` (``configs/config.py:67-70``) but contains no augmentation code
anywhere — the knobs are dead.  Here they work: augmentations are pure jnp transforms
applied inside the jitted train step (zero host cost, new randomness every step via
the step PRNG key).

- **jitter**: additive Gaussian noise scaled by ``jitter_strength`` (signals are
  z-scored, so the strength is in units of channel std).
- **time_warp**: a smooth random monotone reparameterization of the time axis built
  from a low-frequency cumulative displacement, applied by linear interpolation —
  static shapes, fully vectorized.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp


def jitter(x: jax.Array, key, strength: float) -> jax.Array:
    """Additive Gaussian noise on ``(B, C, T)`` windows."""
    if strength <= 0:
        return x
    return x + strength * jax.random.normal(key, x.shape, x.dtype)


def time_warp(x: jax.Array, key, strength: float, knots: int = 4) -> jax.Array:
    """Smooth monotone time warp of ``(B, C, T)`` windows.

    A per-sample displacement field is built from ``knots`` Gaussian offsets,
    upsampled smoothly to T, scaled so the maximum shift is ``strength · T / 4``,
    and applied with linear interpolation (edge-clamped).
    """
    if strength <= 0:
        return x
    B, C, T = x.shape
    offsets = jax.random.normal(key, (B, knots), x.dtype)  # (B, knots)
    # smooth upsample knots → T via linear interpolation of the knot curve
    knot_pos = jnp.linspace(0.0, T - 1.0, knots)
    t = jnp.arange(T, dtype=x.dtype)
    # (B, T): piecewise-linear displacement curve
    disp = jax.vmap(lambda o: jnp.interp(t, knot_pos, o))(offsets)
    max_shift = strength * T / 4.0
    disp = disp / (jnp.max(jnp.abs(disp), axis=1, keepdims=True) + 1e-8) * max_shift
    # zero displacement at the endpoints keeps the window span fixed
    taper = jnp.sin(jnp.pi * t / (T - 1.0))
    src = jnp.clip(t[None, :] + disp * taper[None, :], 0.0, T - 1.0)  # (B, T)

    lo = jnp.floor(src).astype(jnp.int32)
    hi = jnp.minimum(lo + 1, T - 1)
    frac = (src - lo)[:, None, :]  # (B, 1, T)
    x_lo = jnp.take_along_axis(x, lo[:, None, :].repeat(C, axis=1), axis=2)
    x_hi = jnp.take_along_axis(x, hi[:, None, :].repeat(C, axis=1), axis=2)
    return x_lo * (1.0 - frac) + x_hi * frac


def augment_imu(x: jax.Array, key, config) -> jax.Array:
    """Apply the configured augmentation chain to ``(B, C, T)`` windows."""
    d = config.data
    if not d.use_augmentation:
        return x
    k1, k2 = jax.random.split(key)
    x = time_warp(x, k1, float(d.time_warp_strength))
    x = jitter(x, k2, float(d.jitter_strength))
    return x
