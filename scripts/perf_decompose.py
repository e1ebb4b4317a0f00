#!/usr/bin/env python
"""Decompose the flagship inference step: where do the 135 ms go?

Times, separately jitted at the bench batch size:
  full      raw IMU + uint8 video → logits + OOD
  video     normalized video → video tokens (backbone only)
  norm      uint8 → normalized f32 clip
  imu+fuse  featurize + IMU encoder + cross-attention + head (dummy video tokens)
"""
import sys
import time

import numpy as np


def log(m):
    print(m, file=sys.stderr, flush=True)


def timeit(fn, args, iters=20, warmup=3):
    import jax

    out = fn(*args)
    jax.block_until_ready(out)
    for _ in range(warmup):
        out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / iters * 1e3


def main():
    import jax
    import jax.numpy as jnp

    sys.path.insert(0, ".")
    from __graft_entry__ import _build_forward, _flagship_config
    from tpuhar.models.video import VideoEncoder
    from tpuhar.ops.video import normalize_clip

    batch = int(sys.argv[1]) if len(sys.argv) > 1 else 256
    cfg = _flagship_config()
    npr = np.random.default_rng(0)
    d = cfg.data
    H, W = d.video_resize
    T = d.video_frames_per_window

    imu = jax.device_put(
        npr.normal(0, 8000, size=(batch, d.imu_window_size, d.imu_channels)).astype(
            np.float32
        )
    )
    video_u8 = jax.device_put((npr.random((batch, T, H, W, 3)) * 255).astype(np.uint8))

    # full
    fn, _ = _build_forward(cfg, batch)
    t_full = timeit(jax.jit(fn), (imu, video_u8))
    log(f"full step           : {t_full:8.2f} ms  ({batch / t_full * 1e3:7.0f} inf/s)")

    # normalize only
    t_norm = timeit(jax.jit(lambda v: normalize_clip(v).sum()), (video_u8,))
    log(f"uint8→norm clip     : {t_norm:8.2f} ms")

    # video backbone only (on normalized f32)
    venc = VideoEncoder(
        backbone=cfg.model.video_backbone,
        video_d_model=cfg.model.video_d_model,
        dtype=jnp.bfloat16,
    )
    video_f32 = jax.jit(normalize_clip)(video_u8)
    with jax.default_device(jax.devices("cpu")[0]):
        vvars = jax.jit(venc.init)(jax.random.PRNGKey(0), video_f32[:1])
    t_video = timeit(
        jax.jit(lambda v: venc.apply(vvars, v, train=False)[0].sum()), (video_f32,)
    )
    log(f"video backbone      : {t_video:8.2f} ms")

    # video backbone fed uint8 (normalize fused in)
    t_video_u8 = timeit(
        jax.jit(lambda v: venc.apply(vvars, normalize_clip(v), train=False)[0].sum()),
        (video_u8,),
    )
    log(f"norm+video fused    : {t_video_u8:8.2f} ms")
    log(f"imu+fusion (residual): {t_full - t_video_u8:8.2f} ms (by subtraction)")


if __name__ == "__main__":
    main()
