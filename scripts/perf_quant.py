#!/usr/bin/env python
"""Measure the int8-quantized flagship vs the bf16 one (chained-loop timing)."""
import sys
import time
from functools import partial

import numpy as np


def log(m):
    print(m, file=sys.stderr, flush=True)


def chained_time(fn, imu, video, iters=10):
    import jax
    import jax.numpy as jnp

    @partial(jax.jit, static_argnames=("k",))
    def chained(imu, video, k: int):
        def body(i, carry):
            cur_imu, acc = carry
            v = jnp.roll(video, i, axis=0)
            out = fn(cur_imu, v)
            delta = jnp.sum(out["logits"]) * 1e-12
            return cur_imu + delta, acc + delta

        _, acc = jax.lax.fori_loop(0, k, body, (imu, jnp.float32(0)))
        return acc

    def run(k):
        t0 = time.perf_counter()
        val = chained(imu, video, k)
        float(np.asarray(val))
        return time.perf_counter() - t0

    run(1); run(iters)
    t1 = min(run(1) for _ in range(2))
    tk = min(run(iters) for _ in range(2))
    return (tk - t1) / (iters - 1) * 1e3


def main():
    import jax

    sys.path.insert(0, ".")
    from __graft_entry__ import _build_forward, _flagship_config
    from tpuhar.serving_quant import build_quantized_forward

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
    video_np = (npr.random((batch, T, H, W, 3)) * 255).astype(np.uint8)
    video = jax.device_put(video_np)

    fn, _ = _build_forward(cfg, batch)

    # reuse the f32 variables for the quantized tower (captured in fn's closure is
    # inaccessible — rebuild variables the same way)
    import jax.numpy as jnp
    from tpuhar.models.crossmodal import FusionClassifier
    from tpuhar.ops.featurize import featurize_windows
    from tpuhar.ops.video import normalize_clip

    model = FusionClassifier(cfg)
    with jax.default_device(jax.devices("cpu")[0]):
        variables = jax.jit(
            lambda k, i, v: model.init(
                k, featurize_windows(i), normalize_clip(v)
            )
        )(
            jax.random.PRNGKey(0),
            np.zeros((1, d.imu_window_size, d.imu_channels), np.float32),
            np.zeros((1, 2, 32, 32, 3), np.uint8),
        )
    log("building quantized forward (calibration)...")
    qfn = build_quantized_forward(cfg, variables, video_np[:2])

    t_bf16 = chained_time(fn, imu, video)
    log(f"bf16 flagship : {t_bf16:8.2f} ms/step  ({batch / t_bf16 * 1e3:7.0f} inf/s)")
    t_int8 = chained_time(qfn, imu, video)
    log(f"int8 flagship : {t_int8:8.2f} ms/step  ({batch / t_int8 * 1e3:7.0f} inf/s)  "
        f"speedup {t_bf16 / t_int8:.2f}x")


if __name__ == "__main__":
    main()
