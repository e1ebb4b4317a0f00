#!/usr/bin/env python
"""Perf sweep for the fused-inference flagship: batch sizes × backbones.

Writes one line per variant to stderr and a JSON summary to stdout.
Usage: python scripts/perf_sweep.py [variant ...]
  variant = backbone:batch, e.g. resnet18:512 videomae_small:256
"""
import json
import sys
import time

import numpy as np


def log(m):
    print(m, file=sys.stderr, flush=True)


def measure(backbone: str, batch: int, iters: int = 10):
    """Chained in-jit loop timing — see bench.py for why plain block_until_ready
    timing is unreliable over the remote-TPU tunnel."""
    from functools import partial

    import jax
    import jax.numpy as jnp

    sys.path.insert(0, ".")
    from __graft_entry__ import _build_forward, _flagship_config

    cfg = _flagship_config()
    cfg.model.video_backbone = backbone
    fn, (imu_ex, video_ex) = _build_forward(cfg, batch)
    npr = np.random.default_rng(0)
    imu = jax.device_put(npr.normal(0, 8000, size=imu_ex.shape).astype(np.float32))
    video = jax.device_put((npr.random(video_ex.shape) * 255).astype(np.uint8))

    @partial(jax.jit, static_argnames=("k",))
    def chained(imu, video, k: int):
        def body(i, carry):
            cur_imu, acc = carry
            out = fn(cur_imu, jnp.roll(video, i, axis=0))
            delta = jnp.sum(out["logits"]) * 1e-12
            return cur_imu + delta, acc + delta

        _, acc = jax.lax.fori_loop(0, k, body, (imu, jnp.float32(0)))
        return acc

    def run(k):
        t0 = time.perf_counter()
        float(np.asarray(chained(imu, video, k)))
        return time.perf_counter() - t0

    t0 = time.perf_counter()
    run(1)
    compile_s = time.perf_counter() - t0
    run(iters)
    t1 = min(run(1) for _ in range(2))
    tk = min(run(iters) for _ in range(2))
    step = (tk - t1) / (iters - 1)
    thr = batch / step
    log(
        f"{backbone}:{batch}  {thr:8.0f} inf/s  step {step * 1e3:7.2f} ms  "
        f"(compile {compile_s:.0f}s)"
    )
    return {"backbone": backbone, "batch": batch, "throughput": round(thr, 1),
            "step_ms": round(step * 1e3, 2)}


def main():
    variants = sys.argv[1:] or ["resnet18:512", "videomae_small:256"]
    results = []
    for v in variants:
        backbone, batch = v.split(":")
        try:
            results.append(measure(backbone, int(batch)))
        except Exception as e:
            log(f"{v} FAILED: {type(e).__name__}: {e}")
    print(json.dumps(results))


if __name__ == "__main__":
    main()
