#!/usr/bin/env python
"""Validate + benchmark Pallas flash attention on the real TPU.

1. Numeric check: flash vs XLA attention on a padded 1568-token stream.
2. videomae_small flagship step time with/without flash.
"""
import sys
import time
from functools import partial

import numpy as np


def log(m):
    print(m, file=sys.stderr, flush=True)


def main():
    import jax
    import jax.numpy as jnp

    sys.path.insert(0, ".")
    from tpuhar.ops.attention import _reference_attention, flash_mha

    # --- numeric check -------------------------------------------------------------
    npr = np.random.default_rng(0)
    B, H, N, D = 2, 6, 1568, 64
    q = npr.normal(size=(B, H, N, D)).astype(np.float32)
    k = npr.normal(size=(B, H, N, D)).astype(np.float32)
    v = npr.normal(size=(B, H, N, D)).astype(np.float32)

    @jax.jit
    def both(q, k, v):
        return (
            flash_mha(q, k, v, use_flash=True),
            _reference_attention(q, k, v, 1.0 / np.sqrt(D)),
        )

    fl, ref = jax.device_get(both(q, k, v))
    err = np.abs(fl - ref).max()
    log(f"flash vs XLA attention maxdiff: {err:.2e}")
    assert err < 2e-2, "flash attention mismatch"

    # --- block sweep on the attention op alone (B=64 clips, videomae_small shape) --
    Ba = 64
    qa = npr.normal(size=(Ba, 6, N, D)).astype(np.float32)
    ka = npr.normal(size=(Ba, 6, N, D)).astype(np.float32)
    va = npr.normal(size=(Ba, 6, N, D)).astype(np.float32)
    combos = [("xla", None, None), ("flash", 512, 512), ("flash", 256, 256),
              ("flash", 128, 128), ("flash", 256, 128), ("flash", 128, 256),
              ("flash", 512, 256)]
    for kind, bq, bk in combos:
        @partial(jax.jit, static_argnames=("iters",))
        def chained_attn(q, k, v, iters: int, _bq=bq, _bk=bk, _kind=kind):
            def body(i, carry):
                cur, acc = carry
                if _kind == "xla":
                    out = _reference_attention(cur, k, v, 1.0 / np.sqrt(D))
                else:
                    out = flash_mha(cur, k, v, block_q=_bq, block_k=_bk)
                delta = jnp.sum(out[0, 0, 0]) * 1e-20
                return cur + delta, acc + delta

            _, acc = jax.lax.fori_loop(0, iters, body, (q, jnp.float32(0)))
            return acc

        def run(kk):
            t0 = time.perf_counter()
            float(np.asarray(chained_attn(qa, ka, va, kk)))
            return time.perf_counter() - t0

        try:
            run(1); run(8)
            t1 = min(run(1) for _ in range(2))
            t8 = min(run(8) for _ in range(2))
            dt = (t8 - t1) / 7 * 1e3
            log(f"attn {kind} bq={bq} bk={bk}: {dt:7.2f} ms")
        except Exception as e:
            log(f"attn {kind} bq={bq} bk={bk}: FAILED {type(e).__name__}: {str(e)[:100]}")

    # --- flagship timing with/without flash ---------------------------------------
    from __graft_entry__ import _build_forward, _flagship_config

    import os
    blocks = os.environ.get("FLASH_BLOCKS", "")
    batch = 64
    for use_flash in (False, True):
        cfg = _flagship_config()
        cfg.model.video_backbone = "videomae_small"
        cfg.model.use_flash_attention = use_flash
        if use_flash and blocks:
            cfg.model.flash_block_q, cfg.model.flash_block_k = (
                int(x) for x in blocks.split(","))
        fn, (imu_ex, video_ex) = _build_forward(cfg, batch)
        imu = jax.device_put(
            npr.normal(0, 8000, size=imu_ex.shape).astype(np.float32)
        )
        video = jax.device_put((npr.random(video_ex.shape) * 255).astype(np.uint8))

        @partial(jax.jit, static_argnames=("iters",))
        def chained(imu, video, iters: int):
            def body(i, carry):
                cur_imu, acc = carry
                vv = jnp.roll(video, i, axis=0)
                out = fn(cur_imu, vv)
                delta = jnp.sum(out["logits"]) * 1e-12
                return cur_imu + delta, acc + delta

            _, acc = jax.lax.fori_loop(0, iters, body, (imu, jnp.float32(0)))
            return acc

        def run(kk):
            t0 = time.perf_counter()
            float(np.asarray(chained(imu, video, kk)))
            return time.perf_counter() - t0

        run(1); run(8)
        t1 = min(run(1) for _ in range(2))
        t8 = min(run(8) for _ in range(2))
        step = (t8 - t1) / 7 * 1e3
        log(
            f"videomae_small flash={use_flash}: {step:8.2f} ms/step "
            f"({batch / step * 1e3:6.0f} inf/s)"
        )


if __name__ == "__main__":
    main()
