#!/usr/bin/env python
"""Decompose the NON-video portion of the int8-resident serving step.

The video tower accounts for ~14.5 ms of the 16.4 ms step @256 clips
(scripts/perf_int8_stages.py + the patch-major stem).  This times the rest —
the candidates for the next optimization round:

  featurize     fused IMU featurization (Pallas window kernel), raw counts in
  fusion        fuse_with_tokens: IMU encoder + cross-attention + classifier
  proj          video feature -> token projection GEMM
  nonvideo_all  featurize + proj + fusion chained (what the step pays
                outside the tower)

Shapes are the flagship serving shape (batch 256, 16×224² clips, 200×6 IMU).
Run ON the TPU: python scripts/perf_nonvideo.py [batch=256]
"""
import json
import sys
import time
from functools import partial
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def log(m):
    print(m, file=sys.stderr, flush=True)


def main():
    import jax
    import jax.numpy as jnp

    from __graft_entry__ import _flagship_config
    from tpuhar.models.crossmodal import FusionClassifier
    from tpuhar.ops.fused_window import featurize_windows_auto

    batch = int(sys.argv[1]) if len(sys.argv) > 1 else 256
    cfg = _flagship_config()
    d = cfg.data
    T = d.video_frames_per_window
    model = FusionClassifier(cfg)

    npr = np.random.default_rng(0)
    imu_raw = jax.device_put(
        npr.normal(0, 8000, (batch, d.imu_window_size, d.imu_channels)).astype(
            np.float32
        )
    )

    # init on host CPU (flax init executes the forward)
    with jax.default_device(jax.devices("cpu")[0]):
        feat_ex = featurize_windows_auto(
            np.zeros((1, d.imu_window_size, d.imu_channels), np.float32),
            kernel_size=d.median_filter_kernel, normalize=d.normalize_imu,
            racc=d.Racc, rgyro=d.Rgyro,
        )
        tok_ex = np.zeros((1, T, cfg.model.video_d_model), np.float32)
        variables = jax.jit(
            lambda k, i, t: model.init(
                k, i, t, train=False, method=FusionClassifier.fuse_with_tokens
            )
        )(jax.random.PRNGKey(0), np.asarray(feat_ex), tok_ex)

    imu_feat = jax.device_put(
        npr.normal(0, 1, (batch,) + np.asarray(feat_ex).shape[1:]).astype(
            np.float32
        )
    )
    tokens = jax.device_put(
        npr.normal(0, 1, (batch, T, cfg.model.video_d_model)).astype(np.float32)
    )
    # projection input: backbone feature width (tpu_cnn widths[-1] = 512)
    fw = 512
    feats = jax.device_put(
        npr.normal(0, 1, (batch, T, fw)).astype(np.float32)
    )
    proj_k = jax.device_put(
        npr.normal(0, 0.02, (fw, cfg.model.video_d_model)).astype(np.float32)
    )
    proj_b = jax.device_put(np.zeros((cfg.model.video_d_model,), np.float32))
    vdev = jax.device_put(variables)

    def v_featurize(x):
        return featurize_windows_auto(
            x, kernel_size=d.median_filter_kernel, normalize=d.normalize_imu,
            racc=d.Racc, rgyro=d.Rgyro,
        )

    def v_fusion(x):
        logits, fused = model.apply(
            vdev, x, tokens, train=False,
            method=FusionClassifier.fuse_with_tokens,
        )
        return logits

    def v_proj(x):
        return x @ proj_k + proj_b

    def v_all(x):
        imu = v_featurize(x)
        tok = feats @ proj_k + proj_b
        logits, fused = model.apply(
            vdev, imu, tok, train=False,
            method=FusionClassifier.fuse_with_tokens,
        )
        return logits

    results = {}
    for name, (fwd, x0) in {
        "featurize": (v_featurize, imu_raw),
        "fusion": (v_fusion, imu_feat),
        "proj": (v_proj, feats),
        "nonvideo_all": (v_all, imu_raw),
    }.items():
        results[name] = _time_variant(name, fwd, x0)

    print(json.dumps(
        {"bench": "nonvideo_decompose", "batch": batch, "ms": results}))


def _time_variant(name, fwd, x0):
    import jax
    import jax.numpy as jnp

    @partial(jax.jit, static_argnames=("kk",))
    def chained(x, kk: int):
        def body(i, carry):
            cur, acc = carry
            y = fwd(cur)
            delta = jnp.sum(y.astype(jnp.float32)) * 1e-20
            return cur + delta.astype(cur.dtype), acc + delta

        _, acc = jax.lax.fori_loop(0, kk, body, (x, jnp.float32(0)))
        return acc

    def run(kk):
        t0 = time.perf_counter()
        float(np.asarray(chained(x0, kk)))
        return time.perf_counter() - t0

    log(f"compiling {name} ...")
    try:
        run(1); run(13)
        t1 = min(run(1) for _ in range(2))
        tk = min(run(13) for _ in range(2))
        ms = (tk - t1) / 12 * 1e3
    except Exception as e:
        log(f"  {name}: FAILED {type(e).__name__}: {str(e)[:200]}")
        return None
    log(f"  {name}: {ms:.2f} ms/step")
    return round(ms, 3)


if __name__ == "__main__":
    main()


