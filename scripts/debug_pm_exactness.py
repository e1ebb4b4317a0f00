"""Bisect the patch-major stem exactness failure seen in queueJ's
validate_int8_ood run (int8pm logit maxdelta ~10, id-acc 23-33% on the fresh
hard checkpoints, while every NHWC path agrees).

Ladder (each step isolates one variable):
  1. random-init full-size TPUVideoCNN, 224x224 frames, CPU       (shape?)
  2. same on TPU                                                  (device?)
  3. real class-0 hard checkpoint tree, TPU                       (tree values?)
  4. through the full _int8_path-style fusion wrapper             (wrapper?)

Usage: python scripts/debug_pm_exactness.py [--tpu] [--ckpt]
"""
import argparse
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import numpy as np

p = argparse.ArgumentParser()
p.add_argument("--tpu", action="store_true")
p.add_argument("--ckpt", action="store_true", help="use the real hard class-0 checkpoint")
p.add_argument("--batch", type=int, default=8)
p.add_argument("--hw", type=int, default=224)
args = p.parse_args()

import jax

if not args.tpu:
    jax.config.update("jax_platforms", "cpu")
import jax.numpy as jnp

print("devices:", jax.devices())

import tpuhar.ops.quant as Q
from tpuhar.models.video import TPUVideoCNN
from tpuhar.ops.stem import to_patch_major
from tpuhar.ops.video import IMAGENET_MEAN, IMAGENET_STD

npr = np.random.default_rng(0)

if args.ckpt:
    from pathlib import Path

    from tpuhar.config import Config
    from tpuhar.train.checkpoint import restore_checkpoint
    from tpuhar.train.factory import build_fusion_task

    root = Path("outputs/bench_accuracy_hard/tpu_cnn")
    cfgp = root / "checkpoints" / "config.json"
    cfg = Config.load(cfgp) if cfgp.exists() else Config()
    ckpt_dir = root / "checkpoints" / "ood_loo_0"
    cand = sorted(ckpt_dir.glob("last.msgpack")) or sorted(ckpt_dir.glob("*.msgpack"))
    print("checkpoint:", cand[-1])
    import copy

    loo_cfg = copy.deepcopy(cfg)
    loo_cfg.model.num_classes = 5
    with jax.default_device(jax.devices("cpu")[0]):
        task = build_fusion_task(loo_cfg, 1, jax.random.PRNGKey(0), batch_size=8)
    state, _ = restore_checkpoint(cand[-1], task.state)
    venc = state.params["video_encoder"]
    vstats = state.batch_stats["video_encoder"]
    bb, bbs = venc["backbone"], vstats["backbone"]
else:
    net = TPUVideoCNN(dtype=jnp.float32)
    with jax.default_device(jax.devices("cpu")[0]):
        variables = jax.jit(lambda k, x: net.init(k, x, train=False))(
            jax.random.PRNGKey(0), jnp.zeros((1, 32, 32, 3), jnp.float32)
        )
    bb, bbs = variables["params"], variables["batch_stats"]

calib = npr.normal(0, 1, size=(16, args.hw, args.hw, 3)).astype(np.float32)
with jax.default_device(jax.devices("cpu")[0]):
    stats = Q.calibrate_tpucnn(bb, bbs, calib)
    q = jax.device_get(
        Q.quantize_tpucnn(bb, bbs, stats, input_fold=(IMAGENET_MEAN, IMAGENET_STD))
    )
print("q[patch] =", q["patch"], " stem w_q", q["stem"]["w_q"].shape)

frames = (npr.random((args.batch, args.hw, args.hw, 3)) * 255).astype(np.uint8)
frames[0, :16, :16] = 0
col = to_patch_major(frames, q["patch"])
print("col", col.shape, col.dtype)

for name, fwd in [
    ("baseline", Q.quant_tpucnn_forward),
    ("resident", Q.quant_tpucnn_forward_resident),
]:
    jf = jax.jit(fwd, static_argnums=())
    y_nhwc = np.asarray(jax.jit(lambda f: fwd(q, f))(jnp.asarray(frames)))
    y_pm = np.asarray(jax.jit(lambda c: fwd(q, c))(jnp.asarray(col)))
    d = float(np.abs(y_nhwc - y_pm).max())
    rel = d / (float(np.abs(y_nhwc).max()) + 1e-9)
    print(f"{name}: maxdelta {d:.6e}  (rel {rel:.3e})  "
          f"{'OK' if d < 1e-3 else 'MISMATCH'}")
    if d >= 1e-3:
        # locate: compare stem outputs directly
        from tpuhar.ops.quant import _stem_patch_major

        stem_pm = np.asarray(jax.jit(lambda c: _stem_patch_major(q, c))(jnp.asarray(col)))
        x_q = jnp.clip(jnp.asarray(frames).astype(jnp.int16) - 128, -127, 127).astype(jnp.int8)
        from tpuhar.ops.quant import int8_conv
        import flax.linen as nn

        def stem_conv(xq):
            y = int8_conv(
                xq, q["stem"]["w_q"], jnp.float32(1.0), q["stem"]["w_scale"],
                strides=(q["patch"], q["patch"]), padding="VALID",
            ) + q["stem"]["bias"]
            return nn.relu(y)

        stem_c = np.asarray(jax.jit(stem_conv)(x_q))
        ds = float(np.abs(stem_pm - stem_c).max())
        print(f"  stem-only maxdelta {ds:.6e}")
        bad = np.unravel_index(np.abs(stem_pm - stem_c).argmax(), stem_c.shape)
        print(f"  worst at {bad}: pm={stem_pm[bad]:.4f} conv={stem_c[bad]:.4f}")
        sys.exit(1)
print("ALL OK")
