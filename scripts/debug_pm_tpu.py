"""Which TPU stem lowering is wrong — the patch-major GEMM or the int8 conv?

Computes the exact int32 stem on the host (numpy) and compares both TPU
lowerings against it, at several shapes. Follow-up to debug_pm_exactness.py
(CPU exact at every shape; TPU pm-vs-conv maxdelta 6.7 at 224²).
"""
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import numpy as np
import jax
import jax.numpy as jnp
import flax.linen as nn

print("devices:", jax.devices())

import tpuhar.ops.quant as Q
from tpuhar.models.video import TPUVideoCNN
from tpuhar.ops.stem import to_patch_major, stem_gemm_u8
from tpuhar.ops.video import IMAGENET_MEAN, IMAGENET_STD

npr = np.random.default_rng(0)
net = TPUVideoCNN(dtype=jnp.float32)
with jax.default_device(jax.devices("cpu")[0]):
    variables = jax.jit(lambda k, x: net.init(k, x, train=False))(
        jax.random.PRNGKey(0), jnp.zeros((1, 32, 32, 3), jnp.float32)
    )
calib = npr.normal(0, 1, size=(16, 64, 64, 3)).astype(np.float32)
with jax.default_device(jax.devices("cpu")[0]):
    stats = Q.calibrate_tpucnn(variables["params"], variables["batch_stats"], calib)
    q = jax.device_get(
        Q.quantize_tpucnn(
            variables["params"], variables["batch_stats"], stats,
            input_fold=(IMAGENET_MEAN, IMAGENET_STD),
        )
    )
w_q = np.asarray(q["stem"]["w_q"])          # (16,16,3,C0) int8
w_scale = np.asarray(q["stem"]["w_scale"])  # (C0,) f32
bias = np.asarray(q["stem"]["bias"])        # (C0,)
patch = q["patch"]
wm = w_q.reshape(-1, w_q.shape[-1]).astype(np.int32)  # (768, C0)

def host_exact(col_u8):
    x = np.clip(col_u8.astype(np.int32) - 128, -127, 127)  # (B,Hp,Wp,768)
    acc = x.reshape(-1, x.shape[-1]) @ wm                    # int32 exact
    y = acc.astype(np.float64) * w_scale + bias
    return np.maximum(y, 0.0).reshape(x.shape[:-1] + (w_q.shape[-1],)).astype(np.float32)

def tpu_pm(col):
    return stem_gemm_u8(
        col, jnp.asarray(wm, jnp.int8).reshape(-1, w_q.shape[-1]),
        jnp.asarray(w_scale), jnp.asarray(bias),
        sub=128, clip_lo=-127, relu=True, out_dtype=jnp.float32,
        mxu_dtype=jnp.int8,
    )

def tpu_conv(frames):
    x_q = jnp.clip(frames.astype(jnp.int16) - 128, -127, 127).astype(jnp.int8)
    y = Q.int8_conv(
        x_q, jnp.asarray(w_q), jnp.float32(1.0), jnp.asarray(w_scale),
        strides=(patch, patch), padding="VALID",
    ) + jnp.asarray(bias)
    return nn.relu(y)

for B, HW in [(4, 64), (8, 224), (64, 224), (2, 224)]:
    frames = (npr.random((B, HW, HW, 3)) * 255).astype(np.uint8)
    col = to_patch_major(frames, patch)
    ref = host_exact(col)
    y_pm = np.asarray(jax.jit(tpu_pm)(jnp.asarray(col)))
    y_cv = np.asarray(jax.jit(tpu_conv)(jnp.asarray(frames)))
    d_pm = float(np.abs(y_pm - ref).max())
    d_cv = float(np.abs(y_cv - ref).max())
    n_pm = int((np.abs(y_pm - ref) > 1e-3).sum())
    n_cv = int((np.abs(y_cv - ref) > 1e-3).sum())
    print(f"B={B:3d} HW={HW}: pm-vs-host {d_pm:.4e} ({n_pm}/{ref.size} bad)   "
          f"conv-vs-host {d_cv:.4e} ({n_cv}/{ref.size} bad)")
