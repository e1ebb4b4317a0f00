"""Microtest stem_gemm_u8's int8 pieces on TPU:
  A) bitcast+XOR+max input map vs numpy clip(u8-128,-127,127)
  B) int8 x int8 -> int32 dot_general vs numpy int32
  C) the same dot with the XOR-produced input
"""
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import numpy as np
import jax
import jax.numpy as jnp

print("devices:", jax.devices())
npr = np.random.default_rng(0)

u8 = (npr.random((1024, 768)) * 256).astype(np.uint8)
w = (npr.integers(-127, 128, size=(768, 256))).astype(np.int8)

# A) input map
def xor_map(x):
    y = jax.lax.bitcast_convert_type(x, jnp.int8) ^ jnp.int8(-128)
    return jnp.maximum(y, jnp.int8(-127))

a_dev = np.asarray(jax.jit(xor_map)(jnp.asarray(u8)))
a_ref = np.clip(u8.astype(np.int32) - 128, -127, 127).astype(np.int8)
print("A xor-map mismatches:", int((a_dev != a_ref).sum()), "/", a_ref.size)

# B) int8 dot with exact inputs
x8 = a_ref
def dot_i8(x, w):
    return jax.lax.dot_general(
        x, w, (((1,), (0,)), ((), ())), preferred_element_type=jnp.int32
    )
b_dev = np.asarray(jax.jit(dot_i8)(jnp.asarray(x8), jnp.asarray(w)))
b_ref = x8.astype(np.int32) @ w.astype(np.int32)
bad = (b_dev != b_ref)
print("B int8 dot mismatches:", int(bad.sum()), "/", b_ref.size)
if bad.any():
    i, j = np.argwhere(bad)[0]
    print("  first bad:", i, j, "dev", b_dev[i, j], "ref", b_ref[i, j])
    print("  max |delta|:", int(np.abs(b_dev.astype(np.int64) - b_ref).max()))

# C) fused: xor map + dot in one jit
def fused(xu8, w):
    return dot_i8(xor_map(xu8), w)
c_dev = np.asarray(jax.jit(fused)(jnp.asarray(u8), jnp.asarray(w)))
print("C fused mismatches:", int((c_dev != b_ref).sum()), "/", b_ref.size)
if (c_dev != b_ref).any():
    i, j = np.argwhere(c_dev != b_ref)[0]
    print("  first bad:", i, j, "dev", c_dev[i, j], "ref", b_ref[i, j],
          "max|d|", int(np.abs(c_dev.astype(np.int64) - b_ref).max()))
