"""Candidate input-map fixes, each verified INSIDE the fused dot_general jit
(the standalone ops pass; the fusion is what miscompiles)."""
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import numpy as np
import jax
import jax.numpy as jnp

print("devices:", jax.devices())
npr = np.random.default_rng(0)
u8 = (npr.random((1024, 768)) * 256).astype(np.uint8)
# make sure every byte value appears
u8[:256, 0] = np.arange(256, dtype=np.uint8)
w = (npr.integers(-127, 128, size=(768, 256))).astype(np.int8)

x_ref = np.clip(u8.astype(np.int32) - 128, -127, 127)
ref = x_ref @ w.astype(np.int32)

def dot(x, w):
    return jax.lax.dot_general(
        x, w, (((1,), (0,)), ((), ())), preferred_element_type=jnp.int32
    )

maps = {
    "int16 clip": lambda x: jnp.clip(x.astype(jnp.int16) - 128, -127, 127).astype(jnp.int8),
    "u8max-xor-bitcast": lambda x: jax.lax.bitcast_convert_type(
        jnp.maximum(x, jnp.uint8(1)) ^ jnp.uint8(128), jnp.int8),
    "u8max-sub-bitcast": lambda x: jax.lax.bitcast_convert_type(
        jnp.maximum(x, jnp.uint8(1)) - jnp.uint8(128), jnp.int8),
    "xor-bitcast-s8max (old)": lambda x: jnp.maximum(
        jax.lax.bitcast_convert_type(x, jnp.int8) ^ jnp.int8(-128), jnp.int8(-127)),
}
import time
for name, m in maps.items():
    f = jax.jit(lambda x, w: dot(m(x), w))
    dev = np.asarray(f(jnp.asarray(u8), jnp.asarray(w)))
    bad = int((dev != ref).sum())
    # quick timing: 100 chained iterations inside one jit
    print(f"{name:28s} mismatches {bad:8d} / {ref.size}")
