"""Which 1-byte op miscompiles on the TPU backend?"""
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import numpy as np
import jax
import jax.numpy as jnp

print("devices:", jax.devices(), jax.__version__)
npr = np.random.default_rng(0)
u8 = np.arange(256, dtype=np.uint8).reshape(1, 256).repeat(8, 0)

def check(name, fn, ref):
    dev = np.asarray(jax.jit(fn)(jnp.asarray(u8)))
    bad = (dev.astype(np.int64) != ref.astype(np.int64))
    print(f"{name:36s} mismatches {int(bad.sum()):6d}", end="")
    if bad.any():
        i, j = np.argwhere(bad)[0]
        print(f"   first: u8={u8[i,j]} dev={dev[i,j]} ref={ref[i,j]}")
    else:
        print("   OK")

view_i8 = u8.view(np.int8)
c128 = np.clip(u8.astype(np.int32) - 128, -127, 127).astype(np.int8)

check("bitcast u8->s8", lambda x: jax.lax.bitcast_convert_type(x, jnp.int8), view_i8)
check("xor s8 (^ -128) after bitcast", lambda x: jax.lax.bitcast_convert_type(x, jnp.int8) ^ jnp.int8(-128), (view_i8 ^ np.int8(-128)))
check("xor u8 (^128) then bitcast", lambda x: jax.lax.bitcast_convert_type(x ^ jnp.uint8(128), jnp.int8), (u8 ^ np.uint8(128)).view(np.int8))
check("sub u8 (-128) then bitcast", lambda x: jax.lax.bitcast_convert_type(x - jnp.uint8(128), jnp.int8), (u8 - np.uint8(128)).view(np.int8))
check("max s8 after bitcast", lambda x: jnp.maximum(jax.lax.bitcast_convert_type(x, jnp.int8), jnp.int8(-127)), np.maximum(view_i8, np.int8(-127)))
check("full xor map", lambda x: jnp.maximum(jax.lax.bitcast_convert_type(x, jnp.int8) ^ jnp.int8(-128), jnp.int8(-127)), c128)
check("int16 clip path", lambda x: jnp.clip(x.astype(jnp.int16) - 128, -127, 127).astype(jnp.int8), c128)
check("astype s8 of (u8^128)", lambda x: (x ^ jnp.uint8(128)).astype(jnp.int8), None if False else (u8 ^ np.uint8(128)).astype(np.int64).astype(np.int8))
