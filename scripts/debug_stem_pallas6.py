import sys
import numpy as np
sys.path.insert(0, ".")
def log(m): print(m, file=sys.stderr, flush=True)

import jax, jax.numpy as jnp
from jax.experimental import pallas as pl

M, K, c0, BM = 802816, 768, 256, 1568
npr = np.random.default_rng(0)
x2 = jax.device_put((npr.random((M, K)) * 255).astype(np.uint8).view(np.int8))
w = jax.device_put(np.clip(npr.normal(0, 40, (K, c0)), -127, 127).astype(np.int8))
sc = jax.device_put(np.random.rand(1, c0).astype(np.float32))

def try_one(name, fn, *args):
    try:
        out = np.asarray(jax.jit(fn)(*args))
        log(f"{name}: OK out={out.shape} sum={float(out.sum()):.3e}")
        return True
    except Exception as e:
        log(f"{name}: FAILED {type(e).__name__}: {str(e)[:200]}")
        return False

# a: int8 dot K=768
def ka(x_ref, w_ref, o_ref):
    xi = x_ref[...] ^ jnp.int8(-128)
    o_ref[...] = jax.lax.dot_general(xi, w_ref[...], (((1,), (0,)), ((), ())), preferred_element_type=jnp.int32)
try_one("a int8 dot", lambda x, w: pl.pallas_call(ka, grid=(M//BM,),
    in_specs=[pl.BlockSpec((BM, K), lambda m: (m, 0)), pl.BlockSpec((K, c0), lambda m: (0, 0))],
    out_specs=pl.BlockSpec((BM, c0), lambda m: (m, 0)),
    out_shape=jax.ShapeDtypeStruct((M, c0), jnp.int32))(x, w), x2, w)

# b: int8->bf16 cast dot
def kb(x_ref, w_ref, o_ref):
    xb = (x_ref[...] ^ jnp.int8(-128)).astype(jnp.bfloat16)
    o_ref[...] = jax.lax.dot_general(xb, w_ref[...].astype(jnp.bfloat16), (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32)
try_one("b bf16 dot", lambda x, w: pl.pallas_call(kb, grid=(M//BM,),
    in_specs=[pl.BlockSpec((BM, K), lambda m: (m, 0)), pl.BlockSpec((K, c0), lambda m: (0, 0))],
    out_specs=pl.BlockSpec((BM, c0), lambda m: (m, 0)),
    out_shape=jax.ShapeDtypeStruct((M, c0), jnp.float32))(x, w), x2, w)

# c: b + (1,c0) operand + epilogue quantize
def kc(x_ref, w_ref, s_ref, o_ref):
    xb = (x_ref[...] ^ jnp.int8(-128)).astype(jnp.bfloat16)
    acc = jax.lax.dot_general(xb, w_ref[...].astype(jnp.bfloat16), (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32)
    y = jnp.maximum(acc * s_ref[0], 0.0)
    o_ref[...] = jnp.clip(jnp.round(y * 20.0), -127, 127).astype(jnp.int8)
try_one("c epilogue int8 out", lambda x, w, s: pl.pallas_call(kc, grid=(M//BM,),
    in_specs=[pl.BlockSpec((BM, K), lambda m: (m, 0)), pl.BlockSpec((K, c0), lambda m: (0, 0)), pl.BlockSpec((1, c0), lambda m: (0, 0))],
    out_specs=pl.BlockSpec((BM, c0), lambda m: (m, 0)),
    out_shape=jax.ShapeDtypeStruct((M, c0), jnp.int8))(x, w, s), x2, w, sc)
