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
bi = jax.device_put(np.random.rand(1, c0).astype(np.float32))
def try_one(name, fn, *args):
    try:
        out = np.asarray(jax.jit(fn)(*args))
        log(f"{name}: OK sum={float(out.sum()):.3e}")
    except Exception as e:
        log(f"{name}: FAILED {type(e).__name__}: {str(e)[:160]}")
def build(kern, outdt):
    return lambda *a: pl.pallas_call(kern, grid=(M//BM,),
        in_specs=[pl.BlockSpec((BM, K), lambda m: (m, 0)), pl.BlockSpec((K, c0), lambda m: (0, 0)),
                  pl.BlockSpec((1, c0), lambda m: (0, 0)), pl.BlockSpec((1, c0), lambda m: (0, 0))],
        out_specs=pl.BlockSpec((BM, c0), lambda m: (m, 0)),
        out_shape=jax.ShapeDtypeStruct((M, c0), outdt))(*a)

# d1: int8 dot, NO int8-maximum, int32->f32 + epilogue
def kd1(x_ref, w_ref, s_ref, b_ref, o_ref):
    xi = x_ref[...] ^ jnp.int8(-128)
    acc = jax.lax.dot_general(xi, w_ref[...], (((1,), (0,)), ((), ())), preferred_element_type=jnp.int32)
    y = jnp.maximum(acc.astype(jnp.float32) * s_ref[0] + b_ref[0], 0.0)
    o_ref[...] = jnp.clip(jnp.round(y * 20.0), -127, 127).astype(jnp.int8)
try_one("d1 no-int8-max", build(kd1, jnp.int8), x2, w, sc, bi)

# d2: int8-maximum + bf16 dot
def kd2(x_ref, w_ref, s_ref, b_ref, o_ref):
    xi = jnp.maximum(x_ref[...] ^ jnp.int8(-128), jnp.int8(-127)).astype(jnp.bfloat16)
    acc = jax.lax.dot_general(xi, w_ref[...].astype(jnp.bfloat16), (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32)
    y = jnp.maximum(acc * s_ref[0] + b_ref[0], 0.0)
    o_ref[...] = jnp.clip(jnp.round(y * 20.0), -127, 127).astype(jnp.int8)
try_one("d2 int8max+bf16dot", build(kd2, jnp.int8), x2, w, sc, bi)
