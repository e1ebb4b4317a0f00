import sys
import numpy as np
sys.path.insert(0, ".")
def log(m): print(m, file=sys.stderr, flush=True)
import jax, jax.numpy as jnp
from jax.experimental import pallas as pl

M, K, c0, BM = 802816, 768, 256, 1568
npr = np.random.default_rng(0)
u8 = (npr.random((M // 196, 14, 14, K)) * 255).astype(np.uint8)
x2 = jax.device_put(u8.reshape(M, K).view(np.int8))
x4u = jax.device_put(u8)
w = jax.device_put(np.clip(npr.normal(0, 40, (K, c0)), -127, 127).astype(np.int8))
sc = jax.device_put(np.random.rand(1, c0).astype(np.float32))
bi = jax.device_put(np.random.rand(1, c0).astype(np.float32))

def try_one(name, fn, *args):
    try:
        out = np.asarray(jax.jit(fn)(*args))
        log(f"{name}: OK out={out.shape} sum={float(out.sum()):.3e}")
        return True
    except Exception as e:
        log(f"{name}: FAILED {type(e).__name__}: {str(e)[:200]}")
        return False

# d: int8 dot + int32->f32 cast + scale,bias refs + quantized out
def kd(x_ref, w_ref, s_ref, b_ref, o_ref):
    xi = jnp.maximum(x_ref[...] ^ jnp.int8(-128), jnp.int8(-127))
    acc = jax.lax.dot_general(xi, w_ref[...], (((1,), (0,)), ((), ())), preferred_element_type=jnp.int32)
    y = acc.astype(jnp.float32) * s_ref[0] + b_ref[0]
    y = jnp.maximum(y, 0.0)
    o_ref[...] = jnp.clip(jnp.round(y * 20.0), -127, 127).astype(jnp.int8)
try_one("d full int8 kernel", lambda x, w, s, b: pl.pallas_call(kd, grid=(M//BM,),
    in_specs=[pl.BlockSpec((BM, K), lambda m: (m, 0)), pl.BlockSpec((K, c0), lambda m: (0, 0)),
              pl.BlockSpec((1, c0), lambda m: (0, 0)), pl.BlockSpec((1, c0), lambda m: (0, 0))],
    out_specs=pl.BlockSpec((BM, c0), lambda m: (m, 0)),
    out_shape=jax.ShapeDtypeStruct((M, c0), jnp.int8))(x, w, s, b), x2, w, sc, bi)

# e: the actual wrapper (4D uint8 input, bitcast inside jit)
from tpuhar.ops.stem import stem_gemm_u8_pallas
try_one("e stem_gemm_u8_pallas", lambda x: stem_gemm_u8_pallas(
    x, w, sc.reshape(-1), bi.reshape(-1), out_scale=0.05, out_dtype=jnp.int8, mxu_dtype=jnp.int8), x4u)
