import json, sys, time
from functools import partial
import numpy as np
sys.path.insert(0, ".")
def log(m): print(m, file=sys.stderr, flush=True)
import jax, jax.numpy as jnp
from jax.experimental import pallas as pl
M, K, c0 = 802816, 768, 256
npr = np.random.default_rng(0)
col = jax.device_put((npr.random((M, K)) * 255).astype(np.uint8))
w = jax.device_put(np.clip(npr.normal(0, 40, (K, c0)), -127, 127).astype(np.int8))
sc = jax.device_put(np.random.rand(1, c0).astype(np.float32))
bi = jax.device_put(np.random.rand(1, c0).astype(np.float32))

def mk(BM, mxu, outdt, quant):
    def kern(x_ref, w_ref, s_ref, b_ref, o_ref):
        xi = x_ref[...] ^ jnp.int8(-128)
        if mxu == "i8":
            acc = jax.lax.dot_general(xi, w_ref[...], (((1,), (0,)), ((), ())), preferred_element_type=jnp.int32).astype(jnp.float32)
        else:
            acc = jax.lax.dot_general(xi.astype(jnp.bfloat16), w_ref[...].astype(jnp.bfloat16), (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32)
        y = jnp.maximum(acc * s_ref[0] + b_ref[0], 0.0)
        if quant:
            y = jnp.clip(jnp.round(y * 20.0), -127, 127)
        o_ref[...] = y.astype(o_ref.dtype)
    def f(x):
        x2 = jax.lax.bitcast_convert_type(x, jnp.int8)
        return pl.pallas_call(kern, grid=(M//BM,),
            in_specs=[pl.BlockSpec((BM, K), lambda m: (m, 0)), pl.BlockSpec((K, c0), lambda m: (0, 0)),
                      pl.BlockSpec((1, c0), lambda m: (0, 0)), pl.BlockSpec((1, c0), lambda m: (0, 0))],
            out_specs=pl.BlockSpec((BM, c0), lambda m: (m, 0)),
            out_shape=jax.ShapeDtypeStruct((M, c0), outdt))(x2, w, sc, bi)
    return f

variants = {
  "i8mxu_q8out_bm1568": mk(1568, "i8", jnp.int8, True),
  "i8mxu_q8out_bm3136": mk(3136, "i8", jnp.int8, True),
  "i8mxu_q8out_bm6272": mk(6272, "i8", jnp.int8, True),
  "bf16mxu_q8out_bm1568": mk(1568, "bf16", jnp.int8, True),
  "i8mxu_bf16out_bm1568": mk(1568, "i8", jnp.bfloat16, False),
  "bf16mxu_bf16out_bm1568": mk(1568, "bf16", jnp.bfloat16, False),
}
results = {}
for name, fwd in variants.items():
    @partial(jax.jit, static_argnames=("kk",))
    def chained(x, kk: int, fwd=fwd):
        def body(i, carry):
            cur, acc = carry
            y = fwd(cur)
            delta = jnp.sum(y.astype(jnp.float32)) * 1e-20
            return cur + delta.astype(jnp.uint8), acc + delta
        _, acc = jax.lax.fori_loop(0, kk, body, (x, jnp.float32(0)))
        return acc
    def run(kk):
        t0 = time.perf_counter(); float(np.asarray(chained(col, kk))); return time.perf_counter() - t0
    log(f"compiling {name} ...")
    try:
        run(1); run(13)
        t1 = min(run(1) for _ in range(2)); tk = min(run(13) for _ in range(2))
        ms = (tk - t1) / 12 * 1e3
    except Exception as e:
        log(f"  {name}: FAILED {type(e).__name__}: {str(e)[:160]}"); results[name]=None; continue
    results[name] = round(ms, 3); log(f"  {name}: {ms:.2f} ms/step")
print(json.dumps({"bench": "stem_pallas2d_final", "ms": results}))
