#!/usr/bin/env python
"""Round 3 bisect: block rank. 5D blocks SIGABRT the toolchain; try 2D/3D/4D."""
import sys
import numpy as np

sys.path.insert(0, ".")


def log(m):
    print(m, file=sys.stderr, flush=True)


def main():
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl

    B, Hp, patch, Wp, K1, c0 = 64, 14, 16, 14, 48, 256
    BF = 8
    G = BF * Hp  # 112 patch-rows per block
    npr = np.random.default_rng(0)
    u8 = (npr.random((B * Hp, patch, Wp, K1)) * 255).astype(np.uint8)
    x4 = jax.device_put(u8.view(np.int8))
    x3 = jax.device_put(u8.reshape(B * Hp, patch, Wp * K1).view(np.int8))
    x2 = jax.device_put(u8.reshape(B * Hp * patch, Wp * K1).view(np.int8))
    w2 = jax.device_put(
        npr.normal(0, 1, (K1, c0)).astype(np.float32).astype(jnp.bfloat16)
    )

    def try_one(name, fn, *args):
        try:
            out = np.asarray(jax.jit(fn)(*args))
            log(f"{name}: OK out={out.shape} sum={float(out.sum()):.3e}")
            return True
        except Exception as e:
            log(f"{name}: FAILED {type(e).__name__}: {str(e)[:250]}")
            return False

    # w4 sanity: 2D int8 block, xor, sum
    def kw4(x_ref, o_ref):
        xi = x_ref[...] ^ jnp.int8(-128)
        o_ref[...] = jnp.sum(xi.astype(jnp.int32), axis=1, keepdims=True)

    try_one("w4 2D xor+sum", lambda x: pl.pallas_call(
        kw4, grid=((B * Hp * patch) // (G * patch),),
        in_specs=[pl.BlockSpec((G * patch, Wp * K1), lambda b: (b, 0))],
        out_specs=pl.BlockSpec((G * patch, 1), lambda b: (b, 0)),
        out_shape=jax.ShapeDtypeStruct((B * Hp * patch, 1), jnp.int32),
    )(x), x2)

    # w1: 4D block (G,1,Wp,K1), r in grid, merge-reshape, sum
    def kw1(x_ref, o_ref):
        xi = x_ref[...] ^ jnp.int8(-128)
        xi = xi.reshape(G * Wp, K1)
        o_ref[...] = jnp.sum(xi.astype(jnp.int32), axis=1, keepdims=True)

    try_one("w1 4D slice-by-grid + merge", lambda x: pl.pallas_call(
        kw1, grid=((B * Hp) // G, patch),
        in_specs=[pl.BlockSpec((G, 1, Wp, K1), lambda g, r: (g, r, 0, 0))],
        out_specs=pl.BlockSpec((G * Wp, 1), lambda g, r: (g, 0)),
        out_shape=jax.ShapeDtypeStruct((B * Hp * Wp, 1), jnp.int32),
    )(x), x4)

    # w2: w1 + K=48 bf16 dot with out-ref accumulation over r-grid
    def kw2(x_ref, w_ref, o_ref):
        r = pl.program_id(1)

        @pl.when(r == 0)
        def _():
            o_ref[...] = jnp.zeros_like(o_ref)

        xi = (x_ref[...] ^ jnp.int8(-128)).reshape(G * Wp, K1)
        xb = jnp.maximum(xi, jnp.int8(-127)).astype(jnp.bfloat16)
        o_ref[...] += jax.lax.dot_general(
            xb, w_ref[...], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )

    try_one("w2 4D + K=48 dot accum", lambda x, w: pl.pallas_call(
        kw2, grid=((B * Hp) // G, patch),
        in_specs=[
            pl.BlockSpec((G, 1, Wp, K1), lambda g, r: (g, r, 0, 0)),
            pl.BlockSpec((K1, c0), lambda g, r: (0, 0)),
        ],
        out_specs=pl.BlockSpec((G * Wp, c0), lambda g, r: (g, 0)),
        out_shape=jax.ShapeDtypeStruct((B * Hp * Wp, c0), jnp.float32),
    )(x, w), x4, w2)

    # w3: 3D block (G,1,672) + lane-split reshape to (G*Wp, K1)
    def kw3(x_ref, o_ref):
        xi = x_ref[...] ^ jnp.int8(-128)
        xi = xi.reshape(G, Wp, K1).reshape(G * Wp, K1)
        o_ref[...] = jnp.sum(xi.astype(jnp.int32), axis=1, keepdims=True)

    try_one("w3 3D + lane-split reshape", lambda x: pl.pallas_call(
        kw3, grid=((B * Hp) // G, patch),
        in_specs=[pl.BlockSpec((G, 1, Wp * K1), lambda g, r: (g, r, 0))],
        out_specs=pl.BlockSpec((G * Wp, 1), lambda g, r: (g, 0)),
        out_shape=jax.ShapeDtypeStruct((B * Hp * Wp, 1), jnp.int32),
    )(x), x3)


if __name__ == "__main__":
    main()
