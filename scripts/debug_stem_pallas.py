#!/usr/bin/env python
"""Bisect what Mosaic rejects in ops/stem.py on the real TPU (plain jit, no loops)."""
import sys
import numpy as np

sys.path.insert(0, ".")


def log(m):
    print(m, file=sys.stderr, flush=True)


def main():
    import jax
    import jax.numpy as jnp
    from functools import partial
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    B, Hp, patch, Wp, K1, c0 = 64, 14, 16, 14, 48, 256
    BF = 8
    npr = np.random.default_rng(0)
    x5 = jax.device_put(
        (npr.random((B, Hp, patch, Wp, K1)) * 255).astype(np.uint8)
    )
    w3 = jax.device_put(npr.normal(0, 1, (patch, K1, c0)).astype(np.float32).astype(jnp.bfloat16))

    def try_one(name, fn, *args):
        try:
            out = jax.jit(fn)(*args)
            out = np.asarray(out)
            log(f"{name}: OK out={out.shape} sum={float(out.sum()):.3e}")
        except Exception as e:
            log(f"{name}: FAILED {type(e).__name__}: {str(e)[:300]}")

    # t1: 5D block copy -> f32 sum per block
    def k1(x_ref, o_ref):
        o_ref[...] = jnp.sum(x_ref[...].astype(jnp.float32), axis=(1, 2, 3, 4))[:, None]

    def t1(x):
        return pl.pallas_call(
            k1, grid=(B // BF,),
            in_specs=[pl.BlockSpec((BF, Hp, patch, Wp, K1), lambda b: (b, 0, 0, 0, 0))],
            out_specs=pl.BlockSpec((BF, 1), lambda b: (b, 0)),
            out_shape=jax.ShapeDtypeStruct((B, 1), jnp.float32),
        )(x)

    try_one("t1 5D-block copy/sum", t1, x5)

    # t2: fragment slice + reshape + cast
    def k2(x_ref, o_ref):
        frag = x_ref[:, :, 0, :, :]
        xi = frag.reshape(BF * Hp * Wp, K1).astype(jnp.int32) - 128
        xi = jnp.maximum(xi, -127).astype(jnp.bfloat16)
        o_ref[...] = jnp.sum(xi.astype(jnp.float32), axis=1, keepdims=True)

    def t2(x):
        return pl.pallas_call(
            k2, grid=(B // BF,),
            in_specs=[pl.BlockSpec((BF, Hp, patch, Wp, K1), lambda b: (b, 0, 0, 0, 0))],
            out_specs=pl.BlockSpec((BF * Hp * Wp, 1), lambda b: (b, 0)),
            out_shape=jax.ShapeDtypeStruct((B * Hp * Wp, 1), jnp.float32),
        )(x)

    try_one("t2 fragment slice+reshape", t2, x5)

    # t3: one K=48 dot
    def k3(x_ref, w_ref, o_ref):
        frag = x_ref[:, :, 0, :, :]
        xi = (frag.reshape(BF * Hp * Wp, K1).astype(jnp.int32) - 128).astype(jnp.bfloat16)
        o_ref[...] = jax.lax.dot_general(
            xi, w_ref[0], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )

    def t3(x, w):
        return pl.pallas_call(
            k3, grid=(B // BF,),
            in_specs=[
                pl.BlockSpec((BF, Hp, patch, Wp, K1), lambda b: (b, 0, 0, 0, 0)),
                pl.BlockSpec((patch, K1, c0), lambda b: (0, 0, 0)),
            ],
            out_specs=pl.BlockSpec((BF * Hp * Wp, c0), lambda b: (b, 0)),
            out_shape=jax.ShapeDtypeStruct((B * Hp * Wp, c0), jnp.float32),
        )(x, w)

    try_one("t3 single K=48 dot", t3, x5, w3)

    # t4: full 16-dot accumulate (slicedot core, f32 out, no epilogue)
    def k4(x_ref, w_ref, o_ref):
        M = BF * Hp * Wp
        acc = jnp.zeros((M, c0), jnp.float32)
        for r in range(patch):
            xi = (x_ref[:, :, r, :, :].reshape(M, K1).astype(jnp.int32) - 128)
            xi = jnp.maximum(xi, -127).astype(jnp.bfloat16)
            acc = acc + jax.lax.dot_general(
                xi, w_ref[r], (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
        o_ref[...] = acc

    def t4(x, w):
        return pl.pallas_call(
            k4, grid=(B // BF,),
            in_specs=[
                pl.BlockSpec((BF, Hp, patch, Wp, K1), lambda b: (b, 0, 0, 0, 0)),
                pl.BlockSpec((patch, K1, c0), lambda b: (0, 0, 0)),
            ],
            out_specs=pl.BlockSpec((BF * Hp * Wp, c0), lambda b: (b, 0)),
            out_shape=jax.ShapeDtypeStruct((B * Hp * Wp, c0), jnp.float32),
        )(x, w)

    try_one("t4 16-dot accumulate", t4, x5, w3)


if __name__ == "__main__":
    main()
