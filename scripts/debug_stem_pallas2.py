#!/usr/bin/env python
"""Round 2 bisect: int8 (bitcast) input + XOR-128 trick; find supported casts/dots."""
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
    npr = np.random.default_rng(0)
    u8 = (npr.random((B, Hp, patch, Wp, K1)) * 255).astype(np.uint8)
    x5 = jax.device_put(u8.view(np.int8))  # bitcast outside
    w3 = jax.device_put(
        npr.normal(0, 1, (patch, K1, c0)).astype(np.float32).astype(jnp.bfloat16)
    )
    w3i = jax.device_put(
        np.clip(npr.normal(0, 40, (patch, K1, c0)), -127, 127).astype(np.int8)
    )

    def try_one(name, fn, *args):
        try:
            out = np.asarray(jax.jit(fn)(*args))
            log(f"{name}: OK out={out.shape} sum={float(out.sum()):.3e}")
            return True
        except Exception as e:
            log(f"{name}: FAILED {type(e).__name__}: {str(e)[:250]}")
            return False

    X5 = pl.BlockSpec((BF, Hp, patch, Wp, K1), lambda b: (b, 0, 0, 0, 0))
    W3 = pl.BlockSpec((patch, K1, c0), lambda b: (0, 0, 0))
    M = BF * Hp * Wp

    def call(k, outshape, outspec, *specs):
        def f(*args):
            return pl.pallas_call(
                k, grid=(B // BF,),
                in_specs=list(specs),
                out_specs=outspec,
                out_shape=outshape,
            )(*args)
        return f

    # u1: xor + int8->int32 cast + sum
    def k1(x_ref, o_ref):
        xi = x_ref[...] ^ jnp.int8(-128)
        o_ref[...] = jnp.sum(xi.astype(jnp.int32), axis=(1, 2, 3, 4))[:, None]

    try_one("u1 xor + i8->i32 sum", call(
        k1, jax.ShapeDtypeStruct((B, 1), jnp.int32),
        pl.BlockSpec((BF, 1), lambda b: (b, 0)), X5), x5)

    # u2: fragment slice + reshape (lane-preserving) + xor
    def k2(x_ref, o_ref):
        frag = x_ref[:, :, 0, :, :] ^ jnp.int8(-128)
        xi = frag.reshape(M, K1)
        o_ref[...] = jnp.sum(xi.astype(jnp.int32), axis=1, keepdims=True)

    try_one("u2 fragment slice+reshape", call(
        k2, jax.ShapeDtypeStruct((B * Hp * Wp, 1), jnp.int32),
        pl.BlockSpec((M, 1), lambda b: (b, 0)), X5), x5)

    # u3a: int8 -> bf16 cast
    def k3a(x_ref, o_ref):
        xi = (x_ref[:, :, 0, :, :] ^ jnp.int8(-128)).reshape(M, K1)
        o_ref[...] = jnp.sum(xi.astype(jnp.bfloat16).astype(jnp.float32), axis=1,
                             keepdims=True)

    try_one("u3a i8->bf16 cast", call(
        k3a, jax.ShapeDtypeStruct((B * Hp * Wp, 1), jnp.float32),
        pl.BlockSpec((M, 1), lambda b: (b, 0)), X5), x5)

    # u4: K=48 dot, bf16
    def k4(x_ref, w_ref, o_ref):
        xi = (x_ref[:, :, 0, :, :] ^ jnp.int8(-128)).reshape(M, K1)
        xb = jnp.maximum(xi, jnp.int8(-127)).astype(jnp.bfloat16)
        o_ref[...] = jax.lax.dot_general(
            xb, w_ref[0], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)

    try_one("u4 K=48 bf16 dot", call(
        k4, jax.ShapeDtypeStruct((B * Hp * Wp, c0), jnp.float32),
        pl.BlockSpec((M, c0), lambda b: (b, 0)), X5, W3), x5, w3)

    # u5: K=48 dot, int8 x int8 -> int32
    def k5(x_ref, w_ref, o_ref):
        xi = (x_ref[:, :, 0, :, :] ^ jnp.int8(-128)).reshape(M, K1)
        xq = jnp.maximum(xi, jnp.int8(-127))
        o_ref[...] = jax.lax.dot_general(
            xq, w_ref[0], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32)

    try_one("u5 K=48 int8 dot", call(
        k5, jax.ShapeDtypeStruct((B * Hp * Wp, c0), jnp.int32),
        pl.BlockSpec((M, c0), lambda b: (b, 0)), X5, W3), x5, w3i)

    # u6: full 16-dot accumulate bf16
    def k6(x_ref, w_ref, o_ref):
        acc = jnp.zeros((M, c0), jnp.float32)
        for r in range(patch):
            xi = (x_ref[:, :, r, :, :] ^ jnp.int8(-128)).reshape(M, K1)
            xb = jnp.maximum(xi, jnp.int8(-127)).astype(jnp.bfloat16)
            acc = acc + jax.lax.dot_general(
                xb, w_ref[r], (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
        o_ref[...] = acc

    try_one("u6 16-dot accumulate bf16", call(
        k6, jax.ShapeDtypeStruct((B * Hp * Wp, c0), jnp.float32),
        pl.BlockSpec((M, c0), lambda b: (b, 0)), X5, W3), x5, w3)


if __name__ == "__main__":
    main()
