#!/usr/bin/env python
"""Round 4: legal 4D blocks — isolate load vs reshape vs dot; plus XLA fallbacks."""
import sys
import time
from functools import partial

import numpy as np

sys.path.insert(0, ".")


def log(m):
    print(m, file=sys.stderr, flush=True)


def main():
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl

    B, Hp, patch, Wp, K1, c0 = 64, 14, 16, 14, 48, 256
    G = 112
    npr = np.random.default_rng(0)
    u8 = (npr.random((B * Hp, patch, Wp, K1)) * 255).astype(np.uint8)
    x4 = jax.device_put(u8.view(np.int8))
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

    X4 = pl.BlockSpec((G, 1, Wp, K1), lambda g, r: (g, r, 0, 0))
    grid = ((B * Hp) // G, patch)

    # z1: load only (sum, no reshape)
    def kz1(x_ref, o_ref):
        xi = (x_ref[...] ^ jnp.int8(-128)).astype(jnp.int32)
        r = pl.program_id(1)

        @pl.when(r == 0)
        def _():
            o_ref[...] = jnp.zeros_like(o_ref)

        o_ref[...] += jnp.sum(xi, axis=(1, 2, 3))[:, None]

    try_one("z1 4D load+sum (no reshape)", lambda x: pl.pallas_call(
        kz1, grid=grid, in_specs=[X4],
        out_specs=pl.BlockSpec((G, 1), lambda g, r: (g, 0)),
        out_shape=jax.ShapeDtypeStruct((B * Hp, 1), jnp.int32),
    )(x), x4)

    # z1b: + merge reshape (G*Wp, K1)
    def kz1b(x_ref, o_ref):
        xi = (x_ref[...] ^ jnp.int8(-128)).reshape(G * Wp, K1).astype(jnp.int32)
        r = pl.program_id(1)

        @pl.when(r == 0)
        def _():
            o_ref[...] = jnp.zeros_like(o_ref)

        o_ref[...] += jnp.sum(xi, axis=1, keepdims=True)

    try_one("z1b + merge reshape", lambda x: pl.pallas_call(
        kz1b, grid=grid, in_specs=[X4],
        out_specs=pl.BlockSpec((G * Wp, 1), lambda g, r: (g, 0)),
        out_shape=jax.ShapeDtypeStruct((B * Hp * Wp, 1), jnp.int32),
    )(x), x4)

    # z1c: merged 2D dot K=48
    def kz1c(x_ref, w_ref, o_ref):
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

    try_one("z1c merged dot K=48", lambda x, w: pl.pallas_call(
        kz1c, grid=grid,
        in_specs=[X4, pl.BlockSpec((K1, c0), lambda g, r: (0, 0))],
        out_specs=pl.BlockSpec((G * Wp, c0), lambda g, r: (g, 0)),
        out_shape=jax.ShapeDtypeStruct((B * Hp * Wp, c0), jnp.float32),
    )(x, w), x4, w2)

    # z1d: 3D-lhs dot (G, Wp, K1) @ (K1, c0)
    def kz1d(x_ref, w_ref, o_ref):
        r = pl.program_id(1)

        @pl.when(r == 0)
        def _():
            o_ref[...] = jnp.zeros_like(o_ref)

        xi = x_ref[...] ^ jnp.int8(-128)
        xi = xi.reshape(G, Wp, K1)
        xb = jnp.maximum(xi, jnp.int8(-127)).astype(jnp.bfloat16)
        o_ref[...] += jax.lax.dot_general(
            xb, w_ref[...], (((2,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )

    try_one("z1d 3D-lhs dot", lambda x, w: pl.pallas_call(
        kz1d, grid=grid,
        in_specs=[X4, pl.BlockSpec((K1, c0), lambda g, r: (0, 0))],
        out_specs=pl.BlockSpec((G, Wp, c0), lambda g, r: (g, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((B * Hp, Wp, c0), jnp.float32),
    )(x, w), x4, w2)

    # ---- XLA fallbacks (timed roughly with block_until_ready, tiny B here) ----
    x5 = jax.device_put(u8.reshape(B, Hp, patch, Wp, K1).view(np.int8))
    wbig = jax.device_put(
        npr.normal(0, 1, (patch * K1, c0)).astype(np.float32).astype(jnp.bfloat16)
    )

    @jax.jit
    def xla_concat_gemm(x, w):
        frags = [
            (x[:, :, r, :, :].astype(jnp.int16) ^ 0)  # keep int8 values
            for r in range(patch)
        ]
        col = jnp.concatenate(
            [f.reshape(B, Hp, Wp, K1) for f in frags], axis=-1
        )  # (B, Hp, Wp, 768) int16
        colb = (col ^ jnp.int16(-128) * 0).astype(jnp.bfloat16)  # placeholder xor
        return jax.lax.dot_general(
            colb.reshape(B * Hp * Wp, patch * K1), w,
            (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32,
        )

    try_one("x1 XLA concat-of-slices + K=768 GEMM", xla_concat_gemm, x5, wbig)


if __name__ == "__main__":
    main()
