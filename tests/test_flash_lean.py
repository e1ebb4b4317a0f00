"""Numerics of the lean flash kernel (ops/flash_lean.py, interpret mode on CPU).

Exactness bar: f32 inputs must match the XLA reference attention to ~1e-5
(same math, different reduction order); bf16 to bf16-rounding tolerance.
Covers exact Q/KV tiling, KV-only padding (the 1568→1792 serving case), and
Q+KV padding.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tpuhar.ops.attention import _reference_attention
from tpuhar.ops.flash_lean import flash_lean


def _rand(shape, dtype, seed):
    rng = np.random.default_rng(seed)
    return jnp.asarray(rng.normal(0, 1, size=shape), dtype)


@pytest.mark.parametrize(
    "B,H,N,D,bq,bk",
    [
        (2, 2, 448, 64, 224, 224),   # exact tiling both sides
        (1, 2, 1568, 64, 224, 256),  # the serving shape: KV pads 1568->1792
        (1, 1, 1568, 64, 392, 1792), # one-shot full-KV tiles (nkv=1)
        (2, 1, 100, 32, 64, 64),     # Q and KV both padded
        (1, 1, 224, 128, 224, 224),  # wider head_dim
    ],
)
def test_matches_reference_f32(B, H, N, D, bq, bk):
    q = _rand((B, H, N, D), jnp.float32, 0)
    k = _rand((B, H, N, D), jnp.float32, 1)
    v = _rand((B, H, N, D), jnp.float32, 2)
    ref = _reference_attention(q, k, v, 1.0 / D**0.5)
    out = flash_lean(q, k, v, block_q=bq, block_k=bk, interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5, rtol=2e-5)


def test_matches_reference_bf16():
    B, H, N, D = 1, 2, 448, 64
    q = _rand((B, H, N, D), jnp.bfloat16, 3)
    k = _rand((B, H, N, D), jnp.bfloat16, 4)
    v = _rand((B, H, N, D), jnp.bfloat16, 5)
    ref = _reference_attention(
        q.astype(jnp.float32), k.astype(jnp.float32), v.astype(jnp.float32),
        1.0 / D**0.5,
    )
    out = flash_lean(q, k, v, block_q=224, block_k=224, interpret=True)
    assert out.dtype == jnp.bfloat16
    np.testing.assert_allclose(
        np.asarray(out, np.float32), np.asarray(ref), atol=3e-2, rtol=3e-2
    )


def test_padding_columns_do_not_leak():
    """KV padding must be a no-op: same rows, padded vs exactly-tiled blocks."""
    B, H, N, D = 1, 1, 448, 64
    q = _rand((B, H, N, D), jnp.float32, 6)
    k = _rand((B, H, N, D), jnp.float32, 7)
    v = _rand((B, H, N, D), jnp.float32, 8)
    exact = flash_lean(q, k, v, block_q=224, block_k=224, interpret=True)
    padded = flash_lean(q, k, v, block_q=224, block_k=384, interpret=True)  # 448->768
    np.testing.assert_allclose(
        np.asarray(padded), np.asarray(exact), atol=2e-5, rtol=2e-5
    )


def test_flash_mha_dispatches_lean_on_cpu_fallback():
    """On CPU flash_mha must fall back to the XLA reference regardless of kernel."""
    from tpuhar.ops.attention import flash_mha

    B, H, N, D = 1, 2, 64, 32
    q = _rand((B, H, N, D), jnp.float32, 9)
    k = _rand((B, H, N, D), jnp.float32, 10)
    v = _rand((B, H, N, D), jnp.float32, 11)
    out = flash_mha(q, k, v, kernel="lean")
    ref = _reference_attention(q, k, v, 1.0 / D**0.5)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-6)
