"""Attention dispatch: Pallas flash attention for long token streams, XLA for short.

The VideoMAE family runs 1568-token non-causal self-attention; naive attention
materializes (B, H, 1568, 1568) score tensors in HBM.  The Pallas flash kernel
(`jax.experimental.pallas.ops.tpu.flash_attention`) tiles Q/K/V through VMEM with an
online softmax, never materializing the score matrix.

Sequence lengths are padded up to the kernel's block multiple; padding keys are
excluded via segment ids so real-token outputs are exact (golden-tested against the
XLA reference path).
"""
from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
from flax import linen as nn


def _reference_attention(q, k, v, sm_scale):
    # q,k,v: (B, H, N, D)
    scores = jnp.einsum("bhqd,bhkd->bhqk", q, k) * sm_scale
    probs = jax.nn.softmax(scores, axis=-1)
    return jnp.einsum("bhqk,bhkd->bhqd", probs, v)


def flash_mha(
    q: jax.Array,
    k: jax.Array,
    v: jax.Array,
    *,
    sm_scale: Optional[float] = None,
    block_q: int = 512,
    block_k: int = 512,
    use_flash: bool = True,
    kernel: str = "lean",
) -> jax.Array:
    """Multi-head attention over ``(B, H, N, D)`` tensors.

    ``use_flash=False`` (or non-TPU backends) falls back to the XLA reference.
    ``kernel="lean"`` (default) uses the purpose-built forward-only kernel
    (``ops.flash_lean`` — Q tiles divide N=1568 exactly, KV pads +14%);
    ``kernel="library"`` uses the stock Pallas kernel, which pads N to a block
    multiple and masks padding with segment ids.

    Block choice matters at VideoMAE's N=1568: library blocks must be
    128-multiples, so the original 512/512 config padded to 2048 (+30% wasted
    K-work). Smaller blocks pad less: 128→1664 (+6%), 256→1792 (+14%). Sweep
    with ``scripts/perf_flash.py``; lean-vs-library-vs-XLA unit A/B in
    ``scripts/perf_flash_lean.py``.
    """
    B, H, N, D = q.shape
    if sm_scale is None:
        sm_scale = 1.0 / (D ** 0.5)

    from .fused_window import _auto_platform

    platform = _auto_platform()  # default_device(cpu)-aware (flax init on CPU)
    if not use_flash or platform not in ("tpu",):
        return _reference_attention(q, k, v, sm_scale)

    if kernel == "lean":
        from .flash_lean import flash_lean

        # the 512/512 defaults are library-kernel legacy; lean's chip-tuned
        # blocks for the ViT stream are one-shot full-KV tiles (392, 1792)
        bq = 392 if block_q == 512 else block_q
        bk = 1792 if block_k == 512 else block_k
        return flash_lean(q, k, v, sm_scale=sm_scale, block_q=bq, block_k=bk)

    from jax.experimental.pallas.ops.tpu.flash_attention import (
        BlockSizes,
        SegmentIds,
        flash_attention,
    )

    # pad to a common multiple of both blocks so q and k tile evenly
    import math

    block = block_q * block_k // math.gcd(block_q, block_k)
    pad = (-N) % block
    if pad:
        q = jnp.pad(q, ((0, 0), (0, 0), (0, pad), (0, 0)))
        k = jnp.pad(k, ((0, 0), (0, 0), (0, pad), (0, 0)))
        v = jnp.pad(v, ((0, 0), (0, 0), (0, pad), (0, 0)))
    Np = N + pad
    bq = min(block_q, Np)
    bk = min(block_k, Np)
    seg = (jnp.arange(Np) < N).astype(jnp.int32)[None, :].repeat(B, axis=0)
    bs = BlockSizes(
        block_q=bq,
        block_k_major=bk,
        block_k=bk,
        block_b=1,
        block_q_major_dkv=bq,
        block_k_major_dkv=bk,
        block_k_dkv=bk,
        block_q_dkv=bq,
        block_k_major_dq=bk,
        block_k_dq=bk,
        block_q_dq=bq,
    )
    out = flash_attention(
        q, k, v,
        segment_ids=SegmentIds(q=seg, kv=seg),
        causal=False,
        sm_scale=sm_scale,
        block_sizes=bs,
    )
    return out[:, :, :N, :] if pad else out


class FlashSelfAttention(nn.Module):
    """Drop-in self-attention module with flash dispatch.

    Parameter names/shapes match ``nn.MultiHeadDotProductAttention``
    (``query/key/value`` kernels ``(D, H, Dh)``, ``out`` kernel ``(H, Dh, D)``), so
    checkpoints are interchangeable with the standard blocks.
    """

    num_heads: int
    qkv_features: int
    use_flash: bool = True
    block_q: int = 512
    block_k: int = 512
    kernel: str = "lean"  # "lean" (ops.flash_lean) | "library" (stock Pallas)
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, *, deterministic: bool = True):
        D = self.qkv_features
        H = self.num_heads
        Dh = D // H

        def proj(name):
            dense = nn.DenseGeneral(
                features=(H, Dh), axis=-1, dtype=self.dtype, name=name
            )
            return dense(x)  # (B, N, H, Dh)

        q = proj("query")
        k = proj("key")
        v = proj("value")
        # (B, N, H, Dh) → (B, H, N, Dh)
        q, k, v = (jnp.swapaxes(t, 1, 2) for t in (q, k, v))
        ctx = flash_mha(
            q, k, v, use_flash=self.use_flash,
            block_q=self.block_q, block_k=self.block_k, kernel=self.kernel,
        )
        ctx = jnp.swapaxes(ctx, 1, 2)  # (B, N, H, Dh)
        out = nn.DenseGeneral(
            features=D, axis=(-2, -1), dtype=self.dtype, name="out"
        )(ctx)
        return out
