"""Shared Flax building blocks: norms, transformer encoder blocks, MLP heads.

TPU-first conventions used throughout the model zoo:
- parameters live in float32, activations run in a configurable compute dtype
  (bfloat16 by default — MXU native),
- all control flow is static; dropout/BN switch on a ``deterministic`` /
  ``use_running_average`` flag instead of Python branches on traced values,
- BatchNorm statistics are global-batch under pjit (XLA inserts the cross-replica
  reductions automatically in SPMD), matching semantics the reference only gets on a
  single device.
"""
from __future__ import annotations

from typing import Callable, Optional, Sequence

import jax.numpy as jnp
from flax import linen as nn


def norm_layer(kind: str, *, dtype=jnp.float32, name: Optional[str] = None):
    """Head norm selector: "batch" mirrors the reference's BatchNorm1d
    (``models.py:228``, ``:318``); "layer" is the jit/vmap-friendly alternative."""
    if kind == "batch":
        return nn.BatchNorm(
            use_running_average=None, momentum=0.9, epsilon=1e-5, dtype=dtype, name=name
        )
    if kind == "layer":
        return nn.LayerNorm(dtype=dtype, name=name)
    raise ValueError(f"Unknown norm kind: {kind}")


class TransformerEncoderBlock(nn.Module):
    """Post-norm transformer encoder layer.

    Matches the computation of ``torch.nn.TransformerEncoderLayer`` with default
    ``norm_first=False`` and ReLU (reference ``models.py:85-94``):
    ``x = LN(x + Drop(SelfAttn(x))); x = LN(x + Drop(W2 Drop(relu(W1 x))))``.
    """

    d_model: int
    num_heads: int
    d_ff: int
    dropout: float = 0.1
    dtype: jnp.dtype = jnp.float32
    activation: Callable = nn.relu

    @nn.compact
    def __call__(self, x, *, deterministic: bool = True, mask=None):
        attn = nn.MultiHeadDotProductAttention(
            num_heads=self.num_heads,
            qkv_features=self.d_model,
            dropout_rate=self.dropout,
            dtype=self.dtype,
            name="self_attn",
        )(x, x, mask=mask, deterministic=deterministic)
        attn = nn.Dropout(self.dropout)(attn, deterministic=deterministic)
        x = nn.LayerNorm(dtype=self.dtype, name="norm1")(x + attn)

        h = nn.Dense(self.d_ff, dtype=self.dtype, name="linear1")(x)
        h = self.activation(h)
        h = nn.Dropout(self.dropout)(h, deterministic=deterministic)
        h = nn.Dense(self.d_model, dtype=self.dtype, name="linear2")(h)
        h = nn.Dropout(self.dropout)(h, deterministic=deterministic)
        x = nn.LayerNorm(dtype=self.dtype, name="norm2")(x + h)
        return x


class PreNormBlock(nn.Module):
    """Pre-norm ViT-style block (used by the video ViT; GELU MLP).

    ``use_flash=True`` swaps self-attention to the Pallas flash kernel
    (``tpuhar.ops.attention``) with identical parameter names/shapes.
    """

    d_model: int
    num_heads: int
    d_ff: int
    dropout: float = 0.0
    use_flash: bool = False
    flash_block_q: int = 512
    flash_block_k: int = 512
    flash_kernel: str = "lean"
    # tanh-approximate GELU: ~2.6× faster block-MLP on the VPU at bf16 with
    # rel-RMS drift 2.5e-3 (scripts/perf_vit_stages2.py); exact erf is the
    # default for HF weight-conversion parity.
    gelu_approximate: bool = False
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        h = nn.LayerNorm(dtype=self.dtype, name="norm1")(x)
        if self.use_flash:
            from ..ops.attention import FlashSelfAttention

            h = FlashSelfAttention(
                num_heads=self.num_heads,
                qkv_features=self.d_model,
                block_q=self.flash_block_q,
                block_k=self.flash_block_k,
                kernel=self.flash_kernel,
                dtype=self.dtype,
                name="self_attn",
            )(h, deterministic=deterministic)
        else:
            h = nn.MultiHeadDotProductAttention(
                num_heads=self.num_heads,
                qkv_features=self.d_model,
                dropout_rate=self.dropout,
                dtype=self.dtype,
                name="self_attn",
            )(h, h, deterministic=deterministic)
        x = x + nn.Dropout(self.dropout)(h, deterministic=deterministic)

        h = nn.LayerNorm(dtype=self.dtype, name="norm2")(x)
        h = nn.Dense(self.d_ff, dtype=self.dtype, name="mlp_in")(h)
        # exact (erf) GELU matches HF ViT/VideoMAE for weight-conversion parity;
        # gelu_approximate=True swaps the tanh form (serving fast path)
        h = nn.gelu(h, approximate=self.gelu_approximate)
        h = nn.Dense(self.d_model, dtype=self.dtype, name="mlp_out")(h)
        x = x + nn.Dropout(self.dropout)(h, deterministic=deterministic)
        return x


class CrossAttentionBlock(nn.Module):
    """Pre-norm cross-attention + MLP block: queries attend to a context stream.

    Building block of the north-star cross-attention fusion classifier
    (BASELINE.json configs; absent from the reference code).
    """

    d_model: int
    num_heads: int
    d_ff: int
    dropout: float = 0.0
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, q, kv, *, deterministic: bool = True):
        h = nn.LayerNorm(dtype=self.dtype, name="norm_q")(q)
        ctx = nn.LayerNorm(dtype=self.dtype, name="norm_kv")(kv)
        h = nn.MultiHeadDotProductAttention(
            num_heads=self.num_heads,
            qkv_features=self.d_model,
            dropout_rate=self.dropout,
            dtype=self.dtype,
            name="cross_attn",
        )(h, ctx, deterministic=deterministic)
        q = q + nn.Dropout(self.dropout)(h, deterministic=deterministic)

        h = nn.LayerNorm(dtype=self.dtype, name="norm_mlp")(q)
        h = nn.Dense(self.d_ff, dtype=self.dtype, name="mlp_in")(h)
        h = nn.gelu(h)
        h = nn.Dense(self.d_model, dtype=self.dtype, name="mlp_out")(h)
        q = q + nn.Dropout(self.dropout)(h, deterministic=deterministic)
        return q


class ProjectionHead(nn.Module):
    """Contrastive projection head: Dense → Norm → ReLU → Dense
    (reference ``models.py:221-234``)."""

    hidden_dim: int
    out_dim: int
    norm: str = "batch"
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, *, train: bool = False):
        x = nn.Dense(self.hidden_dim, dtype=self.dtype, name="fc1")(x)
        if self.norm == "batch":
            x = nn.BatchNorm(
                use_running_average=not train, momentum=0.9, dtype=self.dtype, name="bn"
            )(x)
        else:
            x = nn.LayerNorm(dtype=self.dtype, name="ln")(x)
        x = nn.relu(x)
        x = nn.Dense(self.out_dim, dtype=self.dtype, name="fc2")(x)
        return x


class ClassifierHead(nn.Module):
    """MLP classification head: [Dense → Norm → ReLU → Dropout]* → Dense(num_classes)
    (reference ``models.py:311-326``; defaults give 128→256→128→num_classes)."""

    hidden_dims: Sequence[int]
    num_classes: int
    dropout: float = 0.3
    norm: str = "batch"
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, *, train: bool = False):
        for i, h in enumerate(self.hidden_dims):
            x = nn.Dense(h, dtype=self.dtype, name=f"fc{i}")(x)
            if self.norm == "batch":
                x = nn.BatchNorm(
                    use_running_average=not train,
                    momentum=0.9,
                    dtype=self.dtype,
                    name=f"bn{i}",
                )(x)
            else:
                x = nn.LayerNorm(dtype=self.dtype, name=f"ln{i}")(x)
            x = nn.relu(x)
            x = nn.Dropout(self.dropout)(x, deterministic=not train)
        # logits in float32 for stable loss/metric computation
        x = nn.Dense(self.num_classes, dtype=jnp.float32, name="out")(x)
        return x


def l2_normalize(x, axis: int = -1, eps: float = 1e-12):
    """L2 normalization matching ``torch.nn.functional.normalize`` semantics."""
    norm = jnp.maximum(jnp.linalg.norm(x, axis=axis, keepdims=True), eps)
    return x / norm
