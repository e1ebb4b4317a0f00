"""IMU encoders: PatchTST-like transformer (reference architecture) and a 1D-CNN
variant (north-star config).

TPU-first differences from the reference implementation (``src/models/models.py:16-132``):
- The per-channel patch projection — a Python loop over six ``nn.Linear(16,128)`` layers
  in the reference (``models.py:26-49``) — is a single einsum against a ``(C, P, D)``
  kernel, one MXU matmul instead of six tiny ones.
- Patching uses a reshape (patch stride == patch size in every shipped config), keeping
  the layout contiguous; a strided gather covers the general case.
- The positional table is sized ``C*N + 1`` so all six channels reach the transformer.
  The reference sizes it ``N + 1 = 16`` and then truncates the 91-token stream to 16,
  silently discarding channels 1-5 (quirk Q1, ``models.py:81-82``, ``:122-123``);
  ``replicate_pos_truncation=True`` reproduces that behavior for parity runs.
"""
from __future__ import annotations

from typing import Sequence, Tuple

import jax.numpy as jnp
from flax import linen as nn

from .layers import TransformerEncoderBlock


class PatchEmbedding(nn.Module):
    """Channel-independent patch embedding (reference ``models.py:16-50``).

    Input ``(B, C, L)`` → patches ``(B, C, N, patch)`` → per-channel linear projection
    with a distinct ``(patch, d_model)`` kernel per channel → ``(B, C, N, d_model)``.
    """

    in_channels: int
    patch_size: int
    stride: int
    d_model: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        B, C, L = x.shape
        n = (L - self.patch_size) // self.stride + 1
        if self.stride == self.patch_size:
            patches = x[:, :, : n * self.patch_size].reshape(
                B, C, n, self.patch_size
            )
        else:
            starts = jnp.arange(n) * self.stride
            idx = starts[:, None] + jnp.arange(self.patch_size)[None, :]
            patches = x[:, :, idx]  # (B, C, N, patch)

        kernel = self.param(
            "kernel",
            nn.initializers.lecun_normal(),
            (self.in_channels, self.patch_size, self.d_model),
        )
        bias = self.param(
            "bias", nn.initializers.zeros, (self.in_channels, 1, self.d_model)
        )
        patches = patches.astype(self.dtype)
        out = jnp.einsum(
            "bcnp,cpd->bcnd", patches, kernel.astype(self.dtype)
        ) + bias.astype(self.dtype)
        return out


class IMUTransformerEncoder(nn.Module):
    """PatchTST-like IMU encoder (reference ``IMUEncoder``, ``models.py:53-132``).

    Returns ``(cls_embedding (B, d_model), tokens (B, T+1, d_model))`` — the CLS vector
    feeds projection/classifier heads, the token stream feeds cross-attention fusion.
    """

    in_channels: int = 6
    window_size: int = 250
    patch_size: int = 16
    stride: int = 16
    d_model: int = 128
    num_heads: int = 8
    num_layers: int = 4
    dropout: float = 0.1
    replicate_pos_truncation: bool = False  # quirk Q1
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, *, train: bool = False) -> Tuple[jnp.ndarray, jnp.ndarray]:
        B = x.shape[0]
        patches = PatchEmbedding(
            self.in_channels,
            self.patch_size,
            self.stride,
            self.d_model,
            dtype=self.dtype,
            name="patch_embed",
        )(x)
        _, C, N, D = patches.shape
        tokens = patches.reshape(B, C * N, D)

        cls = self.param(
            "cls_token", nn.initializers.normal(1.0), (1, 1, self.d_model)
        )
        tokens = jnp.concatenate(
            [jnp.broadcast_to(cls.astype(self.dtype), (B, 1, D)), tokens], axis=1
        )

        if self.replicate_pos_truncation:
            # Reference sizes the table (window-patches + 1) and truncates the token
            # stream to it (models.py:81-82, :122-123): only channel 0 survives.
            max_patches = (self.window_size - self.patch_size) // self.stride + 1
            pos_len = min(tokens.shape[1], max_patches + 1)
            pos = self.param(
                "pos_encoding", nn.initializers.normal(1.0), (1, max_patches + 1, D)
            )
            tokens = tokens[:, :pos_len] + pos.astype(self.dtype)[:, :pos_len]
        else:
            pos = self.param(
                "pos_encoding", nn.initializers.normal(1.0), (1, C * N + 1, D)
            )
            tokens = tokens + pos.astype(self.dtype)

        for i in range(self.num_layers):
            tokens = TransformerEncoderBlock(
                d_model=self.d_model,
                num_heads=self.num_heads,
                d_ff=self.d_model * 4,
                dropout=self.dropout,
                dtype=self.dtype,
                name=f"block{i}",
            )(tokens, deterministic=not train)

        tokens = nn.LayerNorm(dtype=self.dtype, name="final_norm")(tokens)
        cls_out = tokens[:, 0].astype(jnp.float32)
        return cls_out, tokens


class STFTTokenizer(nn.Module):
    """Project per-channel STFT frames to d_model tokens (north-star featurizer).

    Input ``(B, C, F, bins)`` from ``tpuhar.ops.featurize.stft_featurize`` →
    ``(B, C*F, d_model)`` tokens via a per-channel linear over the frequency bins,
    mirroring the raw path's channel-independent patching.
    """

    in_channels: int
    n_bins: int
    d_model: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, spec):
        B, C, Fr, bins = spec.shape
        kernel = self.param(
            "kernel", nn.initializers.lecun_normal(), (self.in_channels, bins, self.d_model)
        )
        bias = self.param(
            "bias", nn.initializers.zeros, (self.in_channels, 1, self.d_model)
        )
        out = jnp.einsum(
            "bcfk,ckd->bcfd", spec.astype(self.dtype), kernel.astype(self.dtype)
        ) + bias.astype(self.dtype)
        return out.reshape(B, C * Fr, self.d_model)


class IMUSpectrogramEncoder(nn.Module):
    """IMU transformer over STFT features (north-star "transformer over spectrogram").

    Same transformer trunk as :class:`IMUTransformerEncoder`, tokenized from
    log-magnitude STFT frames instead of raw patches.
    """

    in_channels: int = 6
    d_model: int = 128
    num_heads: int = 8
    num_layers: int = 4
    dropout: float = 0.1
    nperseg: int = 64
    hop: int = 32
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, *, train: bool = False):
        from ..ops.featurize import stft_featurize

        # x: (B, C, T) → (B, T, C) for the featurizer
        spec = stft_featurize(
            jnp.swapaxes(x, -1, -2), nperseg=self.nperseg, hop=self.hop
        )  # (B, C, F, bins)
        tokens = STFTTokenizer(
            self.in_channels, spec.shape[-1], self.d_model, dtype=self.dtype,
            name="stft_tokenizer",
        )(spec)
        B = tokens.shape[0]
        cls = self.param("cls_token", nn.initializers.normal(1.0), (1, 1, self.d_model))
        tokens = jnp.concatenate(
            [jnp.broadcast_to(cls.astype(self.dtype), (B, 1, self.d_model)), tokens],
            axis=1,
        )
        pos = self.param(
            "pos_encoding", nn.initializers.normal(0.02), (1, tokens.shape[1], self.d_model)
        )
        tokens = tokens + pos.astype(self.dtype)
        for i in range(self.num_layers):
            tokens = TransformerEncoderBlock(
                d_model=self.d_model,
                num_heads=self.num_heads,
                d_ff=self.d_model * 4,
                dropout=self.dropout,
                dtype=self.dtype,
                name=f"block{i}",
            )(tokens, deterministic=not train)
        tokens = nn.LayerNorm(dtype=self.dtype, name="final_norm")(tokens)
        return tokens[:, 0].astype(jnp.float32), tokens


class IMUConvEncoder(nn.Module):
    """1D-CNN IMU encoder (north-star "IMU-only 1D-CNN classifier" config).

    Conv1D stack over time with BN+ReLU, stride-2 downsampling, global average pool,
    and a linear to ``d_model`` so it drops into every head the transformer feeds.
    Returns ``(embedding (B, d_model), frame tokens (B, T', d_model))``.
    """

    channels: Sequence[int] = (64, 128, 128)
    kernel: int = 9
    d_model: int = 128
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, *, train: bool = False):
        # (B, C, T) → (B, T, C): flax convs are feature-last
        h = jnp.swapaxes(x, -1, -2).astype(self.dtype)
        for i, ch in enumerate(self.channels):
            h = nn.Conv(
                ch, (self.kernel,), strides=(2,), padding="SAME", dtype=self.dtype,
                name=f"conv{i}",
            )(h)
            h = nn.BatchNorm(
                use_running_average=not train, momentum=0.9, dtype=self.dtype,
                name=f"bn{i}",
            )(h)
            h = nn.relu(h)
        tokens = nn.Dense(self.d_model, dtype=self.dtype, name="proj")(h)
        emb = jnp.mean(tokens, axis=1).astype(jnp.float32)
        return emb, tokens


def build_imu_encoder(config, dtype=None):
    """Encoder factory keyed on ``config.model.imu_encoder`` / ``config.data.imu_featurizer``."""
    m, d = config.model, config.data
    dtype = dtype or jnp.dtype(m.compute_dtype)
    if m.imu_encoder == "cnn":
        return IMUConvEncoder(
            channels=tuple(m.imu_cnn_channels),
            kernel=m.imu_cnn_kernel,
            d_model=m.imu_d_model,
            dtype=dtype,
        )
    if d.imu_featurizer == "stft":
        return IMUSpectrogramEncoder(
            in_channels=d.imu_channels,
            d_model=m.imu_d_model,
            num_heads=m.imu_nhead,
            num_layers=m.imu_num_layers,
            dropout=m.imu_dropout,
            nperseg=d.stft_nperseg,
            hop=d.stft_hop,
            dtype=dtype,
        )
    return IMUTransformerEncoder(
        in_channels=d.imu_channels,
        window_size=d.imu_window_size,
        patch_size=m.imu_patch_size,
        stride=m.imu_stride,
        d_model=m.imu_d_model,
        num_heads=m.imu_nhead,
        num_layers=m.imu_num_layers,
        dropout=m.imu_dropout,
        replicate_pos_truncation=m.replicate_pos_truncation,
        dtype=dtype,
    )
