"""Composite models: cross-modal contrastive model, IMU classifier, and the
north-star cross-attention fusion classifier with OOD-ready embeddings.

Reference counterparts: ``CrossModalModel`` (``src/models/models.py:239-291``) and
``IMUClassifier`` (``models.py:296-348``).  The fusion classifier has no reference
counterpart — it implements the BASELINE.json north-star config ("cross-attention
IMU+video fusion classifier" + "OOD scores over fused embeddings").

Design notes vs the reference:
- The reference declares learnable ``temperature``/``bias`` on ``CrossModalModel``
  (``models.py:267-268``) that its forward never uses (quirk Q7), AND a second learnable
  pair inside ``SigmoidContrastiveLoss`` (``losses.py:15-23``) that the optimizer never
  sees because it only optimizes ``model.parameters()`` (``trainer.py:74-78``,
  ``main.py:97-98``) — so in practice SigLIP's scalars are frozen at init (t=log 10,
  b=−10).  Here the model-level pair is the *live* one: it feeds the loss and trains.
  ``train_loss_scalars=False`` freezes them to reproduce the reference's effective
  behavior.
- Encoder freezing (linear probe) is expressed functionally with ``stop_gradient``
  instead of ``requires_grad`` mutation; the frozen encoder runs deterministically
  (the reference leaves dropout active inside the frozen encoder during probe training
  because ``model.train()`` flips the whole module tree — we do not replicate that).
"""
from __future__ import annotations

import math
import jax
import jax.numpy as jnp
from flax import linen as nn

from .imu import build_imu_encoder
from .layers import ClassifierHead, CrossAttentionBlock, ProjectionHead, l2_normalize
from .video import build_video_encoder


class CrossModalModel(nn.Module):
    """IMU + video encoders + projection heads, L2-normalized embeddings.

    ``__call__(imu (B,C,T), video (B,T,H,W,3))`` → dict with ``imu_proj``/``video_proj``
    (both ``(B, projection_dim)``, unit-norm) and the live SigLIP scalars
    ``logit_scale`` (=exp(t)-style parameter kept in log space) and ``logit_bias``.
    """

    config: object
    train_loss_scalars: bool = True

    def setup(self):
        m = self.config.model
        dtype = jnp.dtype(m.compute_dtype)
        self.imu_encoder = build_imu_encoder(self.config)
        self.video_encoder = build_video_encoder(self.config)
        self.imu_proj = ProjectionHead(
            m.projection_hidden_dim, m.projection_dim, norm=m.head_norm, dtype=dtype,
            name="imu_proj",
        )
        self.video_proj = ProjectionHead(
            m.projection_hidden_dim, m.projection_dim, norm=m.head_norm, dtype=dtype,
            name="video_proj",
        )
        # Live SigLIP scalars (init matches reference: log(10), -10).
        self.temperature = self.param(
            "temperature", lambda k: jnp.asarray(math.log(10.0), jnp.float32)
        )
        self.bias = self.param("bias", lambda k: jnp.asarray(-10.0, jnp.float32))

    def __call__(self, imu, video, *, train: bool = False):
        imu_feat, imu_tokens = self.imu_encoder(imu, train=train)
        video_feat, video_tokens = self.video_encoder(video, train=train)

        ip = self.imu_proj(imu_feat, train=train).astype(jnp.float32)
        vp = self.video_proj(video_feat, train=train).astype(jnp.float32)

        t, b = self.temperature, self.bias
        if not self.train_loss_scalars:
            t, b = jax.lax.stop_gradient(t), jax.lax.stop_gradient(b)

        return {
            "imu_proj": l2_normalize(ip),
            "video_proj": l2_normalize(vp),
            "logit_scale": t,
            "logit_bias": b,
            "imu_tokens": imu_tokens,
            "video_tokens": video_tokens,
        }

    def encode_imu(self, imu, *, train: bool = False):
        return self.imu_encoder(imu, train=train)


class IMUClassifier(nn.Module):
    """IMU encoder + MLP head (reference ``IMUClassifier``, ``models.py:296-348``).

    The head classifies off the 128-d encoder embedding, not the 256-d projection
    (SURVEY.md §2).  Returns ``(logits (B, num_classes), embedding (B, d_model))`` —
    the embedding is the feature space for Mahalanobis OOD scoring.
    """

    config: object
    freeze_encoder: bool = False

    def setup(self):
        m = self.config.model
        dtype = jnp.dtype(m.compute_dtype)
        self.imu_encoder = build_imu_encoder(self.config)
        self.classifier = ClassifierHead(
            hidden_dims=tuple(m.classifier_hidden_dims),
            num_classes=m.num_classes,
            dropout=m.classifier_dropout,
            norm=m.head_norm,
            dtype=dtype,
            name="classifier",
        )

    def __call__(self, imu, *, train: bool = False):
        # Frozen encoder: no gradients, no dropout (deterministic feature extractor).
        enc_train = train and not self.freeze_encoder
        feat, _ = self.imu_encoder(imu, train=enc_train)
        if self.freeze_encoder:
            feat = jax.lax.stop_gradient(feat)
        logits = self.classifier(feat, train=train)
        return logits, feat


class VideoClassifier(nn.Module):
    """Video-only clip classifier (BASELINE.json config: "video-only clip encoder
    (CNN/ViT, 16-frame 224px clips)"; no reference counterpart).

    Clip encoder → MLP head on the pooled ``video_d_model`` embedding.  Returns
    ``(logits, embedding)`` like the other classifiers so the OOD scorers and
    evaluators apply unchanged.
    """

    config: object

    def setup(self):
        m = self.config.model
        dtype = jnp.dtype(m.compute_dtype)
        self.video_encoder = build_video_encoder(self.config)
        self.classifier = ClassifierHead(
            hidden_dims=tuple(m.classifier_hidden_dims),
            num_classes=m.num_classes,
            dropout=m.classifier_dropout,
            norm=m.head_norm,
            dtype=dtype,
            name="classifier",
        )

    def __call__(self, video, *, train: bool = False):
        emb, _ = self.video_encoder(video, train=train)
        logits = self.classifier(emb, train=train)
        return logits, emb


class FusionClassifier(nn.Module):
    """Cross-attention IMU+video fusion classifier (north-star config).

    Both encoders emit token streams; ``fusion_layers`` rounds of bidirectional
    cross-attention mix them; pooled streams are concatenated into a fused embedding
    that feeds the classifier head and the OOD scorers (MSP/energy on logits,
    Mahalanobis on the fused embedding).

    Returns ``(logits (B, num_classes), fused (B, 2*fusion_dim))``.
    """

    config: object

    def setup(self):
        m = self.config.model
        dtype = jnp.dtype(m.compute_dtype)
        self.fusion_dim = m.imu_d_model
        self.imu_encoder = build_imu_encoder(self.config)
        self.video_encoder = build_video_encoder(self.config)
        self.video_to_fusion = nn.Dense(self.fusion_dim, dtype=dtype, name="video_to_fusion")
        self.imu_to_fusion = nn.Dense(self.fusion_dim, dtype=dtype, name="imu_to_fusion")
        self.imu_blocks = [
            CrossAttentionBlock(
                d_model=self.fusion_dim, num_heads=m.fusion_heads,
                d_ff=self.fusion_dim * 4, dropout=m.imu_dropout, dtype=dtype,
                name=f"imu_xattn{i}",
            )
            for i in range(m.fusion_layers)
        ]
        self.video_blocks = [
            CrossAttentionBlock(
                d_model=self.fusion_dim, num_heads=m.fusion_heads,
                d_ff=self.fusion_dim * 4, dropout=m.imu_dropout, dtype=dtype,
                name=f"video_xattn{i}",
            )
            for i in range(m.fusion_layers)
        ]
        self.classifier = ClassifierHead(
            hidden_dims=tuple(m.classifier_hidden_dims),
            num_classes=m.num_classes,
            dropout=m.classifier_dropout,
            norm=m.head_norm,
            dtype=dtype,
            name="classifier",
        )

    def __call__(self, imu, video, *, train: bool = False):
        _, imu_tokens = self.imu_encoder(imu, train=train)
        _, video_tokens = self.video_encoder(video, train=train)
        return self._fuse(imu_tokens, video_tokens, train)

    def fuse_with_tokens(self, imu, video_tokens, *, train: bool = False):
        """Forward with externally-computed video tokens (``(B, N, video_d_model)``).

        Lets alternative video towers — e.g. the int8-quantized ResNet-18 serving
        path (``tpuhar.ops.quant``) — reuse the fusion/classifier stack:
        ``model.apply(vars, imu, tokens, method=FusionClassifier.fuse_with_tokens)``.
        """
        _, imu_tokens = self.imu_encoder(imu, train=train)
        return self._fuse(imu_tokens, video_tokens, train)

    def _fuse(self, imu_tokens, video_tokens, train: bool):
        hi = self.imu_to_fusion(imu_tokens)
        hv = self.video_to_fusion(video_tokens)
        for ib, vb in zip(self.imu_blocks, self.video_blocks):
            hi_new = ib(hi, hv, deterministic=not train)
            hv = vb(hv, hi, deterministic=not train)
            hi = hi_new

        fused = jnp.concatenate(
            [jnp.mean(hi, axis=1), jnp.mean(hv, axis=1)], axis=-1
        ).astype(jnp.float32)
        logits = self.classifier(fused, train=train)
        return logits, fused
