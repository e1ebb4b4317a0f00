"""Video clip encoders: VideoMAE-architecture ViT, ResNet-18, MobileNetV2, and a tiny
CNN for CI — all Flax, all emitting ``(B, video_d_model)`` plus a token/frame stream
for cross-attention fusion.

Mirrors the reference ``VideoEncoder``'s three backends (``src/models/models.py:137-216``):
a HuggingFace ``VideoMAEModel`` (``models.py:154-158``), torchvision ``resnet18``
(``:163-167``), and ``mobilenet_v2`` (``:169-173``), with CNN paths folding time into
the batch and mean-pooling over frames (``:208-216``).  Here the backbones are native
Flax so the whole clip → embedding path is one XLA program; HF/torchvision pretrained
weights can be grafted via ``tpuhar.models.convert`` when a local checkpoint exists
(this container has no network egress, so ``from_pretrained``-style downloads are not a
capability we can or do depend on).

ViT pooling note: HF ``VideoMAEModel`` has no CLS token; the reference's
``last_hidden_state[:, 0]`` (``models.py:201``) grabs the first *patch* token.  Default
here is mean pooling; ``pool="first"`` reproduces the reference choice.
"""
from __future__ import annotations

from typing import Tuple

import jax.numpy as jnp
from flax import linen as nn

from .layers import PreNormBlock

# name → (depth, d_model, heads) for the ViT family; "base" matches VideoMAE-Base
# (MCG-NJU/videomae-base-*: 12 layers, 768 dim, 12 heads, tubelet 2×16×16).
VIT_CONFIGS = {
    # name: (depth, d_model, num_heads) — the HF VideoMAE size ladder
    # (MCG-NJU/videomae-{small,base,large}); tiny is a test-scale config.
    "videomae_large": (24, 1024, 16),
    "videomae_base": (12, 768, 12),
    "videomae_small": (12, 384, 6),
    "videomae_tiny": (4, 192, 3),
}


class TubeletEmbed(nn.Module):
    """3D tubelet patch embedding: (B, T, H, W, 3) → (B, N, d_model).

    VideoMAE uses 2-frame × 16×16-pixel tubelets; implemented as a Conv3D with
    stride == kernel, i.e. one big matmul after reshaping — MXU-friendly.
    """

    d_model: int
    tubelet: Tuple[int, int, int] = (2, 16, 16)
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        return nn.Conv(
            self.d_model,
            kernel_size=self.tubelet,
            strides=self.tubelet,
            padding="VALID",
            dtype=self.dtype,
            name="proj",
        )(x)


class VideoViT(nn.Module):
    """VideoMAE-architecture video transformer.

    Input ``(B, T, H, W, 3)`` normalized pixels → token stream + pooled embedding.
    """

    depth: int = 12
    d_model: int = 768
    num_heads: int = 12
    mlp_ratio: int = 4
    dropout: float = 0.0
    pool: str = "mean"  # "first" replicates the reference's token-0 grab
    # HF VideoMAE checkpoints with use_mean_pooling=True carry NO final LayerNorm;
    # set False when grafting such weights (an identity-affine LN still standardizes).
    use_final_norm: bool = True
    # Rematerialize each block's activations in backward (jax.checkpoint): trades
    # ~33% more FLOPs for O(depth) less activation HBM — enables larger pretraining
    # batches on the 1568-token stream.
    remat: bool = False
    # Pallas flash attention for the (long) token stream; TPU only.
    use_flash: bool = False
    flash_block_q: int = 512
    flash_block_k: int = 512
    flash_kernel: str = "lean"
    # tanh-approximate MLP GELU (serving fast path; see PreNormBlock)
    gelu_approximate: bool = False
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, *, train: bool = False):
        h = TubeletEmbed(self.d_model, dtype=self.dtype, name="tubelet")(x)
        B = h.shape[0]
        tokens = h.reshape(B, -1, self.d_model)
        pos = self.param(
            "pos_encoding", nn.initializers.normal(0.02), (1, tokens.shape[1], self.d_model)
        )
        tokens = tokens + pos.astype(self.dtype)
        block_cls = (
            nn.remat(PreNormBlock, static_argnums=(2,)) if self.remat else PreNormBlock
        )
        for i in range(self.depth):
            tokens = block_cls(
                d_model=self.d_model,
                num_heads=self.num_heads,
                d_ff=self.d_model * self.mlp_ratio,
                dropout=self.dropout,
                use_flash=self.use_flash,
                flash_block_q=self.flash_block_q,
                flash_block_k=self.flash_block_k,
                flash_kernel=self.flash_kernel,
                gelu_approximate=self.gelu_approximate,
                dtype=self.dtype,
                name=f"block{i}",
            )(tokens, not train)
        if self.use_final_norm:
            tokens = nn.LayerNorm(dtype=self.dtype, name="final_norm")(tokens)
        if self.pool == "first":
            emb = tokens[:, 0]
        else:
            emb = jnp.mean(tokens, axis=1)
        return emb.astype(jnp.float32), tokens


# ---------------------------------------------------------------------------------
# ResNet-18 (2D, per-frame)
# ---------------------------------------------------------------------------------
class BasicBlock(nn.Module):
    features: int
    strides: int = 1
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, *, train: bool = False):
        residual = x
        h = nn.Conv(
            self.features, (3, 3), strides=(self.strides, self.strides),
            padding=[(1, 1), (1, 1)], use_bias=False, dtype=self.dtype, name="conv1",
        )(x)
        h = nn.BatchNorm(use_running_average=not train, momentum=0.9, dtype=self.dtype, name="bn1")(h)
        h = nn.relu(h)
        h = nn.Conv(
            self.features, (3, 3), padding=[(1, 1), (1, 1)], use_bias=False,
            dtype=self.dtype, name="conv2",
        )(h)
        h = nn.BatchNorm(use_running_average=not train, momentum=0.9, dtype=self.dtype, name="bn2")(h)
        if residual.shape != h.shape:
            residual = nn.Conv(
                self.features, (1, 1), strides=(self.strides, self.strides),
                use_bias=False, dtype=self.dtype, name="downsample_conv",
            )(residual)
            residual = nn.BatchNorm(
                use_running_average=not train, momentum=0.9, dtype=self.dtype,
                name="downsample_bn",
            )(residual)
        return nn.relu(h + residual)


class ResNet18(nn.Module):
    """Feature extractor matching torchvision resnet18 minus the FC head
    (reference strips the head, ``models.py:163-167``).  Output: (B', 512) after GAP."""

    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, *, train: bool = False):
        h = nn.Conv(
            64, (7, 7), strides=(2, 2), padding=[(3, 3), (3, 3)], use_bias=False,
            dtype=self.dtype, name="stem_conv",
        )(x)
        h = nn.BatchNorm(use_running_average=not train, momentum=0.9, dtype=self.dtype, name="stem_bn")(h)
        h = nn.relu(h)
        h = nn.max_pool(h, (3, 3), strides=(2, 2), padding=[(1, 1), (1, 1)])
        for li, (feats, blocks) in enumerate(((64, 2), (128, 2), (256, 2), (512, 2))):
            for bi in range(blocks):
                strides = 2 if (bi == 0 and li > 0) else 1
                h = BasicBlock(
                    feats, strides=strides, dtype=self.dtype, name=f"layer{li}_{bi}"
                )(h, train=train)
        return jnp.mean(h, axis=(1, 2))  # global average pool


# ---------------------------------------------------------------------------------
# MobileNetV2 (2D, per-frame)
# ---------------------------------------------------------------------------------
class InvertedResidual(nn.Module):
    features: int
    strides: int
    expand: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, *, train: bool = False):
        in_feats = x.shape[-1]
        hidden = in_feats * self.expand
        h = x
        if self.expand != 1:
            h = nn.Conv(hidden, (1, 1), use_bias=False, dtype=self.dtype, name="expand_conv")(h)
            h = nn.BatchNorm(use_running_average=not train, momentum=0.9, dtype=self.dtype, name="expand_bn")(h)
            h = jnp.minimum(nn.relu(h), 6.0)
        h = nn.Conv(
            hidden, (3, 3), strides=(self.strides, self.strides),
            padding=[(1, 1), (1, 1)], feature_group_count=hidden, use_bias=False,
            dtype=self.dtype, name="dw_conv",
        )(h)
        h = nn.BatchNorm(use_running_average=not train, momentum=0.9, dtype=self.dtype, name="dw_bn")(h)
        h = jnp.minimum(nn.relu(h), 6.0)
        h = nn.Conv(self.features, (1, 1), use_bias=False, dtype=self.dtype, name="project_conv")(h)
        h = nn.BatchNorm(use_running_average=not train, momentum=0.9, dtype=self.dtype, name="project_bn")(h)
        if self.strides == 1 and in_feats == self.features:
            h = h + x
        return h


MOBILENET_V2_SETTINGS = [
    # (expand, features, repeats, stride)
    (1, 16, 1, 1),
    (6, 24, 2, 2),
    (6, 32, 3, 2),
    (6, 64, 4, 2),
    (6, 96, 3, 1),
    (6, 160, 3, 2),
    (6, 320, 1, 1),
]


class MobileNetV2(nn.Module):
    """torchvision mobilenet_v2 ``.features`` equivalent; output (B', 1280) after GAP."""

    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, *, train: bool = False):
        h = nn.Conv(
            32, (3, 3), strides=(2, 2), padding=[(1, 1), (1, 1)], use_bias=False,
            dtype=self.dtype, name="stem_conv",
        )(x)
        h = nn.BatchNorm(use_running_average=not train, momentum=0.9, dtype=self.dtype, name="stem_bn")(h)
        h = jnp.minimum(nn.relu(h), 6.0)
        idx = 0
        for expand, feats, repeats, stride in MOBILENET_V2_SETTINGS:
            for r in range(repeats):
                h = InvertedResidual(
                    feats, strides=stride if r == 0 else 1, expand=expand,
                    dtype=self.dtype, name=f"ir{idx}",
                )(h, train=train)
                idx += 1
        h = nn.Conv(1280, (1, 1), use_bias=False, dtype=self.dtype, name="head_conv")(h)
        h = nn.BatchNorm(use_running_average=not train, momentum=0.9, dtype=self.dtype, name="head_bn")(h)
        h = jnp.minimum(nn.relu(h), 6.0)
        return jnp.mean(h, axis=(1, 2))


class _PatchKernelParams(nn.Module):
    """Declare an ``nn.Conv(patch×patch, use_bias=False)``-compatible stem kernel
    without running the conv — the patch-major serving branch reshapes it to a
    ``(patch²·3, features)`` GEMM matrix (``ops/stem.py``).  Name/shape/init match
    ``nn.Conv`` exactly so checkpoints are interchangeable between layouts."""

    features: int
    patch: int

    @nn.compact
    def __call__(self):
        return self.param(
            "kernel",
            nn.initializers.lecun_normal(),
            (self.patch, self.patch, 3, self.features),
            jnp.float32,
        )


class _Conv3x3Params(nn.Module):
    """Declare an ``nn.Conv(3×3, use_bias=False)``-compatible kernel without running
    the XLA conv — the Pallas serving branch reads the param and feeds
    ``ops.conv3x3.conv3x3_bn_act`` instead.  Name/shape/init match ``nn.Conv`` exactly
    so checkpoints are interchangeable between backends."""

    features: int
    in_features: int

    @nn.compact
    def __call__(self):
        return self.param(
            "kernel",
            nn.initializers.lecun_normal(),
            (3, 3, self.in_features, self.features),
            jnp.float32,
        )


class _BNParams(nn.Module):
    """Declare ``nn.BatchNorm``-compatible variables (params scale/bias + batch_stats
    mean/var) without executing the normalization — the Pallas branch folds them into
    the conv epilogue (``ops.conv3x3.fold_bn``)."""

    features: int

    @nn.compact
    def __call__(self):
        f = (self.features,)
        scale = self.param("scale", nn.initializers.ones, f, jnp.float32)
        bias = self.param("bias", nn.initializers.zeros, f, jnp.float32)
        mean = self.variable(
            "batch_stats", "mean", lambda s: jnp.zeros(s, jnp.float32), f
        )
        var = self.variable(
            "batch_stats", "var", lambda s: jnp.ones(s, jnp.float32), f
        )
        return scale, bias, mean.value, var.value


class TPUVideoCNN(nn.Module):
    """TPU-efficient per-frame CNN designed from measured v5e MXU utilization.

    No reference counterpart — an *additional* tower designed tpu-first for the
    serving north star.  Measured per-shape conv rates on v5e
    (scripts/perf_conv_shapes.py): 64-channel convs reach 26% of peak, 128ch 45%,
    256ch 65%, 512ch 88%.  ResNet-18 spends most FLOPs at 64 channels; this design:

    - a ViT-style ``patch×patch`` stride-``patch`` patch-embed stem (lowers to one
      GEMM with K = patch²·3 — no small-channel penalty, no space-to-depth copies),
    - residual 3×3 stages at 14² and 7², all ≥``widths[0]`` channels.

    Default widths (256, 512): ~1.0 GFLOP/frame at ~65-88%% utilization — measured
    ~6,300 fused inferences/s/chip vs ResNet-18's 1,970 (3.2×).
    """

    widths: Tuple[int, int] = (256, 512)
    blocks_per_stage: int = 1
    patch: int = 16
    conv_backend: str = "xla"  # "pallas" fuses the stage convs at eval (ops/conv3x3.py)
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, *, train: bool = False):
        use_pallas = self.conv_backend == "pallas" and not train

        def bn_relu(h, name):
            h = nn.BatchNorm(
                use_running_average=not train, momentum=0.9, dtype=self.dtype,
                name=f"{name}_bn",
            )(h)
            return nn.relu(h)

        # patch-embed stem.  Two input layouts share one parameter tree:
        #
        # - NHWC (B, H, W, 3) — training/eval path, nn.Conv(p×p, stride p).
        #   Measured caveat (scripts/perf_stem_int8_ab.py): XLA never
        #   GEMM-rewrites this conv — ~10 ms @4096 frames on v5e, 10% of floor.
        # - patch-major (B, H/p, W/p, p²·3) — the serving layout (ops/stem.py):
        #   the host ships patches contiguous, so the stem is one full-K GEMM
        #   (~4 ms bf16, ~3.5 ms via the int8 serving path).
        if x.shape[-1] == self.patch * self.patch * 3:
            kernel = _PatchKernelParams(
                self.widths[0], self.patch, name="stem_conv"
            )()
            h = x @ kernel.reshape(-1, self.widths[0]).astype(self.dtype)
        else:
            h = nn.Conv(
                self.widths[0], (self.patch, self.patch),
                strides=(self.patch, self.patch), padding="VALID", use_bias=False,
                dtype=self.dtype, name="stem_conv",
            )(x)
        h = bn_relu(h, "stem")

        for si, feats in enumerate(self.widths):
            if si > 0:
                h = nn.Conv(
                    feats, (3, 3), strides=(2, 2), padding="SAME", use_bias=False,
                    dtype=self.dtype, name=f"down{si}_conv",
                )(h)
                h = bn_relu(h, f"down{si}")
            for bi in range(self.blocks_per_stage):
                residual = h
                if use_pallas:
                    # Serving path: both stage convs + folded BN + ReLU (+ residual)
                    # run as fused Pallas kernels (ops/conv3x3.py) — identical
                    # variable tree to the XLA branch, so checkpoints interchange.
                    from ..ops.conv3x3 import conv3x3_bn_act, fold_bn

                    k_a = _Conv3x3Params(
                        feats, h.shape[-1], name=f"s{si}b{bi}a_conv"
                    )()
                    sa, ba = fold_bn(*_BNParams(feats, name=f"s{si}b{bi}a_bn")())
                    k_b = _Conv3x3Params(feats, feats, name=f"s{si}b{bi}b_conv")()
                    sb, bb = fold_bn(*_BNParams(feats, name=f"s{si}b{bi}b_bn")())
                    h2 = conv3x3_bn_act(h, k_a.astype(self.dtype), sa, ba, relu=True)
                    h = conv3x3_bn_act(
                        h2, k_b.astype(self.dtype), sb, bb,
                        residual=residual, relu=True,
                    )
                else:
                    h2 = nn.Conv(
                        feats, (3, 3), padding="SAME", use_bias=False,
                        dtype=self.dtype, name=f"s{si}b{bi}a_conv",
                    )(h)
                    h2 = bn_relu(h2, f"s{si}b{bi}a")
                    h2 = nn.Conv(
                        feats, (3, 3), padding="SAME", use_bias=False,
                        dtype=self.dtype, name=f"s{si}b{bi}b_conv",
                    )(h2)
                    h2 = nn.BatchNorm(
                        use_running_average=not train, momentum=0.9, dtype=self.dtype,
                        name=f"s{si}b{bi}b_bn",
                    )(h2)
                    h = nn.relu(h2 + residual)
        return jnp.mean(h, axis=(1, 2))


class TinyVideoCNN(nn.Module):
    """3-layer per-frame CNN for tests/CI (no reference counterpart; CI stand-in)."""

    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, *, train: bool = False):
        h = x
        for i, ch in enumerate((16, 32, 64)):
            h = nn.Conv(ch, (3, 3), strides=(2, 2), dtype=self.dtype, name=f"conv{i}")(h)
            h = nn.relu(h)
        return jnp.mean(h, axis=(1, 2))


CNN_FEATURE_DIMS = {
    "resnet18": 512,
    "mobilenet_v2": 1280,
    "tiny_cnn": 64,
    "tpu_cnn": 512,
    "tpu_cnn_large": 512,
}


class VideoEncoder(nn.Module):
    """Unified video encoder (reference ``VideoEncoder``, ``models.py:137-216``).

    Input ``(B, T, H, W, 3)`` — NHWC feature-last, the TPU-native layout (the reference
    uses torch NCHW; the loader emits feature-last directly).  Output
    ``(embedding (B, video_d_model), tokens (B, N, video_d_model))``.

    CNN backbones fold time into batch, GAP spatially, project to ``video_d_model``,
    then mean over frames (``models.py:208-216``); the ViT projects its pooled token.
    """

    backbone: str = "videomae_base"
    video_d_model: int = 768
    pool: str = "mean"
    remat: bool = False
    use_flash: bool = False
    flash_block_q: int = 512
    flash_block_k: int = 512
    flash_kernel: str = "lean"
    use_final_norm: bool = True
    conv_backend: str = "xla"
    gelu_approximate: bool = False
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, *, train: bool = False):
        B, T = x.shape[0], x.shape[1]
        x = x.astype(self.dtype)
        if self.backbone in VIT_CONFIGS:
            depth, d_model, heads = VIT_CONFIGS[self.backbone]
            emb, tokens = VideoViT(
                depth=depth, d_model=d_model, num_heads=heads, pool=self.pool,
                remat=self.remat, use_flash=self.use_flash,
                flash_block_q=self.flash_block_q, flash_block_k=self.flash_block_k,
                flash_kernel=self.flash_kernel,
                use_final_norm=self.use_final_norm,
                gelu_approximate=self.gelu_approximate, dtype=self.dtype,
                name="vit",
            )(x, train=train)
            proj = nn.Dense(self.video_d_model, dtype=self.dtype, name="projection")
            emb = proj(emb.astype(self.dtype)).astype(jnp.float32)
            tokens = proj(tokens)
            return emb, tokens

        if self.backbone == "resnet18":
            net = ResNet18(dtype=self.dtype, name="backbone")
        elif self.backbone == "mobilenet_v2":
            net = MobileNetV2(dtype=self.dtype, name="backbone")
        elif self.backbone == "tpu_cnn":
            net = TPUVideoCNN(
                conv_backend=self.conv_backend, dtype=self.dtype, name="backbone"
            )
        elif self.backbone == "tpu_cnn_large":
            # accuracy-oriented variant: wider/deeper, still ≥384-channel stages
            net = TPUVideoCNN(
                widths=(384, 512), blocks_per_stage=2,
                conv_backend=self.conv_backend, dtype=self.dtype, name="backbone",
            )
        elif self.backbone == "tiny_cnn":
            net = TinyVideoCNN(dtype=self.dtype, name="backbone")
        else:
            raise ValueError(f"Unknown video backbone: {self.backbone}")

        frames = x.reshape((B * T,) + x.shape[2:])
        feats = net(frames, train=train)  # (B*T, feat)
        feats = feats.reshape(B, T, -1)
        tokens = nn.Dense(self.video_d_model, dtype=self.dtype, name="projection")(feats)
        emb = jnp.mean(tokens, axis=1).astype(jnp.float32)  # temporal mean pool
        return emb, tokens


def build_video_encoder(config, dtype=None):
    m = config.model
    dtype = dtype or jnp.dtype(m.compute_dtype)
    backbone = m.video_backbone
    # The reference routes any string containing "videomae" or "/" to HuggingFace
    # (models.py:154, quirk Q10); map HF-style names onto the native ViT.
    if "/" in backbone or "videomae" in backbone.lower():
        if backbone not in VIT_CONFIGS:
            backbone = "videomae_base"
    return VideoEncoder(
        backbone=backbone,
        video_d_model=m.video_d_model,
        remat=m.remat_video,
        use_flash=m.use_flash_attention,
        flash_block_q=int(getattr(m, "flash_block_q", 512)),
        flash_block_k=int(getattr(m, "flash_block_k", 512)),
        flash_kernel=str(getattr(m, "flash_kernel", "lean")),
        use_final_norm=bool(getattr(m, "video_use_final_norm", True)),
        conv_backend=str(getattr(m, "conv_backend", "xla")),
        gelu_approximate=bool(getattr(m, "gelu_approximate", False)),
        dtype=dtype,
    )
