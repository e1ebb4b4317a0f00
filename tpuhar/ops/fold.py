"""Fold ImageNet normalization into patch-embed stem weights (serving rewrite).

``normalize_clip`` is a per-channel affine map ``y = x·s_c + o_c`` and a patch-embed
stem (VALID padding, stride == kernel — TPUVideoCNN's ``stem_conv`` and the ViT's
``tubelet/proj``) is linear with every output position seeing a *full* input window,
so the normalization folds exactly into the weights:

    W'[..., c, n] = W[..., c, n] · s_c                (scale per input channel)
    δ[n]          = Σ_{taps, c} o_c · W[..., c, n]    (constant offset contribution)

The offset lands in the next affine op: the ViT stem's conv bias (``b' = b + δ``), or
TPUVideoCNN's following BatchNorm running mean (``μ' = μ − δ``, since
``BN(h + δ) = BN'(h)``).  The rewritten model consumes RAW pixel values (uint8 cast
to the compute dtype, range 0..255) — the separate normalize pass and its HBM
round-trip (measured ~2.4 ms/step at batch 256, docs/BENCHMARKS.md) disappear, and
integers < 256 are exact in bfloat16 so the fold is bit-clean at the input.

NOT applicable to padded stems (ResNet-18's 7×7 pad-3: border outputs see zero
padding, so the offset contribution is not spatially constant) — ``fold_normalization``
returns ``changed=False`` for those and callers keep the normalize op.
"""
from __future__ import annotations

from typing import Dict, Tuple

import jax.numpy as jnp
import numpy as np

from .video import IMAGENET_MEAN, IMAGENET_STD


def _fold_kernel(kernel, mean, std):
    """Scale a (..., C_in, N) patch kernel; return (kernel', delta (N,))."""
    c_in = kernel.shape[-2]
    reps = c_in // len(mean)  # space-to-depth layouts tile the 3 RGB stats
    s = jnp.asarray((1.0 / 255.0) / np.tile(np.asarray(std), reps), kernel.dtype)
    o = jnp.asarray(-np.tile(np.asarray(mean), reps) / np.tile(np.asarray(std), reps))
    folded = kernel * s[..., :, None]
    taps_summed = kernel.astype(jnp.float32).reshape(-1, c_in, kernel.shape[-1]).sum(0)
    delta = o @ taps_summed  # (N,)
    return folded, delta


def fold_normalization(
    variables: Dict,
    config,
    *,
    mean=IMAGENET_MEAN,
    std=IMAGENET_STD,
) -> Tuple[Dict, bool]:
    """Rewrite ``variables`` so the model consumes raw 0..255 pixels.

    Returns ``(new_variables, changed)``; ``changed=False`` (variables untouched)
    when the configured backbone's stem is not an exactly-foldable patch embed.
    """
    import jax

    params = variables.get("params", {})
    ve = params.get("video_encoder")
    if ve is None:
        return variables, False

    new_vars = jax.tree.map(lambda x: x, variables)  # shallow-ish copy of the tree
    nve = new_vars["params"]["video_encoder"]

    backbone = getattr(config.model, "video_backbone", "")
    if "vit" in ve and "tubelet" in ve["vit"]:
        proj = dict(nve["vit"]["tubelet"]["proj"])
        folded, delta = _fold_kernel(proj["kernel"], mean, std)
        proj["kernel"] = folded
        proj["bias"] = (proj["bias"].astype(jnp.float32) + delta).astype(
            proj["bias"].dtype
        )
        nve["vit"] = dict(nve["vit"])
        nve["vit"]["tubelet"] = {"proj": proj}
        return new_vars, True

    if backbone.startswith("tpu_cnn") and "backbone" in ve:
        bb = dict(nve["backbone"])
        if "stem_conv" not in bb:
            return variables, False
        stem = dict(bb["stem_conv"])
        folded, delta = _fold_kernel(stem["kernel"], mean, std)
        stem["kernel"] = folded
        bb["stem_conv"] = stem
        nve["backbone"] = bb
        # BN(h+δ) == BN'(h) with μ' = μ − δ
        bs = new_vars.get("batch_stats", {})
        stats = bs.get("video_encoder", {}).get("backbone", {}).get("stem_bn")
        if stats is None:
            return variables, False
        nbs = dict(bs["video_encoder"])
        nbb = dict(nbs["backbone"])
        nbb["stem_bn"] = {
            "mean": (stats["mean"].astype(jnp.float32) - delta).astype(
                stats["mean"].dtype
            ),
            "var": stats["var"],
        }
        nbs["backbone"] = nbb
        new_vars["batch_stats"] = dict(bs)
        new_vars["batch_stats"]["video_encoder"] = nbs
        return new_vars, True

    return variables, False
