"""Post-training int8 quantization for the serving path.

The serving bottleneck is the video tower's activation bandwidth and MXU rate at bf16
(see docs/DESIGN.md perf model); int8 halves activation traffic and doubles MXU
throughput on TPU.  This module provides:

- symmetric per-output-channel weight quantization,
- per-tensor activation scale calibration (absmax over calibration batches),
- quantized conv/dense primitives (int8 × int8 → int32 accumulate, rescale in f32),
- a calibrate-and-quantize driver for the Flax ResNet-18 backbone producing a
  quantized parameter tree consumed by ``QuantResNet18``.

Accuracy contract: activations are quantized per tensor after the preceding ReLU
(non-negative → effectively 7-bit unsigned range used symmetrically); weights per
output channel.  Golden tests check end-to-end logit drift on random nets stays small.
"""
from __future__ import annotations

from typing import Dict, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn


def quantize_weights(w: jax.Array, axis: int = -1) -> Tuple[jax.Array, jax.Array]:
    """Symmetric per-channel int8 weight quantization along ``axis`` (output channels).

    Returns ``(w_int8, scale)`` with ``w ≈ w_int8 * scale`` (scale broadcastable).
    """
    reduce_axes = tuple(i for i in range(w.ndim) if i != (axis % w.ndim))
    absmax = jnp.max(jnp.abs(w), axis=reduce_axes, keepdims=True)
    scale = jnp.maximum(absmax, 1e-8) / 127.0
    w_q = jnp.clip(jnp.round(w / scale), -127, 127).astype(jnp.int8)
    return w_q, scale.astype(jnp.float32)


def quantize_activations(x: jax.Array, scale: jax.Array) -> jax.Array:
    """Per-tensor symmetric int8 activation quantization with a calibrated scale."""
    return jnp.clip(jnp.round(x / scale), -127, 127).astype(jnp.int8)


def int8_conv(
    x_q: jax.Array,
    w_q: jax.Array,
    x_scale,
    w_scale: jax.Array,
    *,
    strides=(1, 1),
    padding="SAME",
) -> jax.Array:
    """int8 NHWC conv with int32 accumulation, rescaled to f32.

    ``w_scale`` is per-output-channel ``(1,1,1,K)``-broadcastable.
    """
    dn = jax.lax.conv_dimension_numbers(x_q.shape, w_q.shape, ("NHWC", "HWIO", "NHWC"))
    acc = jax.lax.conv_general_dilated(
        x_q, w_q, strides, padding, dimension_numbers=dn,
        preferred_element_type=jnp.int32,
    )
    return acc.astype(jnp.float32) * (x_scale * w_scale.reshape(1, 1, 1, -1))


def int8_dense(x_q, w_q, x_scale, w_scale):
    acc = jax.lax.dot_general(
        x_q, w_q, (((x_q.ndim - 1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32,
    )
    return acc.astype(jnp.float32) * (x_scale * w_scale.reshape(-1))


def fold_bn(conv_kernel, bn_scale, bn_bias, bn_mean, bn_var, eps: float = 1e-5):
    """Fold inference-mode BatchNorm into the preceding conv: returns (kernel', bias').

    ``BN(conv(x)) = conv(x)·g + b`` with ``g = scale/sqrt(var+eps)`` and
    ``b = bias − mean·g``; folding removes one full elementwise pass over the
    activation tensor per conv.
    """
    g = bn_scale / jnp.sqrt(bn_var + eps)
    kernel = conv_kernel * g.reshape(1, 1, 1, -1)
    bias = bn_bias - bn_mean * g
    return kernel, bias


# ---------------------------------------------------------------------------------
# Quantized ResNet-18 backbone
# ---------------------------------------------------------------------------------
def _observed(stats: Dict, name: str, x: jax.Array) -> None:
    stats[name] = max(stats.get(name, 0.0), float(jnp.max(jnp.abs(x))))


def calibrate_resnet18(params, batch_stats, frames) -> Dict[str, float]:
    """Run calibration frames through the f32 ResNet-18, recording per-site absmax.

    Returns ``{site_name: absmax}`` used to fix activation scales.  Sites are the
    inputs of every conv (post previous ReLU).
    """
    stats: Dict[str, float] = {}

    # re-run the forward manually mirroring ResNet18's structure so we can observe
    # every conv input
    p, bs = params, batch_stats
    x = jnp.asarray(frames)
    _observed(stats, "stem", x)
    x = _conv_bn_relu(x, p["stem_conv"], p["stem_bn"], bs["stem_bn"], strides=(2, 2), pad=[(3, 3), (3, 3)])
    x = nn.max_pool(x, (3, 3), strides=(2, 2), padding=[(1, 1), (1, 1)])
    for li in range(4):
        for bi in range(2):
            name = f"layer{li}_{bi}"
            bp, bbs = p[name], bs[name]
            strides = (2, 2) if (bi == 0 and li > 0) else (1, 1)
            _observed(stats, f"{name}.in", x)
            h = _conv_bn_relu(x, bp["conv1"], bp["bn1"], bbs["bn1"], strides=strides, pad=[(1, 1), (1, 1)])
            _observed(stats, f"{name}.mid", h)
            h = _conv_bn(h, bp["conv2"], bp["bn2"], bbs["bn2"], strides=(1, 1), pad=[(1, 1), (1, 1)])
            res = x
            if "downsample_conv" in bp:
                res = _conv_bn(x, bp["downsample_conv"], bp["downsample_bn"], bbs["downsample_bn"], strides=strides, pad="VALID")
            x = nn.relu(h + res)
    return stats


def _conv_bn_relu(x, conv_p, bn_p, bn_s, *, strides, pad):
    return nn.relu(_conv_bn(x, conv_p, bn_p, bn_s, strides=strides, pad=pad))


def _conv_bn(x, conv_p, bn_p, bn_s, *, strides, pad):
    kernel, bias = fold_bn(
        conv_p["kernel"], bn_p["scale"], bn_p["bias"], bn_s["mean"], bn_s["var"]
    )
    dn = jax.lax.conv_dimension_numbers(x.shape, kernel.shape, ("NHWC", "HWIO", "NHWC"))
    return (
        jax.lax.conv_general_dilated(
            x, kernel, strides, pad, dimension_numbers=dn,
            preferred_element_type=jnp.float32,
        )
        + bias
    )


def quantize_resnet18(params, batch_stats, act_stats: Dict[str, float]) -> Dict:
    """Fold BN + quantize every conv; returns the quantized parameter tree."""

    def site_scale(name):
        return jnp.float32(max(act_stats.get(name, 1.0), 1e-6) / 127.0)

    q: Dict = {"act_scales": {k: site_scale(k) for k in act_stats}}

    def pack(conv_p, bn_p, bn_s):
        kernel, bias = fold_bn(
            conv_p["kernel"], bn_p["scale"], bn_p["bias"], bn_s["mean"], bn_s["var"]
        )
        w_q, w_s = quantize_weights(kernel, axis=-1)
        return {"w_q": w_q, "w_scale": w_s.reshape(-1), "bias": bias}

    q["stem"] = pack(params["stem_conv"], params["stem_bn"], batch_stats["stem_bn"])
    for li in range(4):
        for bi in range(2):
            name = f"layer{li}_{bi}"
            bp, bbs = params[name], batch_stats[name]
            entry = {
                "conv1": pack(bp["conv1"], bp["bn1"], bbs["bn1"]),
                "conv2": pack(bp["conv2"], bp["bn2"], bbs["bn2"]),
            }
            if "downsample_conv" in bp:
                entry["downsample"] = pack(
                    bp["downsample_conv"], bp["downsample_bn"], bbs["downsample_bn"]
                )
            q[name] = entry
    return q


def quant_resnet18_forward(q: Dict, frames: jax.Array) -> jax.Array:
    """int8 ResNet-18 feature extractor: frames (B,H,W,3) f32 → (B,512) f32."""
    scales = q["act_scales"]

    def qconv(x, packed, site, *, strides, pad, relu):
        xs = scales[site]
        x_q = quantize_activations(x, xs)
        y = int8_conv(
            x_q, packed["w_q"], xs, packed["w_scale"], strides=strides, padding=pad
        ) + packed["bias"]
        return nn.relu(y) if relu else y

    x = qconv(frames, q["stem"], "stem", strides=(2, 2), pad=[(3, 3), (3, 3)], relu=True)
    x = nn.max_pool(x, (3, 3), strides=(2, 2), padding=[(1, 1), (1, 1)])
    for li in range(4):
        for bi in range(2):
            name = f"layer{li}_{bi}"
            entry = q[name]
            strides = (2, 2) if (bi == 0 and li > 0) else (1, 1)
            h = qconv(
                x, entry["conv1"], f"{name}.in", strides=strides,
                pad=[(1, 1), (1, 1)], relu=True,
            )
            h = qconv(
                h, entry["conv2"], f"{name}.mid", strides=(1, 1),
                pad=[(1, 1), (1, 1)], relu=False,
            )
            res = x
            if "downsample" in entry:
                res = qconv(
                    x, entry["downsample"], f"{name}.in", strides=strides,
                    pad="VALID", relu=False,
                )
            x = nn.relu(h + res)
    return jnp.mean(x, axis=(1, 2))


def quant_resnet18_forward_resident(q: Dict, frames: jax.Array) -> jax.Array:
    """int8-*resident* ResNet-18: inter-conv activations live as int8 in HBM.

    The baseline ``quant_resnet18_forward`` is bandwidth-bound on v5e (measured
    1.02× bf16, docs/BENCHMARKS.md roofline) because every block-trunk activation
    has 2-3 consumers (conv1's quantize, the skip add, optionally the downsample
    conv's quantize) and therefore round-trips HBM in f32.  Producer-side
    quantization feeds all consumers from the int8 tensor — conv1 and the
    downsample conv read it directly (bit-identical codes to the baseline path);
    the identity skip reads ``deq(x_q)`` fused into conv2's epilogue.  The stem's
    max-pool runs on int8: max-pooling commutes exactly with monotonic
    round/clip quantization (the window max survives pooling, so the calibrated
    post-pool scale is also the pre-pool absmax).

    Numerics: identical to the baseline except identity skips consume
    ``deq(quantize(x))`` — one extra int8 rounding per identity block (pinned by
    ``tests/test_quant.py::test_resnet18_resident_matches_baseline``).
    """
    scales = q["act_scales"]

    def conv_f32(x_q, packed, x_scale, *, strides, pad, relu):
        y = int8_conv(
            x_q, packed["w_q"], x_scale, packed["w_scale"], strides=strides,
            padding=pad,
        ) + packed["bias"]
        return nn.relu(y) if relu else y

    y = conv_f32(
        quantize_activations(frames, scales["stem"]), q["stem"], scales["stem"],
        strides=(2, 2), pad=[(3, 3), (3, 3)], relu=True,
    )
    site = "layer0_0.in"
    x_q = nn.max_pool(
        quantize_activations(y, scales[site]), (3, 3), strides=(2, 2),
        padding=[(1, 1), (1, 1)],
    )
    for li in range(4):
        for bi in range(2):
            name = f"layer{li}_{bi}"
            entry = q[name]
            strides = (2, 2) if (bi == 0 and li > 0) else (1, 1)
            h = conv_f32(
                x_q, entry["conv1"], scales[site], strides=strides,
                pad=[(1, 1), (1, 1)], relu=True,
            )
            h_q = quantize_activations(h, scales[f"{name}.mid"])
            o = conv_f32(
                h_q, entry["conv2"], scales[f"{name}.mid"], strides=(1, 1),
                pad=[(1, 1), (1, 1)], relu=False,
            )
            if "downsample" in entry:
                res = conv_f32(
                    x_q, entry["downsample"], scales[site], strides=strides,
                    pad="VALID", relu=False,
                )
            else:
                res = x_q.astype(jnp.float32) * scales[site]
            y = nn.relu(o + res)
            nxt = (
                f"layer{li}_{bi + 1}.in" if bi == 0
                else (f"layer{li + 1}_0.in" if li < 3 else None)
            )
            if nxt is not None:
                site = nxt
                x_q = quantize_activations(y, scales[site])
    return jnp.mean(y, axis=(1, 2))


# ---------------------------------------------------------------------------------
# Quantized TPUVideoCNN backbone (the flagship serving tower)
# ---------------------------------------------------------------------------------
def _tpucnn_layout(params) -> Tuple[int, int]:
    """Infer (num_stages, blocks_per_stage) from a TPUVideoCNN param tree."""
    stages = 1
    while f"down{stages}_conv" in params:
        stages += 1
    blocks = 0
    while f"s0b{blocks}a_conv" in params:
        blocks += 1
    return stages, blocks


def calibrate_tpucnn(params, batch_stats, frames) -> Dict[str, float]:
    """Per-site absmax over calibration frames for the TPUVideoCNN forward.

    Mirrors ``models/video.TPUVideoCNN.__call__`` (eval mode) layer by layer; sites
    are conv inputs (post previous ReLU).  ``frames`` are normalized f32 — or raw
    0..255 pixels when the normalize fold (ops/fold.py) was applied to ``params``
    first; the calibration simply observes whatever distribution serving will see.
    """
    stats: Dict[str, float] = {}
    p, bs = params, batch_stats
    stages, blocks = _tpucnn_layout(p)
    patch = p["stem_conv"]["kernel"].shape[0]

    x = jnp.asarray(frames)
    _observed(stats, "stem", x)
    x = _conv_bn_relu(
        x, p["stem_conv"], p["stem_bn"], bs["stem_bn"],
        strides=(patch, patch), pad="VALID",
    )
    for si in range(stages):
        if si > 0:
            _observed(stats, f"down{si}.in", x)
            x = _conv_bn_relu(
                x, p[f"down{si}_conv"], p[f"down{si}_bn"], bs[f"down{si}_bn"],
                strides=(2, 2), pad="SAME",
            )
        for bi in range(blocks):
            name = f"s{si}b{bi}"
            _observed(stats, f"{name}.in", x)
            h = _conv_bn_relu(
                x, p[f"{name}a_conv"], p[f"{name}a_bn"], bs[f"{name}a_bn"],
                strides=(1, 1), pad="SAME",
            )
            _observed(stats, f"{name}.mid", h)
            h = _conv_bn(
                h, p[f"{name}b_conv"], p[f"{name}b_bn"], bs[f"{name}b_bn"],
                strides=(1, 1), pad="SAME",
            )
            x = nn.relu(h + x)
    return stats


def quantize_tpucnn(
    params, batch_stats, act_stats: Dict[str, float], *, input_fold=None
) -> Dict:
    """Fold BN + per-channel int8 quantize every TPUVideoCNN conv.

    ``input_fold=(mean, std)`` additionally folds the ImageNet normalization INTO the
    stem so the quantized forward consumes RAW uint8 pixels with the exact int8 map
    ``x_q = u8 − 128`` (no f32 normalize pass, no calibrated input quantize):
    ``normalized = (u8/255 − m)/s = (u8−128)·a + c`` with ``a_c = 1/(255·s_c)`` and
    ``c_c = (128/255 − m_c)/s_c``; ``a`` scales the stem kernel's input-channel dim
    and ``c`` lands in the stem bias — exact because the stem is a VALID-padding
    patch embed where every output position sees a full input window (same condition
    as ops/fold.py).  The only approximation is ``u8 == 0 → −128`` clipped to −127,
    a one-LSB error on pure-black pixels.
    """

    def site_scale(name):
        return jnp.float32(max(act_stats.get(name, 1.0), 1e-6) / 127.0)

    stages, blocks = _tpucnn_layout(params)

    def pack(prefix):
        kernel, bias = fold_bn(
            params[f"{prefix}_conv"]["kernel"],
            params[f"{prefix}_bn"]["scale"],
            params[f"{prefix}_bn"]["bias"],
            batch_stats[f"{prefix}_bn"]["mean"],
            batch_stats[f"{prefix}_bn"]["var"],
        )
        if prefix == "stem" and input_fold is not None:
            mean, std = (jnp.asarray(v, jnp.float32) for v in input_fold)
            a = 1.0 / (255.0 * std)  # (3,)
            c = (128.0 / 255.0 - mean) / std
            # bias gets the constant-offset contribution BEFORE the kernel rescale
            taps_summed = kernel.reshape(-1, kernel.shape[-2], kernel.shape[-1]).sum(0)
            bias = bias + c @ taps_summed
            kernel = kernel * a[:, None]
        w_q, w_s = quantize_weights(kernel, axis=-1)
        return {"w_q": w_q, "w_scale": w_s.reshape(-1), "bias": bias}

    q: Dict = {
        "act_scales": {k: site_scale(k) for k in act_stats},
        "layout": (stages, blocks),
        "patch": int(params["stem_conv"]["kernel"].shape[0]),
        "input_fold": input_fold is not None,
        "stem": pack("stem"),
    }
    for si in range(stages):
        if si > 0:
            q[f"down{si}"] = pack(f"down{si}")
        for bi in range(blocks):
            name = f"s{si}b{bi}"
            q[name] = {"a": pack(f"{name}a"), "b": pack(f"{name}b")}
    return q


def _static_int(v, name: str) -> int:
    """Coerce quantized-tree scalar metadata to a Python int.

    ``jax.device_put(qtree)`` turns the tree's Python-int metadata into 0-d
    device arrays; any *staged op* on those inside a jit trace yields a tracer
    (omnistaging), which breaks layout detection and stride arguments. Concrete
    0-d arrays coerce fine; a traced value gets a clear error instead of a
    TracerBoolConversionError deep in the forward.
    """
    if isinstance(v, int):
        return v
    try:
        return int(np.asarray(v))
    # JAXTypeError covers both ConcretizationTypeError (int(tracer)) and its
    # sibling TracerArrayConversionError (np.asarray(tracer)) — the latter is
    # what jax 0.9.0 actually raises here, and it is NOT a subclass of the
    # former (verified; ADVICE r3).
    except jax.errors.JAXTypeError as e:
        raise ValueError(
            f"quantized-tree metadata {name!r} must be static (a Python int or "
            "concrete array), but it is a traced value — pass the quantized "
            "tree as a closure/constant, not as a jit argument"
        ) from e


def _is_patch_major(q: Dict, frames: jax.Array) -> bool:
    """True when ``frames`` carries the serving patch-major layout
    ``(B, H/p, W/p, p²·3)`` (ops/stem.py) instead of NHWC ``(B, H, W, 3)``."""
    p = _static_int(q["patch"], "patch")
    return frames.ndim == 4 and frames.shape[-1] == p * p * 3


def _stem_patch_major(
    q: Dict, col_u8: jax.Array, *, out_scale=None, out_dtype=jnp.float32
) -> jax.Array:
    """Patch-major uint8 stem: one XOR + full-K int8 GEMM + requant epilogue.

    Replaces the int8 conv lowering (11.06 → 3.45 ms @4096 frames on v5e —
    ops/stem.py has the full measurement table).  Bit-identical to the
    ``input_fold`` conv stem: same ``clip(u8−128, −127, ·)`` map, and the
    768-term int8 dot products are exact in either accumulator.

    ``out_scale`` fuses the follow-on ``quantize_activations`` into the GEMM
    epilogue (same round/clip semantics — bit-exact), so the resident path
    never materializes the f32 stem activation (822 MB at the serving shape).
    """
    from .stem import stem_gemm_u8

    if not q.get("input_fold"):
        raise ValueError(
            "patch-major frames require a quantized tree built with input_fold "
            "(the stem must consume raw uint8)"
        )
    stem = q["stem"]
    k = stem["w_q"]
    return stem_gemm_u8(
        col_u8, k.reshape(-1, k.shape[-1]), stem["w_scale"], stem["bias"],
        sub=128, clip_lo=-127, relu=True, out_scale=out_scale,
        out_dtype=out_dtype, mxu_dtype=jnp.int8,
    )


def quant_tpucnn_forward(q: Dict, frames: jax.Array) -> jax.Array:
    """int8 TPUVideoCNN feature extractor → (B, widths[-1]) f32 features.

    ``frames`` is (B,H,W,3): normalized f32, or RAW uint8 when the tree was built
    with ``input_fold`` (the stem then consumes ``u8 − 128`` int8 directly) — or
    the patch-major serving layout (B,H/p,W/p,p²·3) uint8 (``ops/stem.py``),
    which swaps the stem conv for the measured-faster XOR+GEMM lowering.
    """
    scales = q["act_scales"]
    stages, blocks = (_static_int(v, "layout") for v in q["layout"])
    patch = _static_int(q["patch"], "patch")

    def qconv(x, packed, site, *, strides, pad, relu):
        xs = scales[site]
        x_q = quantize_activations(x, xs)
        y = int8_conv(
            x_q, packed["w_q"], xs, packed["w_scale"], strides=strides, padding=pad
        ) + packed["bias"]
        return nn.relu(y) if relu else y

    if _is_patch_major(q, frames):
        x = _stem_patch_major(q, frames)
    elif q.get("input_fold"):
        x_q = jnp.clip(frames.astype(jnp.int16) - 128, -127, 127).astype(jnp.int8)
        x = nn.relu(
            int8_conv(
                x_q, q["stem"]["w_q"], jnp.float32(1.0), q["stem"]["w_scale"],
                strides=(patch, patch), padding="VALID",
            )
            + q["stem"]["bias"]
        )
    else:
        x = qconv(
            frames, q["stem"], "stem", strides=(patch, patch), pad="VALID", relu=True
        )
    for si in range(stages):
        if si > 0:
            x = qconv(
                x, q[f"down{si}"], f"down{si}.in", strides=(2, 2), pad="SAME",
                relu=True,
            )
        for bi in range(blocks):
            name = f"s{si}b{bi}"
            h = qconv(
                x, q[name]["a"], f"{name}.in", strides=(1, 1), pad="SAME", relu=True
            )
            h = qconv(
                h, q[name]["b"], f"{name}.mid", strides=(1, 1), pad="SAME", relu=False
            )
            x = nn.relu(h + x)
    return jnp.mean(x, axis=(1, 2))


def quant_tpucnn_forward_resident(q: Dict, frames: jax.Array) -> jax.Array:
    """int8-*resident* TPUVideoCNN forward: inter-conv activations live as int8.

    Same quantized tree and bit-identical conv inputs as ``quant_tpucnn_forward``
    through the first residual block; the difference is *where* quantization
    happens.  The baseline path quantizes at each conv's input (consumer side), so
    the tensor XLA materializes between layers is the f32 activation — and on the
    residual trunk that f32 tensor has TWO consumers (next conv's quantize + the
    skip add), forcing a full f32 round trip to HBM (~0.8 GB per intermediate at
    the serving shape).  Here the producer quantizes (its relu+round+clip chain
    fuses into the conv epilogue) and every consumer — including the skip add,
    which reads ``deq(x_q)`` — starts from the int8 tensor, so the only buffers
    between convs are int8: 4× less activation traffic.

    Numerics: identical to the baseline path except the residual add consumes
    ``deq(quantize(x))`` instead of the exact f32 ``x`` — one extra symmetric-int8
    rounding error on the skip path per block (bounded by the drift tests).
    """
    scales = q["act_scales"]
    stages, blocks = (_static_int(v, "layout") for v in q["layout"])
    patch = _static_int(q["patch"], "patch")

    def conv_f32(x_q, packed, x_scale, *, strides, pad, relu):
        y = int8_conv(
            x_q, packed["w_q"], x_scale, packed["w_scale"], strides=strides,
            padding=pad,
        ) + packed["bias"]
        return nn.relu(y) if relu else y

    # consumer site following each block, in baseline-path naming
    def next_site(si, bi):
        if bi + 1 < blocks:
            return f"s{si}b{bi + 1}.in"
        if si + 1 < stages:
            return f"down{si + 1}.in"
        return None  # last block output feeds the (f32) pooled feature head

    site = "s0b0.in"
    if _is_patch_major(q, frames):
        # producer-side quantize fused into the stem GEMM epilogue (bit-exact
        # vs quantize_activations) — skips the 822 MB f32 stem intermediate
        x_q = _stem_patch_major(
            q, frames, out_scale=scales[site], out_dtype=jnp.int8
        )
    else:
        if q.get("input_fold"):
            x_in = jnp.clip(frames.astype(jnp.int16) - 128, -127, 127).astype(
                jnp.int8
            )
            y = conv_f32(
                x_in, q["stem"], jnp.float32(1.0), strides=(patch, patch),
                pad="VALID", relu=True,
            )
        else:
            y = conv_f32(
                quantize_activations(frames, scales["stem"]), q["stem"],
                scales["stem"], strides=(patch, patch), pad="VALID", relu=True,
            )
        x_q = quantize_activations(y, scales[site])
    for si in range(stages):
        if si > 0:
            y = conv_f32(
                x_q, q[f"down{si}"], scales[site], strides=(2, 2), pad="SAME",
                relu=True,
            )
            site = f"s{si}b0.in"
            x_q = quantize_activations(y, scales[site])
        for bi in range(blocks):
            name = f"s{si}b{bi}"
            h = conv_f32(
                x_q, q[name]["a"], scales[site], strides=(1, 1), pad="SAME",
                relu=True,
            )
            h_q = quantize_activations(h, scales[f"{name}.mid"])
            o = conv_f32(
                h_q, q[name]["b"], scales[f"{name}.mid"], strides=(1, 1),
                pad="SAME", relu=False,
            )
            y = nn.relu(o + x_q.astype(jnp.float32) * scales[site])
            nxt = next_site(si, bi)
            if nxt is not None:
                site = nxt
                x_q = quantize_activations(y, scales[site])
    return jnp.mean(y, axis=(1, 2))
