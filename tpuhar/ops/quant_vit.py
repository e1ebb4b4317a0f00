"""int8 PTQ for the VideoMAE ViT video tower.

The reference serves its HF VideoMAE tower in f32 torch with no quantized path
(``/root/reference/src/models/models.py:137-216``).  On TPU v5e the MXU runs int8
at twice the bf16 rate, and at the flagship stream (1568 tokens, d_model 384) the
ViT's FLOPs split ~60% dense matmuls (QKV/out-proj/MLP: ``24·d²`` per token per
block) vs ~40% attention score/value matmuls (``4·s·d`` per token per block) — so
quantizing every dense layer (symmetric per-output-channel int8 weights,
per-tensor calibrated activation scales) while keeping attention in bf16 bounds
the ceiling speedup near 1.4×; the measured number lives in docs/BENCHMARKS.md.

Same three-phase contract as the CNN paths in ``ops/quant.py``:

- ``calibrate_vit``: a numerically-exact f32 mirror of ``models/video.VideoViT``
  (pinned against the flax apply in tests) that records per-site absmax,
- ``quantize_vit``: packs int8 weights + f32 scales/biases/LN params; the merged
  QKV projection is quantized as ONE ``(d, 3·H·dh)`` matmul (fewer, larger MXU
  calls; per-output-channel scales make the concatenation exact),
- ``quant_vit_forward``: int8 dense + bf16 attention + f32 LayerNorm statistics,
  residual stream held in bf16 (halves the HBM stream traffic vs f32 at zero
  measured parity cost — the bf16 flagship already runs its stream in bf16).

``input_fold=(mean, std)`` applies the exact uint8 fold from ``ops/fold.py`` /
``quantize_tpucnn`` to the tubelet stem (a VALID stride==kernel patch embed, so
every output sees a full input window): the forward then consumes RAW uint8
pixels as ``u8 − 128`` int8 with no f32 normalize pass.
"""
from __future__ import annotations

from typing import Dict, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from .quant import _observed, int8_dense, quantize_activations, quantize_weights

_LN_EPS = 1e-6  # flax nn.LayerNorm default


def _vit_layout(params) -> Tuple[int, int, int]:
    """Infer (depth, num_heads, head_dim) from a VideoViT param tree."""
    depth = 0
    while f"block{depth}" in params:
        depth += 1
    qk = params["block0"]["self_attn"]["query"]["kernel"]
    return depth, int(qk.shape[1]), int(qk.shape[2])


def _patchify(x: jax.Array, kt: int, kh: int, kw: int) -> jax.Array:
    """(B, T, H, W, C) → (B, N, kt·kh·kw·C) tubelet patches.

    Patch-major order (kt, kh, kw, C) matches the flax ``nn.Conv`` kernel layout
    reshaped to ``(kt·kh·kw·C, d)``; token order (t, h, w) matches the conv
    output's ``reshape(B, -1, d)``.  Exactness is pinned in tests.
    """
    B, T, H, W, C = x.shape
    x = x.reshape(B, T // kt, kt, H // kh, kh, W // kw, kw, C)
    x = x.transpose(0, 1, 3, 5, 2, 4, 6, 7)
    return x.reshape(B, (T // kt) * (H // kh) * (W // kw), kt * kh * kw * C)


def _ln(x: jax.Array, p) -> jax.Array:
    """LayerNorm with f32 statistics regardless of the stream dtype."""
    xf = x.astype(jnp.float32)
    mu = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.var(xf, axis=-1, keepdims=True)
    y = (xf - mu) * jax.lax.rsqrt(var + _LN_EPS)
    return y * p["scale"].astype(jnp.float32) + p["bias"].astype(jnp.float32)


def _attention_f32(h: jax.Array, ap, heads: int) -> jax.Array:
    """f32 mirror of ``flax.linen.MultiHeadDotProductAttention`` (self-attn).

    Returns the pre-out-projection context ``(B, N, heads·head_dim)`` — the
    out-proj input is a calibration site, which flax's fused module hides.
    """
    q = jnp.einsum("bnd,dhk->bnhk", h, ap["query"]["kernel"]) + ap["query"]["bias"]
    k = jnp.einsum("bnd,dhk->bnhk", h, ap["key"]["kernel"]) + ap["key"]["bias"]
    v = jnp.einsum("bnd,dhk->bnhk", h, ap["value"]["kernel"]) + ap["value"]["bias"]
    dh = q.shape[-1]
    scores = jnp.einsum("bqhd,bkhd->bhqk", q / jnp.sqrt(jnp.float32(dh)), k)
    attn = jax.nn.softmax(scores, axis=-1)
    ctx = jnp.einsum("bhqk,bkhd->bqhd", attn, v)
    B, N = ctx.shape[0], ctx.shape[1]
    return ctx.reshape(B, N, heads * dh)


def vit_forward_f32(params, clip: jax.Array, *, stats: Dict = None) -> jax.Array:
    """f32 mirror of ``VideoViT.__call__`` (eval) → post-final-norm tokens.

    When ``stats`` is given, records per-site absmax for quantization: the inputs
    of every dense matmul (``tubelet``, ``block{i}.{qkv_in,attn_out_in,mlp_in,
    mlp_mid}``).  Exactness vs the flax apply is pinned in tests — calibration
    observes exactly the distribution the quantized program will see.
    """
    depth, heads, dh = _vit_layout(params)
    tk = params["tubelet"]["proj"]["kernel"]
    kt, kh, kw = int(tk.shape[0]), int(tk.shape[1]), int(tk.shape[2])
    d_model = int(tk.shape[-1])

    def see(name, x):
        if stats is not None:
            _observed(stats, name, x)

    x = jnp.asarray(clip, jnp.float32)
    see("tubelet", x)
    tokens = _patchify(x, kt, kh, kw)
    w = tk.reshape(-1, d_model)
    x = tokens @ w + params["tubelet"]["proj"]["bias"]
    x = x + params["pos_encoding"][:, : x.shape[1]]
    for i in range(depth):
        bp = params[f"block{i}"]
        h = _ln(x, bp["norm1"])
        see(f"block{i}.qkv_in", h)
        ctx = _attention_f32(h, bp["self_attn"], heads)
        see(f"block{i}.attn_out_in", ctx)
        op = bp["self_attn"]["out"]
        out = ctx @ op["kernel"].reshape(heads * dh, d_model) + op["bias"]
        x = x + out
        h = _ln(x, bp["norm2"])
        see(f"block{i}.mlp_in", h)
        mid = jax.nn.gelu(
            h @ bp["mlp_in"]["kernel"] + bp["mlp_in"]["bias"], approximate=False
        )
        see(f"block{i}.mlp_mid", mid)
        x = x + (mid @ bp["mlp_out"]["kernel"] + bp["mlp_out"]["bias"])
    if "final_norm" in params:
        x = _ln(x, params["final_norm"])
    return x


def calibrate_vit(params, batch_stats, clips) -> Dict[str, float]:
    """Per-site absmax over calibration clips (normalized f32, (N, T, H, W, 3)).

    ``batch_stats`` is accepted for signature parity with the CNN calibrators
    (``ops/quant.py``) and ignored — the ViT carries none.
    """
    del batch_stats
    stats: Dict[str, float] = {}
    vit_forward_f32(params, jnp.asarray(clips), stats=stats)
    return stats


def quantize_vit(params, batch_stats, act_stats: Dict[str, float], *, input_fold=None) -> Dict:
    """Pack the int8 ViT tree: merged-QKV/out/MLP int8 weights + f32 LN/pos/biases.

    ``input_fold=(mean, std)`` folds the ImageNet normalization into the tubelet
    stem exactly as ``quantize_tpucnn`` does for the patch-embed stem: the
    forward then consumes raw uint8 as ``u8 − 128`` (see module docstring).
    """
    del batch_stats
    depth, heads, dh = _vit_layout(params)
    tk = params["tubelet"]["proj"]["kernel"]
    d_model = int(tk.shape[-1])

    def site_scale(name):
        return jnp.float32(max(act_stats.get(name, 1.0), 1e-6) / 127.0)

    kernel = tk.reshape(-1, d_model)
    bias = params["tubelet"]["proj"]["bias"]
    if input_fold is not None:
        mean, std = (jnp.asarray(v, jnp.float32) for v in input_fold)
        a = 1.0 / (255.0 * std)  # (3,)
        c = (128.0 / 255.0 - mean) / std
        # kernel rows are (kt, kh, kw, C)-ordered: scale each row by its channel's
        # ``a``; the constant offset ``c`` sums over taps into the bias (exact —
        # VALID stride==kernel, every output sees a full window; ops/quant.py:340)
        taps = tk.reshape(-1, 3, d_model)
        bias = bias + jnp.einsum("c,kcd->d", c, taps)
        kernel = (taps * a[:, None]).reshape(-1, d_model)
    w_q, w_s = quantize_weights(kernel, axis=-1)
    q: Dict = {
        "act_scales": {k: site_scale(k) for k in act_stats},
        "depth": depth,
        "heads": heads,
        "head_dim": dh,
        "tubelet": (int(tk.shape[0]), int(tk.shape[1]), int(tk.shape[2])),
        "input_fold": input_fold is not None,
        "pos": params["pos_encoding"],
        "stem": {"w_q": w_q, "w_scale": w_s.reshape(-1), "bias": bias},
    }
    if "final_norm" in params:
        q["final_norm"] = dict(params["final_norm"])

    def pack_dense(kernel, bias):
        w_q, w_s = quantize_weights(kernel, axis=-1)
        return {"w_q": w_q, "w_scale": w_s.reshape(-1), "bias": bias}

    for i in range(depth):
        bp = params[f"block{i}"]
        ap = bp["self_attn"]
        qkv_kernel = jnp.concatenate(
            [ap[n]["kernel"].reshape(d_model, heads * dh) for n in ("query", "key", "value")],
            axis=1,
        )
        qkv_bias = jnp.concatenate(
            [ap[n]["bias"].reshape(heads * dh) for n in ("query", "key", "value")]
        )
        q[f"block{i}"] = {
            "norm1": dict(bp["norm1"]),
            "norm2": dict(bp["norm2"]),
            "qkv": pack_dense(qkv_kernel, qkv_bias),
            "out": pack_dense(
                ap["out"]["kernel"].reshape(heads * dh, d_model), ap["out"]["bias"]
            ),
            "mlp_in": pack_dense(bp["mlp_in"]["kernel"], bp["mlp_in"]["bias"]),
            "mlp_out": pack_dense(bp["mlp_out"]["kernel"], bp["mlp_out"]["bias"]),
        }
    return q


def quant_vit_forward(
    q: Dict, clip: jax.Array, *, attn_dtype=jnp.bfloat16, stream_dtype=jnp.bfloat16
) -> jax.Array:
    """int8 ViT forward → post-final-norm tokens ``(B, N, d_model)`` f32.

    ``clip`` is (B, T, H, W, 3): normalized f32, or RAW uint8 when the tree was
    built with ``input_fold``.  Dense matmuls run int8×int8→int32 on the MXU with
    f32 rescale epilogues (XLA fuses them); attention runs in ``attn_dtype``
    (bf16 — its softmax in f32); the residual stream lives in ``stream_dtype``.
    """
    scales = q["act_scales"]
    heads, dh = q["heads"], q["head_dim"]
    kt, kh, kw = q["tubelet"]

    def qdense(x_f32, packed, site):
        xs = scales[site]
        x_q = quantize_activations(x_f32, xs)
        return int8_dense(x_q, packed["w_q"], xs, packed["w_scale"]) + packed["bias"]

    if q["input_fold"]:
        tok = _patchify(clip.astype(jnp.int16), kt, kh, kw)
        tok_q = jnp.clip(tok - 128, -127, 127).astype(jnp.int8)
        x = (
            int8_dense(tok_q, q["stem"]["w_q"], jnp.float32(1.0), q["stem"]["w_scale"])
            + q["stem"]["bias"]
        )
    else:
        tok = _patchify(clip.astype(jnp.float32), kt, kh, kw)
        x = qdense(tok, q["stem"], "tubelet")
    B, N = x.shape[0], x.shape[1]
    x = (x + q["pos"][:, :N]).astype(stream_dtype)

    inv_sqrt_dh = jnp.asarray(1.0 / np.sqrt(dh), attn_dtype)
    for i in range(q["depth"]):
        bq = q[f"block{i}"]
        h = _ln(x, bq["norm1"])
        qkv = qdense(h, bq["qkv"], f"block{i}.qkv_in")
        qkv = qkv.reshape(B, N, 3, heads, dh).astype(attn_dtype)
        qh, kh_, vh = qkv[:, :, 0], qkv[:, :, 1], qkv[:, :, 2]
        scores = jnp.einsum("bqhd,bkhd->bhqk", qh * inv_sqrt_dh, kh_)
        attn = jax.nn.softmax(scores.astype(jnp.float32), axis=-1).astype(attn_dtype)
        ctx = jnp.einsum("bhqk,bkhd->bqhd", attn, vh).reshape(B, N, heads * dh)
        out = qdense(ctx.astype(jnp.float32), bq["out"], f"block{i}.attn_out_in")
        x = x + out.astype(stream_dtype)
        h = _ln(x, bq["norm2"])
        mid = jax.nn.gelu(qdense(h, bq["mlp_in"], f"block{i}.mlp_in"), approximate=False)
        o = qdense(mid, bq["mlp_out"], f"block{i}.mlp_mid")
        x = x + o.astype(stream_dtype)
    if "final_norm" in q:
        return _ln(x, q["final_norm"])
    return x.astype(jnp.float32)
