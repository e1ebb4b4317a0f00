"""Patch-major stem lowering: make the uint8 patch-embed a single clean GEMM.

The measured problem (scripts/perf_int8_stages.py, perf_stem_int8_ab.py,
perf_stem_xla_variants.py, v5e @4096 frames): the 16×16/stride-16 patch-embed
stem is one GEMM's worth of work (K = 16·16·3 = 768, floor ≈ 1-1.6 ms) but
every on-device lowering of the NHWC uint8 input pays for the patch *gather*:

| lowering | ms/step |
|---|---|
| XLA int8 conv (what ops/quant.int8_conv got) | 11.06 |
| XLA bf16 conv (what the flagship bf16 tower got) | 10.04 |
| XLA 6-D uint8 transpose + GEMM | 7.16 |
| XLA concat-of-strided-slices + GEMM | 35.2 |
| XLA 14 per-column full-K GEMMs | 12.6 |
| Pallas fused gather+GEMM kernel | blocked: the toolchain's remote Mosaic
  compiler SIGABRTs on any >2D int8 block (scripts/debug_stem_pallas*.py) |
| **patch-major input + XLA XOR/int8 GEMM (``stem_gemm_u8``)** | **3.45** |
| patch-major input + 2D Pallas fused kernel (``stem_gemm_u8_pallas``) | 5.70 |

The TPU-first fix is to not gather on the device at all.  The serving engine
owns the clip tensor end-to-end, so it can pick the HBM layout the MXU wants —
**patch-major**: ``(B, Hp, Wp, patch²·3)``, where the trailing 768 bytes are
one patch flattened ``(row, col, ch)`` row-major.  Same bytes as NHWC, a pure
byte-shuffle done once on the HOST at clip-assembly time (a cheap numpy view
change per 2.4 MB clip, amortized into decode), after which the stem is

    out = epilogue( (col_u8 − 128) @ W.reshape(768, C0) )

one full-K GEMM at the MXU's native efficiency, int8 or bf16.  XLA's GEMM
emitter beats the hand-written 2D Pallas version here (3.45 vs 5.70 ms — same
conclusion as ops/conv3x3.py), so ``stem_gemm_u8`` is the production path and
the Pallas kernel stays for the record.  Numerics note:
int8 stem values and their 768-term integer dot products stay < 2²⁴, so the
bf16-input/f32-accumulate MXU reproduces the int32 accumulate exactly — the
bf16 path is *numerically identical* to ``ops/quant.int8_conv``, not an
approximation.

No reference counterpart: the reference feeds NCHW floats and leaves the stem
to cuDNN (/root/reference/src/models/models.py:137-216).  The layout contract
is the TPU analogue of its channel-order choice.
"""
from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np


def pack_stem_weights(kernel_hwio: jax.Array) -> jax.Array:
    """(patch, patch, C_in, C0) HWIO conv kernel → (patch²·C_in, C0) GEMM matrix.

    Row order = ((row · patch) + col) · C_in + ch — the flattened-patch element
    order ``to_patch_major`` produces.
    """
    p, p2, cin, c0 = kernel_hwio.shape
    assert p == p2, "square patch kernels only"
    return kernel_hwio.reshape(p * p * cin, c0)


def center_u8(col: np.ndarray) -> np.ndarray:
    """HOST-side int8 wire encoding: ``clip(u8 − 128, −127, 127)`` as int8.

    One XOR + max on the same bytes (no int16 intermediate).  The single
    source of truth for the centered wire — used by ``to_patch_major``
    (``centered=True``) and by bench.py's wire A/B, so a wire-encoding change
    only ever happens here.
    """
    return np.maximum(
        np.bitwise_xor(col.view(np.int8), np.int8(-128)), np.int8(-127)
    )


def to_patch_major(
    frames: np.ndarray, patch: int = 16, *, centered: bool = False
) -> np.ndarray:
    """HOST-side layout shuffle: (..., H, W, C) uint8 → (..., Hp, Wp, patch²·C).

    Works on any leading batch/time dims.  This is the serving engine's clip
    layout for patch-embed towers; done once per clip at assembly time (numpy,
    ~GB/s — negligible next to JPEG decode).

    ``centered=True`` additionally ships the int8 *wire encoding* the
    quantized stem consumes: ``clip(u8 − 128, −127, ·)`` as int8 (one XOR +
    max on the same bytes).  The device program then feeds the GEMM directly —
    no on-device conversion pass over the 616 MB clip batch.
    """
    *lead, H, W, C = frames.shape
    Hp, Wp = H // patch, W // patch
    assert Hp * patch == H and Wp * patch == W, (frames.shape, patch)
    x = frames.reshape(*lead, Hp, patch, Wp, patch * C)
    x = np.moveaxis(x, -3, -2)  # (..., Hp, Wp, patch, patch·C)
    col = np.ascontiguousarray(x).reshape(*lead, Hp, Wp, patch * patch * C)
    if centered:
        col = center_u8(col)
    return col


def to_patch_major_jnp(frames: jax.Array, patch: int = 16) -> jax.Array:
    """Device-side version of ``to_patch_major`` (tests / fallbacks; the
    transpose costs ~5 ms/4096 frames on-chip — prefer the host version)."""
    *lead, H, W, C = frames.shape
    Hp, Wp = H // patch, W // patch
    x = frames.reshape(*lead, Hp, patch, Wp, patch * C)
    x = jnp.swapaxes(x, -3, -2)
    return x.reshape(*lead, Hp, Wp, patch * patch * C)


def is_patch_major(x, patch: int, cin: int = 3) -> bool:
    """Heuristic shape test: trailing dim equals patch²·C_in (vs C_in)."""
    return x.ndim >= 3 and x.shape[-1] == patch * patch * cin


def stem_gemm_u8(
    col_u8: jax.Array,
    w_packed: jax.Array,
    scale: jax.Array,
    bias: jax.Array,
    *,
    sub: int = 128,
    clip_lo: Optional[int] = -127,
    relu: bool = True,
    out_scale: Optional[float] = None,
    out_dtype=jnp.float32,
    mxu_dtype=jnp.int8,
) -> jax.Array:
    """Fused ``epilogue((col_u8 − sub) @ w_packed)`` on patch-major input.

    ``col_u8``: (..., Hp, Wp, K) uint8 patch-major clip (``to_patch_major``).
    ``w_packed``: (K, C0) in int8 (``mxu_dtype=jnp.int8``) or any float dtype
    (the caller casts; int8 values are exact in bf16).  ``scale``/``bias``:
    (C0,) f32 per-channel epilogue (requant scale / folded BN affine).
    ``out_scale`` additionally quantizes the activation (serving-resident int8
    path; pass ``out_dtype=jnp.int8``).  ``sub=128, clip_lo=-127`` reproduces
    the int8 path's input map; ``sub=0, clip_lo=None`` the normalize-folded
    bf16 path's raw 0..255 pixels.
    """
    K, c0 = w_packed.shape
    assert col_u8.shape[-1] == K, (col_u8.shape, w_packed.shape)
    assert sub in (0, 128), "only the raw (0) and int8-centered (128) maps exist"
    pre_centered = col_u8.dtype == jnp.int8  # wire encoding from to_patch_major(centered=True)
    if mxu_dtype == jnp.int8:
        # u8 − 128 ≡ bitcast-to-int8 XOR 0x80 (flip the top bit): one 1-byte
        # VPU op, no int16 intermediate (measured 3.45 vs 5.26 ms @4096 frames,
        # scripts/perf_stem_gemm2.py).  With the centered int8 wire encoding the
        # conversion happened on the host and the GEMM reads the input directly.
        # sub=0 is folded into the bias by the caller via ``128·Σ_k w[k,·]`` if
        # needed; this path assumes sub=128.
        assert sub == 128, "int8 MXU path centers at 128 (fold sub=0 into bias)"
        if pre_centered:
            x = col_u8
        else:
            # The byte map stays ENTIRELY in uint8 before one final bitcast.
            # The obvious int8 formulation — bitcast, then ^(-128), then
            # maximum(·, −127) — MISCOMPILES on the TPU backend (jax 0.9.0,
            # v5e): standalone, int8 maximum returns −128 for max(−128,−127);
            # fused with the consuming dot_general, the whole xor+max chain
            # returns wrong values for half the byte range
            # (scripts/debug_pm_micro{,2,3}.py hold the bisect ladder; CPU is
            # exact either way).  In u8 space the same map is
            # max(u8, clip_lo+128) then ^128, and both ops lower correctly —
            # verified exact at every byte value, standalone AND fused.
            x = col_u8
            if clip_lo is not None:
                x = jnp.maximum(x, jnp.uint8(clip_lo + 128))
            x = jax.lax.bitcast_convert_type(x ^ jnp.uint8(128), jnp.int8)
        acc = jax.lax.dot_general(
            x, w_packed, (((x.ndim - 1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32,
        ).astype(jnp.float32)
    else:
        x = col_u8.astype(mxu_dtype)  # u8 0..255 / centered −127..127, exact in bf16
        if pre_centered:
            if sub == 0:  # caller wants raw pixels back: undo the centering
                x = x + jnp.asarray(128, mxu_dtype)
        elif sub:
            x = x - jnp.asarray(sub, mxu_dtype)
        if clip_lo is not None and not pre_centered:
            x = jnp.maximum(x, jnp.asarray(clip_lo, mxu_dtype))
        acc = jax.lax.dot_general(
            x, w_packed.astype(mxu_dtype), (((x.ndim - 1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
    y = acc * scale.astype(jnp.float32) + bias.astype(jnp.float32)
    if relu:
        y = jnp.maximum(y, 0.0)
    if out_scale is not None:
        y = jnp.clip(jnp.round(y / out_scale), -127, 127)
    return y.astype(out_dtype)


def stem_gemm_reference(
    frames_u8, w_packed, scale, bias, *, patch=16, **kw
) -> jax.Array:
    """NHWC-input reference: device-side layout shuffle + ``stem_gemm_u8``."""
    col = to_patch_major_jnp(frames_u8, patch)
    return stem_gemm_u8(col, w_packed, scale, bias, **kw)


def verify_byte_map(device=None) -> None:
    """Preflight: prove the fused int8 byte map is exact ON THIS BACKEND.

    Runs every uint8 value through the ``stem_gemm_u8`` input map fused with
    an identity-weight int8 GEMM and compares against the exact integer
    reference ``clip(u8 − 128, −127, 127)``.  Raises ``RuntimeError`` on any
    mismatch.

    Exists because backends can miscompile this exact pattern: on TPU v5e
    (jax 0.9.0) the int8-space formulation (bitcast → XOR −128 → max −127)
    fused into the consuming dot_general returned wrong values for half the
    byte range while CPU was exact (caught live as id-acc 98.6 → 23.3;
    bisect ladder in scripts/debug_pm_micro{,2,3}.py).  The shipped u8-space
    map is verified exact, but a jax/XLA upgrade could regress it silently —
    serving deployments should run this once at engine build
    (``InferenceEngine(..., verify_byte_map=True)``), and the cross-run OOD
    scorers run it before spending minutes scoring a miscompiled program.

    Cost: one tiny (1×256)×(256×256) GEMM compile + run on ``device``
    (defaults to the backend ``jax.jit`` would pick).
    """
    col = np.arange(256, dtype=np.uint8).reshape(1, 256)
    w = np.eye(256, dtype=np.int8)
    fn = jax.jit(
        lambda c, w: stem_gemm_u8(
            c, w, jnp.ones((256,), jnp.float32), jnp.zeros((256,), jnp.float32),
            sub=128, clip_lo=-127, relu=False, mxu_dtype=jnp.int8,
        ),
        device=device,
    )
    got = np.asarray(fn(col, w)).reshape(256).astype(np.int32)
    ref = np.clip(np.arange(256, dtype=np.int32) - 128, -127, 127)
    bad = np.flatnonzero(got != ref)
    if bad.size:
        raise RuntimeError(
            f"int8 stem byte map MISCOMPILES on this backend: {bad.size}/256 "
            f"byte values wrong (first: u8={bad[0]} -> {got[bad[0]]}, want "
            f"{ref[bad[0]]}). The patch-major int8 serving path would produce "
            "garbage logits — do not serve. See tpuhar/ops/stem.py."
        )


def _pick_block_rows(M: int, target: int) -> int:
    """Largest divisor of M ≤ target that keeps sublanes aligned (mult of 8)."""
    best = 8 if M % 8 == 0 else 1
    d = 8
    while d <= min(M, target):
        if M % d == 0:
            best = d
        d += 8
    return best


def stem_gemm_u8_pallas(
    col_u8: jax.Array,
    w_packed: jax.Array,
    scale: jax.Array,
    bias: jax.Array,
    *,
    sub: int = 128,
    clip_lo: Optional[int] = -127,
    relu: bool = True,
    out_scale: Optional[float] = None,
    out_dtype=jnp.float32,
    mxu_dtype=jnp.int8,
    block_rows: int = 1568,
    interpret: bool = False,
) -> jax.Array:
    """Pallas fused version of ``stem_gemm_u8``: u8 in → (int8|bf16|f32) out.

    With patch-major input the whole stem is a 2D-block problem — the only
    shape class this toolchain's Mosaic compiles for int8 (see module
    docstring) — so the XOR input map, the full-K GEMM, and the epilogue all
    fuse into one kernel: HBM traffic is exactly ``u8 in + out``, no
    materialized int8 intermediate.  Measured SLOWER than the XLA path (5.70
    vs 3.45 ms @4096 frames) — kept as the documented negative result, off by
    default.  Two toolchain limits shaped it: only 2D int8 blocks compile,
    and ``jnp.maximum`` on int8 SIGABRTs Mosaic — so the ``clip_lo`` map runs
    in uint8 space OUTSIDE the kernel (one extra VPU pass; the same u8-space
    formulation the XLA path fuses for free — see ``stem_gemm_u8``), keeping
    the kernel itself XOR-only and the output bit-exact vs ``int8_conv``.
    """
    from jax.experimental import pallas as pl

    K, c0 = w_packed.shape
    lead = col_u8.shape[:-1]
    M = int(np.prod(lead))
    assert col_u8.shape[-1] == K
    assert sub == 128, "pallas path centers at 128 (fold sub=0 into bias)"
    BM = _pick_block_rows(M, block_rows)
    x_u8 = col_u8.reshape(M, K)
    if clip_lo is not None:
        x_u8 = jnp.maximum(x_u8, jnp.uint8(clip_lo + 128))
    x2 = jax.lax.bitcast_convert_type(x_u8, jnp.int8)
    acc_t = jnp.int32 if mxu_dtype == jnp.int8 else jnp.float32

    def kernel(x_ref, w_ref, s_ref, b_ref, o_ref):
        xi = x_ref[...] ^ jnp.int8(-128)
        xv = xi if mxu_dtype == jnp.int8 else xi.astype(mxu_dtype)
        acc = jax.lax.dot_general(
            xv, w_ref[...], (((1,), (0,)), ((), ())),
            preferred_element_type=acc_t,
        )
        y = acc.astype(jnp.float32) * s_ref[0] + b_ref[0]
        if relu:
            y = jnp.maximum(y, 0.0)
        if out_scale is not None:
            y = jnp.clip(jnp.round(y / out_scale), -127, 127)
        o_ref[...] = y.astype(o_ref.dtype)

    out = pl.pallas_call(
        kernel,
        grid=(M // BM,),
        in_specs=[
            pl.BlockSpec((BM, K), lambda m: (m, 0)),
            pl.BlockSpec((K, c0), lambda m: (0, 0)),
            pl.BlockSpec((1, c0), lambda m: (0, 0)),
            pl.BlockSpec((1, c0), lambda m: (0, 0)),
        ],
        out_specs=pl.BlockSpec((BM, c0), lambda m: (m, 0)),
        out_shape=jax.ShapeDtypeStruct((M, c0), out_dtype),
        interpret=interpret,
    )(
        x2,
        w_packed if mxu_dtype == jnp.int8 else w_packed.astype(mxu_dtype),
        scale.reshape(1, c0).astype(jnp.float32),
        bias.reshape(1, c0).astype(jnp.float32),
    )
    return out.reshape(*lead, c0)
