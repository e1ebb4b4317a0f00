"""Pallas fused 3×3 SAME conv for small square feature planes (TPUVideoCNN stages).

Motivation (docs/BENCHMARKS.md roofline): the flagship TPUVideoCNN serving step's
residual stages carry ~82% of the tower FLOPs at 14²/7² spatial.  This kernel
computes ``relu(conv3x3(x) · scale + bias [+ residual])`` as one Pallas program so
the MXU sees plain dense GEMMs and the BN/ReLU/residual epilogue never round-trips
through HBM.

Formulation — *masked shifted matmuls over flattened planes* (no padded compute):

- Input ``(N, S, S, C)`` is viewed as rows ``(M, C)`` with ``M = N·S·S``; row ``r``
  maps to frame ``r // S²``, ``y = (r // S) % S``, ``x = r % S``.
- A SAME 3×3 conv is nine tap-matmuls: ``y[r] = Σ_t  x[r + off_t] @ W_t`` with
  ``off_t = (dy·S + dx)``, ``dy,dx ∈ {-1,0,1}`` — each tap is a *constant row shift*
  of the whole flattened array.
- Rows where a tap crosses the plane edge contribute zero; that validity depends only
  on ``(y, x)``, so each tap multiplies its shifted block by a cheap ``(BM, 1)``
  mask before the dot.  Frame-crossing reads are always edge-invalid, so masks also
  make the frame boundaries exact — no per-frame padding, no wasted FLOPs (compare
  the 16×16-padded-plane alternative: 256/196 = 1.31× garbage compute).
- The grid blocks M; each step reads its ``(BM, C)`` block plus 16-row halos from the
  neighbour blocks (three BlockSpecs over the same array, clamped at the ends —
  out-of-range halo rows are masked, so clamping is safe).  Weights ``(9C, C_out)``
  stay resident in VMEM across the whole grid.
- ``im2col=True`` materializes the ``(BM, 9C)`` block in VMEM scratch and issues one
  K=9C GEMM instead of nine accumulate-chained dots.

Measured head-to-head at the flagship shapes (scripts/perf_conv3x3.py, v5e):
XLA's conv emitter runs at 76.5% (s0: 4096×14²×256) / 89.1% (s1: 4096×7²×512) of
bf16 peak, the 9-dot Pallas variant at 49.5% / 68.7% — the sublane-unaligned shift
copies dominate.  **XLA wins at these shapes**; the kernel stays available
(``model.conv_backend="pallas"``) but off by default, mirroring the flash-attention
finding (docs/BENCHMARKS.md).

No reference counterpart: the reference (torch/CUDA) leaves convs to cuDNN; this is
the TPU-native equivalent of a hand-fused inference conv kernel.
"""
from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

HALO = 16  # ≥ S+1 for every supported plane size (S ≤ 15); sublane-aligned for bf16


def _kernel(*refs, S, BM, relu, has_res, im2col):
    if has_res:
        x_prev, x_cur, x_next, w_ref, scale_ref, bias_ref, res_ref = refs[:7]
        rest = refs[7:]
    else:
        x_prev, x_cur, x_next, w_ref, scale_ref, bias_ref = refs[:6]
        res_ref = None
        rest = refs[6:]
    if im2col:
        out_ref, col_ref = rest
    else:
        (out_ref,) = rest
        col_ref = None

    i = pl.program_id(0)
    # (BM + 2·HALO, C) extended block: tap offsets span [-(S+1), S+1] ⊂ [-HALO, HALO)
    ext = jnp.concatenate(
        [x_prev[BM - HALO :, :], x_cur[:, :], x_next[:HALO, :]], axis=0
    )

    rows = i * BM + jax.lax.broadcasted_iota(jnp.int32, (BM, 1), 0)
    rem = rows % (S * S)
    yy = rem // S
    xx = rem % S

    cout = out_ref.shape[-1]
    C = x_cur.shape[-1]

    def tap(ty, tx):
        off = (ty - 1) * S + (tx - 1)
        src = ext[HALO + off : HALO + off + BM, :]
        valid = (
            (yy + (ty - 1) >= 0)
            & (yy + (ty - 1) < S)
            & (xx + (tx - 1) >= 0)
            & (xx + (tx - 1) < S)
        )
        return src * valid.astype(src.dtype)

    if im2col:
        # (BM, 9C) im2col block in VMEM scratch → one dense K=9C GEMM instead of
        # nine accumulate-chained dots.
        for ty in range(3):
            for tx in range(3):
                t = 3 * ty + tx
                col_ref[:, t * C : (t + 1) * C] = tap(ty, tx)
        acc = jnp.dot(col_ref[:, :], w_ref[:, :], preferred_element_type=jnp.float32)
    else:
        acc = jnp.zeros((BM, cout), jnp.float32)
        for ty in range(3):
            for tx in range(3):
                t = 3 * ty + tx
                acc = acc + jnp.dot(
                    tap(ty, tx),
                    w_ref[t * C : (t + 1) * C, :],
                    preferred_element_type=jnp.float32,
                )

    y = acc * scale_ref[0] + bias_ref[0]
    if res_ref is not None:
        y = y + res_ref[:, :].astype(jnp.float32)
    if relu:
        y = jnp.maximum(y, 0.0)
    out_ref[:, :] = y.astype(out_ref.dtype)


def _pick_block_m(M: int) -> Optional[int]:
    for bm in (512, 256, 128, 64, 32, 16):
        if M % bm == 0:
            return bm
    return None


def _xla_reference(x, kernel, scale, bias, residual, relu):
    """Fallback / numerics reference: XLA conv + folded affine (+ residual, ReLU)."""
    y = jax.lax.conv_general_dilated(
        x.astype(x.dtype),
        kernel.astype(x.dtype),
        window_strides=(1, 1),
        padding="SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.float32,
    )
    y = y * scale + bias
    if residual is not None:
        y = y + residual.astype(jnp.float32)
    if relu:
        y = jnp.maximum(y, 0.0)
    return y.astype(x.dtype)


def conv3x3_bn_act(
    x: jax.Array,
    kernel: jax.Array,
    scale: jax.Array,
    bias: jax.Array,
    *,
    residual: Optional[jax.Array] = None,
    relu: bool = True,
    block_m: Optional[int] = None,
    im2col: bool = False,
    interpret: Optional[bool] = None,
    force_pallas: bool = False,
) -> jax.Array:
    """Fused ``act(conv3x3_same(x) · scale + bias [+ residual])`` on square planes.

    Args:
      x: ``(N, S, S, C_in)`` activations (bf16/f32), NHWC.
      kernel: ``(3, 3, C_in, C_out)`` HWIO conv weights (flax ``nn.Conv`` layout).
      scale, bias: ``(C_out,)`` folded-BatchNorm affine, applied in f32.
      residual: optional ``(N, S, S, C_out)`` added before the activation.
      relu: apply ReLU at the end.
      block_m: rows per grid step (must divide ``N·S·S``); auto-picked if None.
      im2col: single K=9C GEMM from a VMEM im2col scratch instead of 9 chained dots.
      interpret: run the Pallas interpreter (defaults to True off-TPU so tests/init
        exercise the same code path on CPU).
      force_pallas: raise instead of falling back to XLA when shapes don't fit
        (testing hook).

    Falls back to the XLA expression whenever the Pallas layout constraints don't
    hold (tiny init shapes, channel counts off the 128-lane grid) — callers get one
    total function with identical semantics either way.
    """
    N, S, S2, C = x.shape
    cout = kernel.shape[-1]
    assert S == S2, f"square planes only, got {(S, S2)}"
    M = N * S * S
    bm = block_m or _pick_block_m(M)
    ok = (
        bm is not None
        and S + 1 <= HALO
        and C % 128 == 0
        and cout % 128 == 0
        and M // bm >= 1
    )
    if not ok:
        if force_pallas:
            raise ValueError(
                f"conv3x3 pallas layout unsupported: M={M} S={S} C={C}->{cout}"
            )
        return _xla_reference(x, kernel, scale, bias, residual, relu)

    if interpret is None:
        interpret = jax.default_backend() != "tpu"

    xf = x.reshape(M, C)
    w = kernel.reshape(9 * C, cout).astype(x.dtype)
    scale2 = scale.reshape(1, cout).astype(jnp.float32)
    bias2 = bias.reshape(1, cout).astype(jnp.float32)
    nm = M // bm

    x_spec_prev = pl.BlockSpec((bm, C), lambda i: (jnp.maximum(i - 1, 0), 0))
    x_spec_cur = pl.BlockSpec((bm, C), lambda i: (i, 0))
    x_spec_next = pl.BlockSpec((bm, C), lambda i: (jnp.minimum(i + 1, nm - 1), 0))
    w_spec = pl.BlockSpec((9 * C, cout), lambda i: (0, 0))
    vec_spec = pl.BlockSpec((1, cout), lambda i: (0, 0))
    io_spec = pl.BlockSpec((bm, cout), lambda i: (i, 0))

    in_specs = [x_spec_prev, x_spec_cur, x_spec_next, w_spec, vec_spec, vec_spec]
    args = [xf, xf, xf, w, scale2, bias2]
    if residual is not None:
        in_specs.append(io_spec)
        args.append(residual.reshape(M, cout))

    scratch = [pltpu.VMEM((bm, 9 * C), x.dtype)] if im2col else []
    flops = 2 * M * 9 * C * cout
    # input read ×3 (halo BlockSpec views) + weights + output write (+ residual read)
    bytes_accessed = (
        3 * M * C * x.dtype.itemsize
        + 9 * C * cout * x.dtype.itemsize
        + M * cout * x.dtype.itemsize
        + (M * cout * x.dtype.itemsize if residual is not None else 0)
    )
    out = pl.pallas_call(
        functools.partial(
            _kernel, S=S, BM=bm, relu=relu,
            has_res=residual is not None, im2col=im2col,
        ),
        grid=(nm,),
        in_specs=in_specs,
        out_specs=io_spec,
        out_shape=jax.ShapeDtypeStruct((M, cout), x.dtype),
        scratch_shapes=scratch,
        cost_estimate=pl.CostEstimate(
            flops=flops,
            bytes_accessed=bytes_accessed,
            transcendentals=0,
        ),
        interpret=interpret,
    )(*args)
    return out.reshape(N, S, S, cout)


def fold_bn(scale, bias, mean, var, eps: float = 1e-5):
    """BatchNorm running stats → (scale', bias') for the fused epilogue (f32)."""
    s = scale.astype(jnp.float32) * jax.lax.rsqrt(var.astype(jnp.float32) + eps)
    b = bias.astype(jnp.float32) - mean.astype(jnp.float32) * s
    return s, b
