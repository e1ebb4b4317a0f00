#!/usr/bin/env python
"""ViT attack probes (round 4, follow-up to perf_vit_stages.py).

Stage-1 roofline findings (outputs/r4q/vit_stages.json, batch 64):
  - full model = 130.2 ms = 87% of the materialization floor (112.7);
  - the floor is 76% attention-score materialization (7.1 ms/block x 12);
  - merged QKV is a NEGATIVE (0.74 vs 0.48 ms);
  - the GEMM-phrased tubelet with an on-device 8-D transpose is pathological
    (14.5 ms vs 0.85 floor) but the real model runs an nn.Conv stem whose
    in-model cost is unknown — and r3 showed XLA runs stride==kernel convs at
    9%% of floor on the CNN stem (docs/BENCHMARKS.md).

This probe measures the remaining attack surface directly:
  t0_conv        the REAL nn.Conv tubelet at the serving shape
  t1_gemm_flat   GEMM on a pre-flattened (M,1536) operand (host-shuffle floor)
  t2_2gemm_pm    two-GEMM stem on the EXISTING uint8 patch-major serving wire
                 (B,T,14,14,768): kernel split into even/odd frame halves —
                 no device transpose, reuses the CNN wire layout
  m0_gelu_exact  bf16 Dense + erf GELU (what PreNormBlock runs)
  m1_gelu_tanh   bf16 Dense + tanh GELU (serving-candidate)
  a0_flax_mha    the exact flax nn.MultiHeadDotProductAttention the model runs
  a1_bf16_sm     manual core, softmax fully in bf16 (no f32 round trip)

Run ON the TPU: python scripts/perf_vit_stages2.py [batch=64]
Output: markdown table (stderr) + one JSON line (stdout).
"""
import json
import sys
import time
from functools import partial
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

MXU_BF16 = 197e12
HBM_BW = 819e9


def log(m):
    print(m, file=sys.stderr, flush=True)


def main():
    import jax
    import jax.numpy as jnp
    from jax import lax

    B = int(sys.argv[1]) if len(sys.argv) > 1 else 64
    d, heads, N = 384, 6, 1568
    hd = d // heads
    npr = np.random.default_rng(0)

    def chain(f, x, iters=12):
        @partial(jax.jit, static_argnames=("it",))
        def run(x, it):
            def body(i, carry):
                x, acc = carry
                out = f(x + (acc * 1e-20).astype(x.dtype))
                return x, acc + jnp.sum(out).astype(jnp.float32) * 1e-12

            _, acc = lax.fori_loop(0, it, body, (x, jnp.float32(0)))
            return acc

        def t(k):
            t0 = time.perf_counter()
            _ = float(np.asarray(run(x, k)))
            return time.perf_counter() - t0

        t(1); t(iters)
        trials = [(t(iters) - t(1)) / (iters - 1) for _ in range(3)]
        return float(np.median(trials)) * 1e3

    def W(*shape):
        return jax.device_put(
            (npr.normal(0, 0.02, shape)).astype(np.float32).astype(jnp.bfloat16)
        )

    units, floors = {}, {}

    # ---- tubelet stem variants ---------------------------------------------------
    clip = jax.device_put(
        (npr.random((B, 16, 224, 224, 3)) * 2 - 1).astype(np.float32).astype(jnp.bfloat16)
    )
    clip_h = np.asarray(jax.device_get(clip)).astype(np.float32)
    wt = W(2, 16, 16, 3, d)          # nn.Conv kernel layout (T,H,W,C,out)
    wt_flat = wt.reshape(1536, d)
    f_t = 2 * B * 8 * 14 * 14 * 1536 * d
    clip_bytes = B * 16 * 224 * 224 * 3 * 2
    tok_bytes = B * N * d * 2
    floors["tubelet"] = max(f_t / MXU_BF16, (clip_bytes + tok_bytes) / HBM_BW) * 1e3

    null_clip = chain(lambda x: x * jnp.bfloat16(1.0001), clip)
    log(f"null over clip operand: {null_clip:.3f} ms")

    def t0_conv(x):
        return lax.conv_general_dilated(
            x, wt, (2, 16, 16), "VALID",
            dimension_numbers=lax.conv_dimension_numbers(
                x.shape, wt.shape, ("NTHWC".replace("T", "D"), "DHWIO", "NDHWC")
            ),
        )

    # flax nn.Conv uses NDHWC/DHWIO for 3-D convs — phrase identically
    units["t0_conv"] = chain(t0_conv, clip)

    flat = jax.device_put(
        np.ascontiguousarray(
            clip_h.reshape(B, 8, 2, 14, 16, 14, 16, 3)
            .transpose(0, 1, 3, 5, 2, 4, 6, 7)
            .reshape(B * 8 * 14 * 14, 1536)
        ).astype(np.float32)
    ).astype(jnp.bfloat16)
    units["t1_gemm_flat"] = chain(lambda x: x @ wt_flat, flat)

    # the CNN serving wire: (B,T,14,14,768) patch-major per frame
    pm = jax.device_put(
        np.ascontiguousarray(
            clip_h.reshape(B, 16, 14, 16, 14, 16, 3)
            .transpose(0, 1, 2, 4, 3, 5, 6)
            .reshape(B, 16, 14, 14, 768)
        ).astype(np.float32)
    ).astype(jnp.bfloat16)
    # kernel halves: frame-even / frame-odd rows of wt, in the per-frame
    # patch-major K order (16h,16w,3c -> h*w*c flattened = same order)
    wt_e = wt[0].reshape(768, d)
    wt_o = wt[1].reshape(768, d)

    def t2_2gemm_pm(x):
        x6 = x.reshape(B, 8, 2, 14, 14, 768)
        ya = lax.dot_general(
            x6[:, :, 0], wt_e, (((4,), (0,)), ((), ()))
        )
        yb = lax.dot_general(
            x6[:, :, 1], wt_o, (((4,), (0,)), ((), ()))
        )
        return ya + yb

    units["t2_2gemm_pm"] = chain(t2_2gemm_pm, pm)

    # exactness: t2 vs t0 (same weights, same input)
    y_conv = np.asarray(
        jax.device_get(jax.jit(t0_conv)(clip))
    ).reshape(B, 8, 14, 14, d)
    y_pm = np.asarray(jax.device_get(jax.jit(t2_2gemm_pm)(pm)))
    md = float(np.max(np.abs(y_conv.astype(np.float32) - y_pm.astype(np.float32))))
    rel = md / max(1e-9, float(np.max(np.abs(y_conv.astype(np.float32)))))
    log(f"exactness t2_2gemm_pm vs conv: maxdiff {md:.4g} (rel {rel:.3g})")

    # ---- MLP GELU variants --------------------------------------------------------
    import flax.linen as nn

    flat_tok = jax.device_put(
        npr.normal(0, 1, (B * N, d)).astype(np.float32).astype(jnp.bfloat16)
    )
    w1, w2 = W(d, 4 * d), W(4 * d, d)
    null_tok = chain(lambda x: x * jnp.bfloat16(1.0001), flat_tok)
    log(f"null over token operand: {null_tok:.3f} ms")

    def m0(x):
        return nn.gelu(x @ w1, approximate=False) @ w2

    def m1(x):
        return nn.gelu(x @ w1, approximate=True) @ w2

    units["m0_gelu_exact"] = chain(m0, flat_tok)
    units["m1_gelu_tanh"] = chain(m1, flat_tok)
    f_mlp = 2 * 2 * B * N * d * 4 * d
    floors["mlp"] = max(f_mlp / MXU_BF16, 10 * tok_bytes / HBM_BW) * 1e3

    # numeric drift of tanh vs exact GELU at bf16 (serving-tolerance evidence)
    g_exact = np.asarray(jax.device_get(jax.jit(m0)(flat_tok))).astype(np.float32)
    g_tanh = np.asarray(jax.device_get(jax.jit(m1)(flat_tok))).astype(np.float32)
    gd = float(np.max(np.abs(g_exact - g_tanh)))
    grel = float(
        np.sqrt(np.mean((g_exact - g_tanh) ** 2)) / np.sqrt(np.mean(g_exact**2))
    )
    log(f"gelu tanh-vs-exact: maxdiff {gd:.4g}, rel RMS {grel:.3g}")

    # ---- attention variants -------------------------------------------------------
    tokens = jax.device_put(
        npr.normal(0, 1, (B, N, d)).astype(np.float32).astype(jnp.bfloat16)
    )
    null_tok3 = chain(lambda x: x * jnp.bfloat16(1.0001), tokens)

    mha = nn.MultiHeadDotProductAttention(
        num_heads=heads, qkv_features=d, dtype=jnp.bfloat16
    )
    cpu = jax.devices("cpu")[0]
    with jax.default_device(cpu):
        mvars = jax.device_get(
            jax.jit(mha.init)(jax.random.PRNGKey(0), np.zeros((1, 8, d), np.float32), np.zeros((1, 8, d), np.float32))
        )

    def a0(x):
        return mha.apply(mvars, x, x, deterministic=True)

    units["a0_flax_mha"] = chain(a0, tokens)

    q3 = jax.device_put(
        npr.normal(0, 1, (B, heads, N, hd)).astype(np.float32).astype(jnp.bfloat16)
    )
    null_q3 = chain(lambda x: x * jnp.bfloat16(1.0001), q3)

    def a1(q):
        s = jnp.einsum("bhqd,bhkd->bhqk", q, q) * jnp.bfloat16(1.0 / np.sqrt(hd))
        p = jax.nn.softmax(s, axis=-1)  # bf16 end-to-end
        return jnp.einsum("bhqk,bhkd->bhqd", p, q)

    units["a1_bf16_sm"] = chain(a1, q3)
    f_s = 2 * B * heads * N * N * hd
    sc_bytes = B * heads * N * N * 2
    floors["attn_core"] = max(
        2 * f_s / MXU_BF16, (2 * tok_bytes + 3 * sc_bytes) / HBM_BW
    ) * 1e3

    nulls = {
        "t0_conv": null_clip, "t1_gemm_flat": null_tok, "t2_2gemm_pm": null_clip,
        "m0_gelu_exact": null_tok, "m1_gelu_tanh": null_tok,
        "a0_flax_mha": null_tok3, "a1_bf16_sm": null_q3,
    }
    fkey = {
        "t0_conv": "tubelet", "t1_gemm_flat": "tubelet", "t2_2gemm_pm": "tubelet",
        "m0_gelu_exact": "mlp", "m1_gelu_tanh": "mlp",
        "a0_flax_mha": "attn_core", "a1_bf16_sm": "attn_core",
    }
    log("\n| unit | ms | net | floor | util |")
    log("|---|---|---|---|---|")
    for k, v in units.items():
        net = v - nulls[k]
        fl = floors[fkey[k]]
        log(f"| {k} | {v:.3f} | {net:.3f} | {fl:.3f} | {fl / max(net, 1e-9):.2f} |")

    print(json.dumps({
        "bench": "vit_stages2", "batch": B,
        "nulls_ms": {k: round(v, 3) for k, v in
                     {"clip": null_clip, "tok": null_tok, "q3": null_q3}.items()},
        "units_ms": {k: round(v, 3) for k, v in units.items()},
        "floors_ms": {k: round(v, 3) for k, v in floors.items()},
        "tubelet_pm_maxdiff": md, "tubelet_pm_rel": rel,
        "gelu_tanh_maxdiff": gd, "gelu_tanh_rel_rms": grel,
    }))


if __name__ == "__main__":
    main()
