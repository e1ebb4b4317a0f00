#!/usr/bin/env python
"""Per-stage roofline decomposition of the VideoMAE-S serving step (VERDICT r3 #4).

The ViT tower serves 609-612 inf/s (12% of north star) with no floor analysis:
88% of its step was unaccounted attention/MLP/LayerNorm time.  This script
gives videomae_small the `perf_int8_stages.py` treatment at the serving shape
(batch B, 16 frames, 224² → N = 8·14·14 = 1568 tokens, d = 384, 6 heads):

- times each UNIT of one transformer block (LayerNorm, QKV projections,
  QKᵀ scores+softmax, AV, output proj, MLP in+GELU, MLP out) plus the tubelet
  stem and the full model, all with the chained-in-jit-loop methodology;
- sets each against its per-unit floor: max(FLOPs / MXU peak, bytes / HBM bw);
- A/Bs the two candidate optimizations the analysis motivates:
  (a) merged-QKV (one (d, 3d) GEMM instead of three (d, d)),
  (b) f32-scores vs bf16-scores attention.

Run ON the TPU (each unit is one remote compile):
    python scripts/perf_vit_stages.py [batch=64]

Output: markdown table (stderr) + one JSON line (stdout).
"""
import json
import sys
import time
from functools import partial
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

MXU_BF16 = 197e12  # v5e peak bf16 FLOP/s
HBM_BW = 819e9     # v5e HBM GB/s


def log(m):
    print(m, file=sys.stderr, flush=True)


def main():
    import jax
    import jax.numpy as jnp
    from jax import lax

    B = int(sys.argv[1]) if len(sys.argv) > 1 else 64
    d, heads, depth, N = 384, 6, 12, 1568
    hd = d // heads
    dt = jnp.bfloat16
    npr = np.random.default_rng(0)

    def chain(f, x, iters):
        """Chained-loop time of ``f`` (x-dependent each iteration) in seconds/step."""

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

        iters_k = iters
        t(1); t(iters_k)
        trials = [
            ((t_k := t(iters_k)) - t(1)) / (iters_k - 1) for _ in range(3)
        ]
        return float(np.median(trials))

    iters = 12
    tokens = jax.device_put(
        npr.normal(0, 1, (B, N, d)).astype(np.float32).astype(jnp.bfloat16)
    )
    flat = jax.device_put(
        npr.normal(0, 1, (B * N, d)).astype(np.float32).astype(jnp.bfloat16)
    )

    # weights (random — timing only)
    def W(*shape):
        return jax.device_put(
            (npr.normal(0, 0.02, shape)).astype(np.float32).astype(jnp.bfloat16)
        )

    wq, wk, wv, wo = W(d, d), W(d, d), W(d, d), W(d, d)
    wqkv = W(d, 3 * d)
    w1, w2 = W(d, 4 * d), W(4 * d, d)

    toks_bytes = B * N * d * 2

    units = {}
    floors = {}

    # null unit: loop/dependence overhead (the +acc pass over the operand)
    log("timing null unit ...")
    t_null = chain(lambda x: x * jnp.bfloat16(1.0001), tokens, iters) * 1e3
    log(f"null (dependence + 1 elementwise pass): {t_null:.3f} ms")

    log("timing LayerNorm ...")
    def ln(x):
        mu = jnp.mean(x.astype(jnp.float32), axis=-1, keepdims=True)
        var = jnp.var(x.astype(jnp.float32), axis=-1, keepdims=True)
        return ((x - mu) * lax.rsqrt(var + 1e-6)).astype(x.dtype)

    units["layernorm"] = chain(ln, tokens, iters) * 1e3
    floors["layernorm"] = 2 * toks_bytes / HBM_BW * 1e3  # read + write

    log("timing QKV separate ...")
    def qkv_sep(x):
        return (x @ wq) + (x @ wk) + (x @ wv)

    units["qkv_3gemm"] = chain(qkv_sep, flat, iters) * 1e3
    f = 3 * 2 * B * N * d * d
    floors["qkv_3gemm"] = max(f / MXU_BF16, (3 * toks_bytes + toks_bytes) / HBM_BW) * 1e3

    log("timing QKV merged ...")
    units["qkv_merged"] = chain(lambda x: x @ wqkv, flat, iters) * 1e3
    floors["qkv_merged"] = max(f / MXU_BF16, (toks_bytes + 3 * toks_bytes) / HBM_BW) * 1e3

    q3 = jax.device_put(
        npr.normal(0, 1, (B, heads, N, hd)).astype(np.float32).astype(jnp.bfloat16)
    )

    log("timing scores QK^T ...")
    def scores(q):
        return jnp.einsum("bhqd,bhkd->bhqk", q, q)

    units["scores_qk"] = chain(scores, q3, iters) * 1e3
    f_s = 2 * B * heads * N * N * hd
    sc_bytes = B * heads * N * N * 2
    floors["scores_qk"] = max(f_s / MXU_BF16, (2 * toks_bytes + sc_bytes) / HBM_BW) * 1e3

    log("timing scores+softmax+AV (fused attention core) ...")
    def attn_core(q):
        s = jnp.einsum("bhqd,bhkd->bhqk", q, q) / np.sqrt(hd)
        p = jax.nn.softmax(s.astype(jnp.float32), axis=-1).astype(q.dtype)
        return jnp.einsum("bhqk,bhkd->bhqd", p, q)

    units["attn_core_bf16"] = chain(attn_core, q3, iters) * 1e3
    floors["attn_core_bf16"] = max(
        2 * f_s / MXU_BF16, (2 * toks_bytes + 3 * sc_bytes) / HBM_BW
    ) * 1e3

    log("timing attention core with f32 scores ...")
    def attn_core_f32(q):
        s = jnp.einsum(
            "bhqd,bhkd->bhqk", q, q, preferred_element_type=jnp.float32
        ) / np.sqrt(hd)
        p = jax.nn.softmax(s, axis=-1).astype(q.dtype)
        return jnp.einsum("bhqk,bhkd->bhqd", p, q)

    units["attn_core_f32scores"] = chain(attn_core_f32, q3, iters) * 1e3

    log("timing out proj ...")
    units["out_proj"] = chain(lambda x: x @ wo, flat, iters) * 1e3
    f_o = 2 * B * N * d * d
    floors["out_proj"] = max(f_o / MXU_BF16, 2 * toks_bytes / HBM_BW) * 1e3

    log("timing MLP in + GELU ...")
    units["mlp_in_gelu"] = chain(
        lambda x: jax.nn.gelu((x @ w1).astype(jnp.float32), approximate=False).astype(x.dtype),
        flat, iters,
    ) * 1e3
    f_m1 = 2 * B * N * d * 4 * d
    floors["mlp_in_gelu"] = max(f_m1 / MXU_BF16, 5 * toks_bytes / HBM_BW) * 1e3

    log("timing MLP out ...")
    hid = jax.device_put(
        npr.normal(0, 1, (B * N, 4 * d)).astype(np.float32).astype(jnp.bfloat16)
    )
    units["mlp_out"] = chain(lambda x: x @ w2, hid, iters) * 1e3
    floors["mlp_out"] = max(f_m1 / MXU_BF16, 5 * toks_bytes / HBM_BW) * 1e3

    # tubelet stem at the serving shape
    log("timing tubelet stem ...")
    clip = jax.device_put(
        npr.normal(0, 1, (B, 16, 224, 224, 3)).astype(np.float32).astype(jnp.bfloat16)
    )
    wt = W(2 * 16 * 16 * 3, d)

    def tubelet(x):
        # stride==kernel conv == reshape + GEMM; time the GEMM formulation
        # (B,16,224,224,3) -> (B,8,2,14,16,14,16,3) -> (B·8·14·14, 1536)
        v = x.reshape(B, 8, 2, 14, 16, 14, 16, 3)
        v = v.transpose(0, 1, 3, 5, 2, 4, 6, 7).reshape(B * 8 * 14 * 14, 2 * 16 * 16 * 3)
        return v @ wt

    units["tubelet_gemm"] = chain(tubelet, clip, iters) * 1e3
    clip_bytes = B * 16 * 224 * 224 * 3 * 2
    f_t = 2 * B * N * (2 * 16 * 16 * 3) * d
    floors["tubelet_gemm"] = max(f_t / MXU_BF16, (2 * clip_bytes + toks_bytes) / HBM_BW) * 1e3

    # full model (flax), bf16
    log("timing full videomae_small forward ...")
    from tpuhar.models.video import VideoViT

    cpu = jax.devices("cpu")[0]
    with jax.default_device(cpu):
        net = VideoViT(depth=depth, d_model=d, num_heads=heads, dtype=dt)
        variables = jax.jit(net.init)(jax.random.PRNGKey(0), np.zeros((1, 16, 224, 224, 3), np.float32))
        variables = jax.device_get(jax.block_until_ready(variables))

    def full(x):
        emb, _ = net.apply(variables, x)
        return emb

    units["full_model"] = chain(full, clip, max(4, iters // 2)) * 1e3

    # per-block + model accounting
    blk_named = [
        "layernorm", "qkv_3gemm", "attn_core_bf16", "out_proj",
        "layernorm", "mlp_in_gelu", "mlp_out",
    ]
    blk_sum = sum(units[u] - t_null for u in blk_named)
    blk_floor = sum(
        floors.get(u, 0.0) for u in [
            "layernorm", "qkv_3gemm", "attn_core_bf16", "out_proj",
            "layernorm", "mlp_in_gelu", "mlp_out",
        ]
    )
    model_est = depth * blk_sum + (units["tubelet_gemm"] - t_null)
    model_floor = depth * blk_floor + floors["tubelet_gemm"]

    log("\n| unit | measured ms | floor ms | util |")
    log("|---|---|---|---|")
    for u in units:
        m = units[u] - (t_null if u != "full_model" else 0.0)
        fl = floors.get(u)
        util = f"{fl / m:.2f}" if fl and m > 0 else "—"
        log(f"| {u} | {m:.3f} | {fl:.3f} | {util} |" if fl else f"| {u} | {m:.3f} | — | — |")
    log(f"| 12 blocks + stem (sum of units) | {model_est:.2f} | {model_floor:.2f} | "
        f"{model_floor / model_est:.2f} |")
    log(f"| full model measured | {units['full_model']:.2f} | {model_floor:.2f} | "
        f"{model_floor / units['full_model']:.2f} |")
    log(f"merged-QKV saves {(units['qkv_3gemm'] - units['qkv_merged']) * depth:.2f} ms/model "
        f"if adopted; f32-scores delta {(units['attn_core_f32scores'] - units['attn_core_bf16']) * depth:.2f} ms/model")

    print(json.dumps({
        "bench": "vit_stage_decompose",
        "batch": B,
        "null_ms": round(t_null, 3),
        "units_ms": {k: round(v, 3) for k, v in units.items()},
        "floors_ms": {k: round(v, 3) for k, v in floors.items()},
        "model_est_ms": round(model_est, 2),
        "model_floor_ms": round(model_floor, 2),
        "full_model_ms": round(units["full_model"], 2),
    }))


if __name__ == "__main__":
    main()
