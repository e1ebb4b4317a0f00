#!/usr/bin/env python
"""Benchmark: fused IMU-window + 16-frame-clip inference throughput per chip.

North-star metric (BASELINE.json): ≥5,000 fused inferences/sec/chip on TPU v5e at
OOD-AUROC parity.  One inference = one raw 250×6 IMU window (raw counts) plus one
16-frame 224×224 uint8 clip, through on-device featurization (unit conversion,
median filter, z-score — the Pallas fused kernel on TPU), ImageNet normalization,
the flagship TPUVideoCNN (patch-embed stem) + IMU-transformer cross-attention
fusion classifier (bf16 MXU compute), and MSP/energy OOD heads — decode-to-logits
in one XLA program.  `bench.py resnet18` benches the reference-parity tower.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": "inferences/sec/chip", "vs_baseline": N/5000,
   extras...}
All other output goes to stderr.
"""
from __future__ import annotations

import json
import sys
import time

import numpy as np

# Which program is the headline `value`: the int8 PTQ serving path (measured ~10.5k
# inf/s = 210%) or bf16 (~7.3k = 146%).  int8 is the headline because the OOD
# evidence behind it is in (scripts/validate_int8_ood.py on the hard fixture with
# the deterministic host-float64 scorer, docs/int8_ood_parity_hard.json,
# 2026-08-18): recalibrated int8 AUROC deltas vs f32 over LOO classes {0,2,4} are
# msp mean -0.019 (max |0.035|), energy mean -0.009 (max |0.027|), Mahalanobis
# +0.001 (max |0.004|), id-acc within 0.8 pts.  bf16 is always reported alongside;
# if the int8 build fails at runtime, bf16 silently remains the headline.
INT8_HEADLINE = True


def log(msg):
    print(msg, file=sys.stderr, flush=True)


_LAST_TPU_RESULT = "docs/bench_last_tpu.json"


def _emit_stale_fallback(reason: str) -> None:
    """Emit the last *real* chip measurement, clearly flagged stale, then exit.

    The axon tunnel has had multi-hour relay outages (2026-08-17: ~7h+).  If the
    driver's end-of-round bench lands in one, aborting loses the round's perf
    record even though a real measurement exists.  Every successful TPU run of
    this script persists its result JSON to ``docs/bench_last_tpu.json``; on a
    dead tunnel we re-emit that record with ``stale: true`` and the reason — an
    honest, clearly-labeled last-known-good, never a fabricated number.  If no
    record exists, exit non-zero as before.
    """
    import os

    if not os.path.exists(_LAST_TPU_RESULT):
        log("no last-known TPU result to fall back to — aborting")
        sys.exit(3)
    with open(_LAST_TPU_RESULT) as f:
        rec = json.load(f)
    rec["stale"] = True
    rec["stale_reason"] = reason
    log(f"emitting stale last-known TPU measurement ({rec.get('measured_at')})")
    print(json.dumps(rec))
    sys.exit(0)


def _gate_on_tunnel_health(probes: int = 8, interval_s: float = 120.0) -> None:
    """Fail fast (and ride out short outages) when the axon TPU tunnel is dead.

    A dead tunnel makes the first in-process `jax.devices()` block ~25 min in the
    client reconnect loop before raising Unavailable (observed 2026-08-17).  Probe
    device discovery in a *subprocess* with a short timeout instead: a live tunnel
    answers in ~5 s, a dead one gets killed at the timeout and retried on an
    interval, so a transient outage recovers and a hard one exits with a clear
    message in bounded time instead of a silent half-hour hang.
    Only engaged when the axon platform is configured; CPU runs skip it.
    """
    import os
    import subprocess

    if "axon" not in os.environ.get("JAX_PLATFORMS", ""):
        return
    cmd = [sys.executable, "-c", "import jax; assert jax.devices(); print('ok')"]
    for i in range(1, probes + 1):
        try:
            subprocess.run(
                cmd, check=True, timeout=150, stdout=subprocess.DEVNULL,
                stderr=subprocess.DEVNULL,
            )
            return
        except (subprocess.TimeoutExpired, subprocess.CalledProcessError):
            log(f"tpu tunnel probe {i}/{probes} failed; retrying in {interval_s:.0f}s")
            if i < probes:
                time.sleep(interval_s)
    log("tpu tunnel unreachable after all probes")
    _emit_stale_fallback(
        f"axon tunnel unreachable at bench time ({probes} probes over "
        f"{probes * interval_s / 60:.0f} min); value is the last real chip "
        "measurement, not a fresh run"
    )


def main():
    import os

    import jax

    if os.environ.get("JAX_PLATFORMS", "") == "cpu":
        # the site customization force-sets jax_platforms="axon,cpu" at interpreter
        # start; an explicit CPU request via the env var must win or jax.devices()
        # still dials the (possibly dead) tunnel.
        jax.config.update("jax_platforms", "cpu")
    _gate_on_tunnel_health()
    devices = jax.devices()
    log(f"devices: {devices}")
    platform = devices[0].platform

    from __graft_entry__ import _build_forward, _flagship_config

    cfg = _flagship_config(tiny=(platform == "cpu"))
    if len(sys.argv) > 1:  # optional: bench.py [backbone] [batch]
        cfg.model.video_backbone = sys.argv[1]
    batch = 256 if platform != "cpu" else 8
    if len(sys.argv) > 2:
        batch = int(sys.argv[2])

    fn, (imu_ex, video_ex) = _build_forward(cfg, batch)
    jfn = jax.jit(fn)

    npr = np.random.default_rng(0)
    imu = jax.device_put(
        npr.normal(0, 8000, size=imu_ex.shape).astype(np.float32)
    )
    video = jax.device_put(
        (npr.random(video_ex.shape) * 255).astype(np.uint8)
    )

    log(f"compiling batch={batch} video={video_ex.shape} ...")
    t0 = time.perf_counter()
    out = jfn(imu, video)
    _ = float(np.asarray(out["logits"]).sum())  # hard host sync
    log(f"first call (compile+run): {time.perf_counter() - t0:.1f}s")

    # Steady-state throughput via an in-program chained loop: each iteration's input
    # depends on the previous iteration's logits, so the device must run them
    # serially inside ONE executable — immune to async-dispatch / remote-queue
    # timing artifacts. Per-step time = (t(K) - t(1)) / (K - 1).
    import jax.numpy as jnp
    from functools import partial

    @partial(jax.jit, static_argnames=("iters",))
    def chained(imu, video, iters: int):
        def body(i, carry):
            cur_imu, acc = carry
            # every input must depend on the loop, or XLA hoists the whole tower out
            # as loop-invariant (it did): roll the clip batch by the iteration index
            # and mix an output scalar into the next IMU input.
            v = jnp.roll(video, i, axis=0)
            out = fn(cur_imu, v)
            delta = jnp.sum(out["logits"]) * 1e-12
            return cur_imu + delta, acc + delta

        _, acc = jax.lax.fori_loop(0, iters, body, (imu, jnp.float32(0)))
        return acc

    iters = 20 if platform != "cpu" else 2
    trials = 5 if platform != "cpu" else 2

    def run(k):
        t0 = time.perf_counter()
        val = chained(imu, video, k)
        _ = float(np.asarray(val))  # host readback = true completion
        return time.perf_counter() - t0

    def measure_trials(run_fn, n_trials=trials):
        """Per-trial step time: (t(iters) − t(1)) / (iters − 1), n_trials times.

        A single-shot min-of-2 is not a headline (VERDICT r3): the axon tunnel
        drifts run-to-run, so every published step time carries a median and
        the full trial list.  Each trial pairs its own t(1) with its own
        t(iters) so a slow dispatch perturbs one trial, not the aggregate.
        """
        steps = []
        for _ in range(n_trials):
            t1 = run_fn(1)
            tk = run_fn(iters)
            steps.append((tk - t1) / (iters - 1))
        return steps

    run(1)  # compile chained(1)
    run(iters)  # compile chained(iters)
    step_trials = measure_trials(run)
    step_s = float(np.median(step_trials))
    throughput = batch / step_s
    step_ms = step_s * 1e3
    step_trials_ms = [round(s * 1e3, 3) for s in step_trials]

    # p50 end-to-end batch latency (dispatch + execute + scalar readback)
    lat = []
    for _ in range(6 if platform != "cpu" else 2):
        t1b = time.perf_counter()
        out = jfn(imu, video)
        _ = float(np.asarray(out["logits"][0, 0]))
        lat.append(time.perf_counter() - t1b)
    p50_batch_ms = float(np.median(lat)) * 1e3

    # Small-batch p50 latency sweep: BASELINE.md names p50 *window* latency (one
    # window end-to-end) as a first-class serving metric — measure it at batch=1
    # (and a couple of mid sizes for the latency/throughput curve) instead of
    # dividing a 256-batch time by 256.
    sweep_batches = (1, 8, 32) if platform != "cpu" else (1,)
    imu_np, video_np = np.asarray(imu), np.asarray(video)
    latency_sweep_ms = {}
    for b in sweep_batches:
        if b > batch:
            continue
        # device-resident inputs: over the axon tunnel a host→device copy runs at
        # ~40 MB/s and would swamp the measurement (a batch-32 clip is 77 MB); on a
        # real host the PCIe copy is microseconds. This measures the chip.
        imu_b = jax.device_put(np.ascontiguousarray(imu_np[:b]))
        video_b = jax.device_put(np.ascontiguousarray(video_np[:b]))
        jax.block_until_ready((imu_b, video_b))
        t0 = time.perf_counter()
        _ = float(np.asarray(jfn(imu_b, video_b)["logits"][0, 0]))  # compile
        log(f"latency sweep: compiled batch={b} in {time.perf_counter() - t0:.1f}s")
        samples = []
        for _ in range(11 if platform != "cpu" else 3):
            tb = time.perf_counter()
            _ = float(np.asarray(jfn(imu_b, video_b)["logits"][0, 0]))
            samples.append(time.perf_counter() - tb)
        latency_sweep_ms[str(b)] = round(float(np.median(samples)) * 1e3, 3)
    p50_window_ms = latency_sweep_ms.get("1")

    log(
        f"throughput={throughput:.0f} inf/s/chip  step={step_ms:.2f}ms  "
        f"p50 batch latency={p50_batch_ms:.2f}ms  (batch={batch})  "
        f"p50 window latency={p50_window_ms}ms  sweep={latency_sweep_ms}"
    )

    # int8 PTQ serving option (tpu_cnn / resnet18 towers): same chained-loop
    # measurement through
    # serving_quant's program. Best-effort — the bf16 headline above never depends on
    # this succeeding. (docs/BENCHMARKS.md: 10,499 inf/s = 210%; Mahalanobis-AUROC
    # parity validated on trained checkpoints, scripts/validate_int8_ood.py.)
    int8_extras = {}
    quant_backbones = (
        cfg.model.video_backbone.startswith("tpu_cnn")
        or cfg.model.video_backbone == "resnet18"
        or cfg.model.video_backbone.startswith("videomae")
    )
    if platform != "cpu" and quant_backbones:
        try:
            from tpuhar.serving_quant import build_quantized_forward

            # one tiny GEMM proving the fused int8 byte map is exact on this
            # backend BEFORE timing it (the pattern has miscompiled here —
            # ops/stem.verify_byte_map); a failure falls through to the bf16
            # headline instead of publishing a number for a wrong program
            from tpuhar.ops.stem import verify_byte_map

            verify_byte_map()
            log("int8 byte-map preflight: exact on this backend")

            # calibration clips must be NHWC (the CPU calibration walk runs
            # normalize_clip); the timed program still consumes `video`, which is
            # patch-major for tpu_cnn towers (quant forwards detect the layout)
            d = cfg.data
            calib_clips = (
                npr.random(
                    (2, d.video_frames_per_window) + tuple(d.video_resize) + (3,)
                ) * 255
            ).astype(np.uint8)
            # Wire encoding A/B, settled at the BENCH level (VERDICT r3): the
            # patch-major int8 program accepts either the raw uint8 wire (the
            # device fuses clip(u8−128,−127,·) into the GEMM) or the
            # pre-centered int8 wire (the host applies the same map — ops/stem
            # center_u8).  The 4096-frame tower micro said centered wins by
            # 0.15 ms; two cross-run full benches said u8 wins by 1.9 ms.
            # Measure BOTH wires interleaved in this one process and let the
            # winner be the headline — no cross-run tunnel drift in the A/B.
            from tpuhar.ops.stem import center_u8

            wires = {"u8": video}
            if video_ex.shape[-1] != 3:  # patch-major tower
                wires["centered"] = jax.device_put(
                    center_u8(np.asarray(jax.device_get(video)))
                )

            def make_runner(resident: bool):
                """Build one int8 serving program; return run(k, wire)->seconds.

                One jitted chained loop serves both wires (jit retraces per
                input dtype; the stem branches on it — ops/stem.stem_gemm_u8).
                """
                qfn = build_quantized_forward(
                    cfg, fn._variables_prefold, calib_clips,
                    resident=resident,
                )

                @partial(jax.jit, static_argnames=("iters",))
                def chained_q(imu, video, iters: int):
                    def body(i, carry):
                        cur_imu, acc = carry
                        v = jnp.roll(video, i, axis=0)
                        out = qfn(cur_imu, v)
                        delta = jnp.sum(out["logits"]) * 1e-12
                        return cur_imu + delta, acc + delta

                    _, acc = jax.lax.fori_loop(0, iters, body, (imu, jnp.float32(0)))
                    return acc

                def run_q(k, wire):
                    t0 = time.perf_counter()
                    _ = float(np.asarray(chained_q(imu, wires[wire], k)))
                    return time.perf_counter() - t0

                return run_q

            log("building int8 quantized forward (calibration on CPU)...")
            run_base = make_runner(resident=False)
            for w in wires:
                run_base(1, w); run_base(iters, w)  # compile both wires
            base_trials = {
                w: measure_trials(lambda k, w=w: run_base(k, w), 3) for w in wires
            }
            base_steps = {w: float(np.median(t)) for w, t in base_trials.items()}
            step_q = min(base_steps.values())
            log(
                f"int8 throughput={batch / step_q:.0f} inf/s/chip  "
                f"step={step_q * 1e3:.2f}ms  ({step_ms / (step_q * 1e3):.2f}x bf16)  "
                f"per-wire={ {w: round(s * 1e3, 2) for w, s in base_steps.items()} }"
            )
            int8_variant = "baseline"
            int8_wire = min(base_steps, key=base_steps.get)
            res_trials = {}
            # int8-resident rewrite (producer-side quantization, int8 activations in
            # HBM): measured alongside; the faster program becomes int8_value.
            try:
                log("building int8-resident forward...")
                run_res = make_runner(resident=True)
                for w in wires:
                    run_res(1, w); run_res(iters, w)
                # interleave the wire trials: trial i of every wire runs
                # back-to-back, so tunnel drift perturbs a trial, not a wire
                res_trials = {w: [] for w in wires}
                for _ in range(trials):
                    for w in wires:
                        t1w = run_res(1, w)
                        tkw = run_res(iters, w)
                        res_trials[w].append((tkw - t1w) / (iters - 1))
                res_steps = {w: float(np.median(t)) for w, t in res_trials.items()}
                step_r = min(res_steps.values())
                log(
                    f"int8-resident throughput={batch / step_r:.0f} inf/s/chip  "
                    f"step={step_r * 1e3:.2f}ms  ({step_q / step_r:.2f}x int8-baseline)  "
                    f"per-wire={ {w: round(s * 1e3, 2) for w, s in res_steps.items()} }"
                )
                int8_extras["int8_resident_step_ms"] = round(step_r * 1e3, 3)
                int8_extras["int8_baseline_step_ms"] = round(step_q * 1e3, 3)
                int8_extras["int8_resident_wire_ms"] = {
                    w: round(s * 1e3, 3) for w, s in res_steps.items()
                }
                int8_extras["int8_resident_wire_trials_ms"] = {
                    w: [round(s * 1e3, 3) for s in t] for w, t in res_trials.items()
                }
                if step_r < step_q:
                    step_q, int8_variant = step_r, "resident"
                    int8_wire = min(res_steps, key=res_steps.get)
            except Exception as e:  # noqa: BLE001 — resident is optional
                log(f"int8-resident skipped: {type(e).__name__}: {str(e)[:200]}")
            int8_extras.update(
                int8_value=round(batch / step_q, 1),
                int8_step_ms=round(step_q * 1e3, 3),
                int8_vs_baseline=round(batch / step_q / 5000.0, 4),
                int8_variant=int8_variant,
                int8_wire=int8_wire,
            )
        except Exception as e:  # noqa: BLE001 — headline must survive int8 issues
            log(f"int8 path skipped: {type(e).__name__}: {str(e)[:200]}")

    result = {
        "metric": "fused_imu_video_inferences_per_sec_per_chip",
        "value": round(throughput, 1),
        "unit": "inferences/sec/chip",
        "vs_baseline": round(throughput / 5000.0, 4),
        "batch": batch,
        "step_ms": round(step_ms, 3),
        "p50_batch_latency_ms": round(p50_batch_ms, 3),
        "p50_window_latency_ms": p50_window_ms,
        "latency_sweep_ms": latency_sweep_ms,
        "platform": platform,
        "backbone": cfg.model.video_backbone,
        **int8_extras,
    }
    if (
        INT8_HEADLINE
        and "int8_value" in int8_extras
        and int8_extras["int8_value"] > throughput
    ):
        # Promote int8 only when it actually wins: on ViT towers the int8 path
        # measured 0.56x bf16 on-chip (bf16 attention + requantize overhead), so
        # the headline stays bf16 there and int8_* remain informational extras.
        result.update(
            value=int8_extras["int8_value"],
            vs_baseline=int8_extras["int8_vs_baseline"],
            step_ms=int8_extras["int8_step_ms"],
            quantization="int8 PTQ (recalibrated; validate_int8_ood parity)",
            bf16_value=round(throughput, 1),
            bf16_vs_baseline=round(throughput / 5000.0, 4),
            bf16_step_ms=round(step_ms, 3),
        )
        for k in ("int8_value", "int8_step_ms", "int8_vs_baseline"):
            result.pop(k, None)
    if platform != "cpu" and cfg.model.video_backbone == "tpu_cnn":
        # persist the default-config chip measurement for the stale fallback
        try:
            import datetime
            import os

            rec = dict(result)
            rec["measured_at"] = (
                datetime.datetime.now(datetime.timezone.utc).isoformat()
            )
            os.makedirs("docs", exist_ok=True)
            with open(_LAST_TPU_RESULT, "w") as f:
                json.dump(rec, f, indent=1)
        except OSError as e:
            log(f"could not persist last-TPU record: {e}")
    print(json.dumps(result))


if __name__ == "__main__":
    main()
