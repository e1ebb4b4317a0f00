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
_UNSTABLE_RESULT = "docs/bench_unstable_last.json"

# ---------------------------------------------------------------------------
# Measurement hygiene (VERDICT r4 weak #1/#6: BENCH_r04 published a 25,402
# inf/s headline whose own trial list contained a physically impossible 1.04 ms
# step — tunnel noise straight into the round's perf record).  Three defenses:
#   1. physical-floor reject: a trial below the tower's measured stage-floor sum
#      is a measurement bug BY DEFINITION (the chip cannot run the program that
#      fast) and is discarded, never averaged.
#   2. dispersion gate: if IQR/median of accepted trials exceeds 15%, escalate
#      5 -> 9 trials; if still over, the record is marked "unstable": true,
#      bench.py refuses to overwrite the last stable record with it, and
#      update_bench_docs.py refuses to regenerate doc headlines from it.
#   3. host-contention log: 1-core box — a busy concurrent process corrupts
#      chained-loop timing (r3 stream lesson); load + busy-process count are
#      recorded so a contaminated run is diagnosable after the fact.
BASE_TRIALS = 5
MAX_TRIALS = 9
DISPERSION_GATE = 0.15

# Stage-floor sums at batch 256 for the flagship tower (docs/BENCHMARKS.md
# perf_int8_stages / stem tables: int8 tower ≈11 ms, bf16 best-ever 30.8 ms).
# Floors sit safely below every legitimate measurement and safely above the
# garbage (r4's 1.0-6.0 ms trials).  Linear in batch; only towers with a
# measured stage decomposition get a floor — others rely on the dispersion gate.
STAGE_FLOOR_MS = {
    ("tpu_cnn", "bf16"): 15.0,
    ("tpu_cnn", "int8"): 8.0,
}


def _physical_floor_ms(backbone: str, batch: int, kind: str):
    f = STAGE_FLOOR_MS.get((backbone, kind))
    return None if f is None else f * batch / 256.0


def _iqr_over_median(vals) -> float:
    q1, q3 = np.percentile(vals, [25, 75])
    med = float(np.median(vals))
    return float((q3 - q1) / med) if med else float("inf")


def _host_contention() -> dict:
    """1-min load + count of other CPU-busy processes (timing contamination tell)."""
    import os
    import subprocess

    info = {"load1": round(os.getloadavg()[0], 2)}
    try:
        out = subprocess.run(
            ["ps", "-eo", "pcpu=,pid=,comm="], capture_output=True, text=True,
            timeout=10,
        ).stdout
        me = os.getpid()
        busy = [
            ln for ln in out.splitlines()
            if ln.split() and float(ln.split()[0]) > 20.0
            and int(ln.split()[1]) != me
        ]
        info["busy_procs"] = len(busy)
        if busy:
            info["busy_proc_names"] = [ln.split()[2] for ln in busy][:5]
    except Exception:  # noqa: BLE001 — diagnostics only
        pass
    return info


def robust_measure(step_fn, floor_ms, label, base_trials=BASE_TRIALS,
                   max_trials=MAX_TRIALS):
    """Collect step-time trials (ms) from ``step_fn() -> seconds`` with
    floor-reject + dispersion-gated escalation.  Returns a dict with the
    accepted-trial median, the full accepted/rejected lists, and ``unstable``.
    """
    accepted, rejected = [], []
    target = base_trials
    while True:
        while len(accepted) + len(rejected) < target:
            s = step_fn() * 1e3
            if floor_ms is not None and s < floor_ms:
                log(f"[{label}] REJECT sub-floor trial {s:.2f} ms "
                    f"(< {floor_ms:.2f} ms physical floor)")
                rejected.append(round(s, 3))
            else:
                accepted.append(round(s, 3))
        if len(accepted) >= 2:
            disp = _iqr_over_median(accepted)
            if disp <= DISPERSION_GATE:
                break
        if target >= max_trials:
            break
        log(f"[{label}] trials too dispersed/rejected; escalating "
            f"{target} -> {max_trials} trials")
        target = max_trials
    unstable = (
        len(accepted) < 2 or _iqr_over_median(accepted) > DISPERSION_GATE
    )
    median_ms = float(np.median(accepted if accepted else rejected))
    out = {
        "median_ms": median_ms,
        "trials_ms": accepted,
        "unstable": bool(unstable),
    }
    if accepted:
        out["dispersion"] = round(_iqr_over_median(accepted), 4)
    if rejected:
        out["rejected_ms"] = rejected
    if unstable:
        log(f"[{label}] UNSTABLE measurement: accepted={accepted} "
            f"rejected={rejected}")
    return out


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

    max_trials = MAX_TRIALS if platform != "cpu" else trials

    def one_step(run_fn=run):
        # Each trial pairs its own t(1) with its own t(iters) so a slow
        # dispatch perturbs one trial, not the aggregate (VERDICT r3).
        t1 = run_fn(1)
        tk = run_fn(iters)
        return (tk - t1) / (iters - 1)

    host_load_start = _host_contention()
    log(f"host contention at start: {host_load_start}")
    run(1)  # compile chained(1)
    run(iters)  # compile chained(iters)
    bf16_floor = _physical_floor_ms(cfg.model.video_backbone, batch, "bf16")
    bf16_meas = robust_measure(
        one_step, bf16_floor, "bf16", base_trials=trials, max_trials=max_trials
    )
    step_ms = bf16_meas["median_ms"]
    step_s = step_ms / 1e3
    throughput = batch / step_s
    step_trials_ms = bf16_meas["trials_ms"]

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
        for _ in range(15 if platform != "cpu" else 3):
            tb = time.perf_counter()
            _ = float(np.asarray(jfn(imu_b, video_b)["logits"][0, 0]))
            samples.append(time.perf_counter() - tb)
        latency_sweep_ms[str(b)] = round(float(np.median(samples)) * 1e3, 3)
        if len(samples) > 3 and _iqr_over_median(samples) > 0.3:
            # tunnel-congestion tell (r4's batch-32 44 ms vs the flat ~31 ms of
            # every clean record) — label it rather than publish it as fact
            latency_sweep_ms[str(b) + "_dispersed"] = round(
                _iqr_over_median(samples), 3
            )
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

            int8_floor = _physical_floor_ms(
                cfg.model.video_backbone, batch, "int8"
            )

            def robust_measure_wires(run_q, label, base_rounds=trials,
                                     max_rounds=max_trials):
                """Interleaved per-wire trials (trial i of every wire runs
                back-to-back so tunnel drift perturbs a trial, not a wire) with
                the same floor-reject + dispersion-gate as the bf16 headline.
                Returns ({wire: meas_dict}, any_unstable)."""
                acc = {w: [] for w in wires}
                rej = {w: [] for w in wires}
                rounds, target = 0, base_rounds
                while True:
                    while rounds < target:
                        for w in wires:
                            t1w = run_q(1, w)
                            tkw = run_q(iters, w)
                            s = (tkw - t1w) / (iters - 1) * 1e3
                            if int8_floor is not None and s < int8_floor:
                                log(f"[{label}:{w}] REJECT sub-floor trial "
                                    f"{s:.2f} ms (< {int8_floor:.2f} ms)")
                                rej[w].append(round(s, 3))
                            else:
                                acc[w].append(round(s, 3))
                        rounds += 1
                    bad = [
                        w for w in wires
                        if len(acc[w]) < 2
                        or _iqr_over_median(acc[w]) > DISPERSION_GATE
                    ]
                    if not bad or target >= max_rounds:
                        break
                    log(f"[{label}] wires {bad} dispersed/rejected; escalating "
                        f"{target} -> {max_rounds} rounds")
                    target = max_rounds
                meas = {}
                any_unstable = False
                for w in wires:
                    unstable = (
                        len(acc[w]) < 2
                        or _iqr_over_median(acc[w]) > DISPERSION_GATE
                    )
                    any_unstable |= unstable
                    meas[w] = {
                        "median_ms": float(
                            np.median(acc[w] if acc[w] else rej[w])
                        ),
                        "trials_ms": acc[w],
                        "unstable": bool(unstable),
                        **({"rejected_ms": rej[w]} if rej[w] else {}),
                    }
                    if unstable:
                        log(f"[{label}:{w}] UNSTABLE: acc={acc[w]} rej={rej[w]}")
                return meas, any_unstable

            log("building int8 quantized forward (calibration on CPU)...")
            run_base = make_runner(resident=False)
            for w in wires:
                run_base(1, w); run_base(iters, w)  # compile both wires
            base_meas, base_unstable = robust_measure_wires(
                run_base, "int8", base_rounds=3, max_rounds=max(3, max_trials - 2)
            )
            base_steps = {w: m["median_ms"] / 1e3 for w, m in base_meas.items()}
            step_q = min(base_steps.values())
            int8_unstable = base_unstable
            log(
                f"int8 throughput={batch / step_q:.0f} inf/s/chip  "
                f"step={step_q * 1e3:.2f}ms  ({step_ms / (step_q * 1e3):.2f}x bf16)  "
                f"per-wire={ {w: round(s * 1e3, 2) for w, s in base_steps.items()} }"
            )
            int8_variant = "baseline"
            int8_wire = min(base_steps, key=base_steps.get)
            # int8-resident rewrite (producer-side quantization, int8 activations in
            # HBM): measured alongside; the faster program becomes int8_value.
            try:
                log("building int8-resident forward...")
                run_res = make_runner(resident=True)
                for w in wires:
                    run_res(1, w); run_res(iters, w)
                res_meas, res_unstable = robust_measure_wires(
                    run_res, "int8res"
                )
                int8_unstable |= res_unstable
                res_steps = {
                    w: m["median_ms"] / 1e3 for w, m in res_meas.items()
                }
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
                    w: m["trials_ms"] for w, m in res_meas.items()
                }
                rej = {
                    w: m["rejected_ms"] for w, m in res_meas.items()
                    if m.get("rejected_ms")
                }
                if rej:
                    int8_extras["int8_resident_wire_rejected_ms"] = rej
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
            if int8_unstable:
                int8_extras["int8_unstable"] = True
        except Exception as e:  # noqa: BLE001 — headline must survive int8 issues
            log(f"int8 path skipped: {type(e).__name__}: {str(e)[:200]}")

    host_load_end = _host_contention()
    result = {
        "metric": "fused_imu_video_inferences_per_sec_per_chip",
        "value": round(throughput, 1),
        "unit": "inferences/sec/chip",
        "vs_baseline": round(throughput / 5000.0, 4),
        "batch": batch,
        "step_ms": round(step_ms, 3),
        "step_trials_ms": step_trials_ms,
        "p50_batch_latency_ms": round(p50_batch_ms, 3),
        "p50_window_latency_ms": p50_window_ms,
        "latency_sweep_ms": latency_sweep_ms,
        "platform": platform,
        "backbone": cfg.model.video_backbone,
        "host_load": {"start": host_load_start, "end": host_load_end},
        **int8_extras,
    }
    if bf16_meas.get("dispersion") is not None:
        result["step_dispersion"] = bf16_meas["dispersion"]
    if bf16_meas.get("rejected_ms"):
        result["step_rejected_ms"] = bf16_meas["rejected_ms"]
    if bf16_meas["unstable"]:
        result["unstable"] = True
    if (
        INT8_HEADLINE
        and "int8_value" in int8_extras
        and int8_extras["int8_value"] > throughput
        # never promote an unstable int8 measurement over a stable bf16 one —
        # the r4 25,402 record came from exactly this hole
        and not int8_extras.get("int8_unstable")
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
        # persist the default-config chip measurement for the stale fallback —
        # but never clobber the last stable record with an unstable one
        try:
            import datetime
            import os

            rec = dict(result)
            rec["measured_at"] = (
                datetime.datetime.now(datetime.timezone.utc).isoformat()
            )
            os.makedirs("docs", exist_ok=True)
            target = (
                _UNSTABLE_RESULT if result.get("unstable") else _LAST_TPU_RESULT
            )
            with open(target, "w") as f:
                json.dump(rec, f, indent=1)
            if result.get("unstable"):
                log(f"UNSTABLE record written to {target}; "
                    f"{_LAST_TPU_RESULT} (the doc source) left untouched")
            else:
                # record -> docs is one atomic step: no bench run (the
                # driver's included) may leave the doc-drift test red
                _regenerate_docs()
        except OSError as e:
            log(f"could not persist last-TPU record: {e}")
    print(json.dumps(result))


def _regenerate_docs() -> None:
    """Regenerate the doc headline blocks from the just-written record."""
    import importlib.util
    import os

    try:
        spec = importlib.util.spec_from_file_location(
            "update_bench_docs",
            os.path.join(os.path.dirname(os.path.abspath(__file__)),
                         "scripts", "update_bench_docs.py"),
        )
        mod = importlib.util.module_from_spec(spec)
        spec.loader.exec_module(mod)
        rec = json.loads(open(_LAST_TPU_RESULT).read())
        for p, text in mod.regenerate(rec).items():
            p.write_text(text)
            log(f"regenerated doc headline: {p}")
    except Exception as e:  # noqa: BLE001 — doc regen must not kill the bench
        log(f"doc regeneration failed (docs may drift): {type(e).__name__}: {e}")


if __name__ == "__main__":
    main()
