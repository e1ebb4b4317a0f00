"""bench.py measurement hygiene (VERDICT r4 weak #1/#6).

The r4 driver bench published 25,402 inf/s from a trial list containing a
physically impossible 1.04 ms step.  These tests pin the three defenses:
physical-floor reject, dispersion-gated escalation with the ``unstable`` flag,
and update_bench_docs refusing to regenerate from an unstable record.
"""
import importlib.util
import json
from pathlib import Path

import pytest

ROOT = Path(__file__).resolve().parent.parent


def _load(name, path):
    spec = importlib.util.spec_from_file_location(name, path)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


@pytest.fixture(scope="module")
def bench():
    return _load("bench_mod", ROOT / "bench.py")


def _feeder(seq_ms):
    it = iter(seq_ms)

    def step_fn():
        return next(it) / 1e3  # robust_measure expects seconds

    return step_fn


def test_subfloor_trials_rejected_not_averaged(bench):
    # r4's actual failure: one 1.04 ms trial inside an 11-16 ms set
    m = bench.robust_measure(
        _feeder([11.3, 15.9, 11.8, 1.04, 8.9, 11.5, 11.6, 11.4, 11.7]),
        floor_ms=8.0, label="t", base_trials=5, max_trials=9,
    )
    assert 1.04 in m["rejected_ms"]
    assert all(t >= 8.0 for t in m["trials_ms"])
    assert m["median_ms"] >= 8.0


def test_tight_trials_stable_no_escalation(bench):
    m = bench.robust_measure(
        _feeder([16.8, 17.2, 16.5, 16.7, 16.4]),
        floor_ms=8.0, label="t", base_trials=5, max_trials=9,
    )
    assert not m["unstable"]
    assert len(m["trials_ms"]) == 5
    assert m["dispersion"] <= 0.15
    assert abs(m["median_ms"] - 16.7) < 1e-6


def test_dispersed_trials_escalate_then_flag_unstable(bench):
    # 9 wildly dispersed trials: escalates 5 -> 9, still fails the gate
    seq = [10.0, 20.0, 30.0, 15.0, 25.0, 12.0, 28.0, 18.0, 22.0]
    m = bench.robust_measure(
        _feeder(seq), floor_ms=8.0, label="t", base_trials=5, max_trials=9,
    )
    assert m["unstable"]
    assert len(m["trials_ms"]) == 9  # escalation happened


def test_dispersed_then_recovering_trials_settle(bench):
    # first 5 dispersed, the 4 escalation trials tighten the IQR under the gate
    seq = [10.0, 14.0, 25.0, 17.0, 21.0, 16.5, 16.6, 16.55, 16.45]
    m = bench.robust_measure(
        _feeder(seq), floor_ms=8.0, label="t", base_trials=5, max_trials=9,
    )
    assert len(m["trials_ms"]) == 9
    assert not m["unstable"]


def test_all_subfloor_is_unstable(bench):
    m = bench.robust_measure(
        _feeder([1.0, 2.0, 3.0, 1.5, 2.5, 1.2, 2.2, 1.8, 2.8]),
        floor_ms=8.0, label="t", base_trials=5, max_trials=9,
    )
    assert m["unstable"]
    assert m["trials_ms"] == []
    assert len(m["rejected_ms"]) == 9


def test_physical_floor_table(bench):
    assert bench._physical_floor_ms("tpu_cnn", 256, "int8") == 8.0
    assert bench._physical_floor_ms("tpu_cnn", 128, "int8") == 4.0
    assert bench._physical_floor_ms("tpu_cnn", 256, "bf16") == 15.0
    # towers without a measured stage decomposition get no floor
    assert bench._physical_floor_ms("videomae_small", 256, "bf16") is None


def test_update_bench_docs_refuses_unstable_record(tmp_path, monkeypatch):
    mod = _load("ubd_mod", ROOT / "scripts" / "update_bench_docs.py")
    rec = json.loads((ROOT / "docs" / "bench_last_tpu.json").read_text())
    rec["unstable"] = True
    bad = tmp_path / "bench_last_tpu.json"
    bad.write_text(json.dumps(rec))
    monkeypatch.setattr(mod, "RECORD", bad)
    monkeypatch.setattr(mod.sys, "argv", ["update_bench_docs.py"])
    with pytest.raises(SystemExit) as e:
        mod.main()
    assert e.value.code == 1  # regeneration refused
    monkeypatch.setattr(mod.sys, "argv", ["update_bench_docs.py", "--check"])
    with pytest.raises(SystemExit) as e:
        mod.main()
    assert e.value.code == 0  # --check passes: docs keep last stable headline
