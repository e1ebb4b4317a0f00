"""bench.py stale last-known-good fallback (no TPU touched).

When the axon tunnel is down at bench time, bench must emit the persisted last
real chip measurement flagged ``stale: true`` (exit 0) rather than abort — and
must still abort (exit 3) when no record exists.  Guards the driver's
end-of-round perf record against multi-hour relay outages (observed 2026-08-17).
"""
import json
import sys
from pathlib import Path

import pytest

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import bench  # noqa: E402


def test_stale_fallback_emits_record(tmp_path, monkeypatch, capsys):
    rec = {"metric": "m", "value": 7288.4, "unit": "inf/s", "vs_baseline": 1.46,
           "platform": "tpu", "measured_at": "2026-08-17T10:41:50Z"}
    p = tmp_path / "last.json"
    p.write_text(json.dumps(rec))
    monkeypatch.setattr(bench, "_LAST_TPU_RESULT", str(p))

    with pytest.raises(SystemExit) as ei:
        bench._emit_stale_fallback("tunnel unreachable (test)")
    assert ei.value.code == 0

    line = capsys.readouterr().out.strip().splitlines()[-1]
    out = json.loads(line)
    assert out["stale"] is True
    assert "tunnel unreachable" in out["stale_reason"]
    assert out["value"] == rec["value"]  # never a fabricated number
    assert out["measured_at"] == rec["measured_at"]


def test_stale_fallback_without_record_aborts(tmp_path, monkeypatch):
    monkeypatch.setattr(bench, "_LAST_TPU_RESULT", str(tmp_path / "missing.json"))
    with pytest.raises(SystemExit) as ei:
        bench._emit_stale_fallback("tunnel unreachable (test)")
    assert ei.value.code == 3


def test_committed_record_is_loadable():
    """The seeded docs/bench_last_tpu.json must stay parseable + complete."""
    p = Path(__file__).resolve().parent.parent / "docs" / "bench_last_tpu.json"
    rec = json.loads(p.read_text())
    for k in ("metric", "value", "unit", "vs_baseline", "platform", "measured_at"):
        assert k in rec, k
    assert rec["platform"] != "cpu"
