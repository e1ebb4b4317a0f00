"""Docs stay consistent with the measured chip record.

Round-3 lesson (VERDICT r3 weak #1/#6): hand-maintained headline numbers in
README/BENCHMARKS/PARITY drifted from the driver-captured bench within an hour.
The marked doc blocks are now generated from ``docs/bench_last_tpu.json`` by
``scripts/update_bench_docs.py``; this test fails the suite on any drift.
"""
import importlib.util
import json
from pathlib import Path

ROOT = Path(__file__).resolve().parent.parent


def _load_script():
    spec = importlib.util.spec_from_file_location(
        "update_bench_docs", ROOT / "scripts" / "update_bench_docs.py"
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def test_doc_headline_matches_measured_record():
    mod = _load_script()
    rec = json.loads((ROOT / "docs" / "bench_last_tpu.json").read_text())
    changes = mod.regenerate(rec)
    assert not changes, (
        "doc headline blocks drifted from docs/bench_last_tpu.json — run "
        f"scripts/update_bench_docs.py (stale: {[str(p) for p in changes]})"
    )


def test_headline_rows_render_both_styles():
    mod = _load_script()
    rec = {
        "value": 12345.6, "vs_baseline": 2.469, "step_ms": 20.7,
        "bf16_value": 8000.0, "bf16_vs_baseline": 1.6, "bf16_step_ms": 32.0,
        "batch": 256,
    }
    readme = mod.headline_rows(rec, "readme")
    bench = mod.headline_rows(rec, "bench")
    assert "12,346" in readme and "8,000" in readme and "247%" in readme
    assert "| 256 |" in bench and "160%" in bench
    # bf16-only record (int8 build failed at bench time) renders one row
    bf16_only = {"value": 8000.0, "vs_baseline": 1.6, "step_ms": 32.0}
    assert "8,000" in mod.headline_rows(bf16_only, "readme")
    # a stale fallback record must be visibly labeled
    stale = dict(rec, stale=True)
    assert "STALE" in mod.headline_rows(stale, "bench")
