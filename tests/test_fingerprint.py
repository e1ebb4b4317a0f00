"""Checkpoint↔data binding: tpuhar.data.preprocess.data_fingerprint.

Guards the failure mode caught live on 2026-08-19: scripts/bench_accuracy.py
regenerates the shared preprocessed dir on every run while --resume reuses
checkpoints from an earlier one; a data-affecting code change between the two
runs silently permutes the model/data pairing (observed as id-acc 99 -> 5 with
label-free OOD scores still looking plausible).  Cross-run scorers now verify
the fingerprint recorded at training time and fail loudly instead.
"""
import json

import numpy as np
import pandas as pd
import pytest

from tpuhar.data.preprocess import (
    FINGERPRINT_FILENAME,
    data_fingerprint,
    verify_data_fingerprint,
)


def _write_artifacts(d, labels, windows_seed=0, frames=b"jpegbytes" * 100):
    d.mkdir(parents=True, exist_ok=True)
    rng = np.random.default_rng(windows_seed)
    np.save(d / "test_windows.npy", rng.normal(size=(len(labels), 8, 6)).astype(np.float32))
    (d / "test_frames.bin").write_bytes(frames)
    np.save(d / "test_frame_index.npy", np.arange(len(labels) * 4).reshape(len(labels), 2, 2))
    pd.DataFrame(
        {
            "imu_window_path": [str(d / f"test/w{i}.npy") for i in range(len(labels))],
            "label": labels,
        }
    ).to_csv(d / "test_metadata.csv", index=False)


def test_fingerprint_path_independent(tmp_path):
    # identical data regenerated into different roots -> equal fingerprints
    # (the CSV's absolute path column must not leak into the digest)
    a, b = tmp_path / "rootA" / "pre", tmp_path / "deeper" / "rootB" / "pre"
    labels = [0, 1, 2, 0, 1, 2]
    _write_artifacts(a, labels)
    _write_artifacts(b, labels)
    fa, fb = data_fingerprint(a, ("test",)), data_fingerprint(b, ("test",))
    assert fa == fb and "test" in fa


def test_fingerprint_sensitive_to_pairing_and_content(tmp_path):
    base = tmp_path / "base"
    labels = [0, 1, 2, 0, 1, 2]
    _write_artifacts(base, labels)
    ref = data_fingerprint(base, ("test",))

    relabel = tmp_path / "relabel"  # permuted label column = the live bug
    _write_artifacts(relabel, [2, 4, 0, 2, 4, 0])
    assert data_fingerprint(relabel, ("test",)) != ref

    rewin = tmp_path / "rewin"  # same labels, different window bytes
    _write_artifacts(rewin, labels, windows_seed=7)
    assert data_fingerprint(rewin, ("test",)) != ref

    reframe = tmp_path / "reframe"  # same labels, different frame bank
    _write_artifacts(reframe, labels, frames=b"otherjpeg" * 100)
    assert data_fingerprint(reframe, ("test",)) != ref


def test_verify_raises_on_mismatch_and_tolerates_legacy(tmp_path, capsys):
    d = tmp_path / "pre"
    _write_artifacts(d, [0, 1, 2])
    rec = tmp_path / "ckpts" / FINGERPRINT_FILENAME
    rec.parent.mkdir()
    rec.write_text(json.dumps(data_fingerprint(d, ("test",))))

    assert verify_data_fingerprint(rec, d, context="t")  # match -> ok

    _write_artifacts(d, [1, 2, 0])  # regenerated differently
    with pytest.raises(RuntimeError, match="fingerprint mismatch"):
        verify_data_fingerprint(rec, d, context="t")

    # legacy checkpoints (no recorded file) pass with a printed warning
    assert verify_data_fingerprint(tmp_path / "nope.json", d)
    assert "WARNING" in capsys.readouterr().out


def test_preprocessor_writes_fingerprint(synthetic_config):
    from tpuhar.data.preprocess import Preprocessor

    out = Preprocessor(synthetic_config).run_full_preprocessing()
    assert len(out["train"]) > 0
    fp_path = synthetic_config.paths.preprocessed_dir / FINGERPRINT_FILENAME
    recorded = json.loads(fp_path.read_text())
    assert recorded == data_fingerprint(synthetic_config.paths.preprocessed_dir)
