"""graft_weights.py --dry-run: checkpoint validation without a model build.

VERDICT r4 #6: the real-weights ingest path (REAL_WEIGHTS.md) needs a fast
validator usable the moment a checkpoint file appears — load + envelope
normalize + layout convert + schema/digest report, no flax init, no device.
Driven here against synthesized checkpoints in the torchvision layout.
"""
import importlib.util
import json
from pathlib import Path

import numpy as np
import pytest
import torch

ROOT = Path(__file__).resolve().parent.parent


def _load_module(name, path):
    spec = importlib.util.spec_from_file_location(name, path)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


_tc = _load_module("tc_for_dryrun", ROOT / "tests" / "test_convert.py")


def _run_graft(argv, monkeypatch, capsys):
    gw = _load_module("graft_weights_mod", ROOT / "scripts" / "graft_weights.py")
    monkeypatch.setattr(gw.sys, "argv", ["graft_weights.py"] + argv)
    gw.main()
    return capsys.readouterr()


def test_dry_run_validates_good_checkpoint(tmp_path, monkeypatch, capsys):
    rng = np.random.default_rng(0)
    sd = _tc._fake_resnet18_state_dict(rng)
    # DataParallel envelope on top — dry-run must normalize it away
    sd = {"module." + k: v for k, v in sd.items()}
    ckpt = tmp_path / "r18.pt"
    torch.save(sd, ckpt)

    out = _run_graft(
        [str(ckpt), "--backbone", "resnet18", "--dry-run",
         "--manifest", str(tmp_path / "report.json")],
        monkeypatch, capsys,
    )
    assert "DRY RUN OK" in out.out
    report = json.loads((tmp_path / "report.json").read_text())
    assert report["dry_run"] is True
    assert report["source_tensors"] == len(sd)
    assert report["converted_video_encoder_tensors"]  # digest manifest present
    assert report["converted_batch_stats_tensors"]  # BN running stats ride along
    first = next(iter(report["converted_video_encoder_tensors"].values()))
    assert set(first) == {"shape", "dtype", "sha256"}


def test_dry_run_rejects_truncated_checkpoint(tmp_path, monkeypatch, capsys):
    rng = np.random.default_rng(0)
    sd = _tc._fake_resnet18_state_dict(rng)
    del sd["layer3.0.conv1.weight"]
    ckpt = tmp_path / "bad.pt"
    torch.save(sd, ckpt)

    with pytest.raises(KeyError) as e:
        _run_graft([str(ckpt), "--backbone", "resnet18", "--dry-run"],
                   monkeypatch, capsys)
    assert "layer3.0.conv1.weight" in str(e.value)  # the exact key is named
