"""Pin the r5 script-surface contracts (cheap arg/config-level tests).

The round-5 lesson (docs/BENCHMARKS.md "Article workflow"): a probe that
doesn't pin every config field of the run it replicates can chase phantoms for
rounds.  These tests pin the fields that mattered.
"""
import importlib.util
import sys
from pathlib import Path

ROOT = Path(__file__).resolve().parent.parent


def _load(name, path):
    spec = importlib.util.spec_from_file_location(name, path)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def test_article_workflow_defaults_siglip(monkeypatch):
    aw = _load("aw_args", ROOT / "scripts" / "article_workflow.py")
    monkeypatch.setattr(sys, "argv", ["article_workflow.py"])
    args = aw.parse_args()
    assert args.sigmoid is True          # SigLIP (the reference's loss) default
    assert args.coupling is True
    assert args.coupling_strength == 1.0
    assert args.pretrain_patience == 4   # early-abort on flat/rising val loss
    monkeypatch.setattr(sys, "argv", ["article_workflow.py", "--infonce"])
    assert aw.parse_args().sigmoid is False


def test_article_build_config_wires_loss_and_strength(monkeypatch, tmp_path):
    aw = _load("aw_cfg", ROOT / "scripts" / "article_workflow.py")
    monkeypatch.setattr(sys, "argv", [
        "article_workflow.py", "--quick", "--infonce", "--coupling-strength", "3",
        "--workdir", str(tmp_path / "w"), "--out", str(tmp_path / "o"),
    ])
    args = aw.parse_args()
    args.classes, args.samples = 2, 1  # minimal fixture for the config build
    args.backbone, args.resize, args.frames = "tiny_cnn", 32, 2
    cfg = aw.build_config(args, tmp_path / "w")
    assert cfg.training.use_sigmoid_loss is False  # --infonce reaches the config
    assert args.coupling_strength == 3.0


def test_bench_accuracy_set_override(monkeypatch, tmp_path):
    ba = _load("ba_args", ROOT / "scripts" / "bench_accuracy.py")
    monkeypatch.setattr(sys, "argv", [
        "bench_accuracy.py", "--quick",
        "--set", "model.video_pretrained=true",
        "--set", "training.seed=9",
    ])
    args = ba.parse_args()
    cfg = ba.build_config(
        args, tmp_path / "fix", tmp_path / "out", "tiny_cnn", tmp_path / "shared"
    )
    assert cfg.model.video_pretrained is True
    assert cfg.training.seed == 9
