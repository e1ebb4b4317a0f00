"""Config tree: reference field parity, ghost keys, JSON round-trip, CLI overrides."""
import json
from pathlib import Path

from tpuhar.config import Config

# Field/default parity with the reference dataclasses (configs/config.py:50-146).
REFERENCE_DEFAULTS = {
    "data": {
        "imu_window_size": 250,
        "imu_stride": 125,
        "imu_sampling_rate": 50,
        "imu_channels": 6,
        "video_fps": 25,
        "video_frames_per_window": 16,
        "video_resize": (224, 224),
        "normalize_imu": True,
        "median_filter_kernel": 5,
        "use_augmentation": False,
        "jitter_strength": 0.1,
        "time_warp_strength": 0.2,
    },
    "model": {
        "imu_patch_size": 16,
        "imu_stride": 16,
        "imu_d_model": 128,
        "imu_nhead": 8,
        "imu_num_layers": 4,
        "imu_dropout": 0.1,
        "video_d_model": 768,
        "projection_dim": 256,
        "projection_hidden_dim": 512,
        "num_classes": 32,
        "classifier_hidden_dims": [256, 128],
        "classifier_dropout": 0.3,
    },
    "training": {
        "seed": 42,
        "num_workers": 2,
        "pretrain_epochs": 10,
        "pretrain_batch_size": 16,
        "pretrain_lr": 1e-4,
        "pretrain_weight_decay": 0.01,
        "pretrain_warmup_epochs": 5,
        "temperature": 0.07,
        "use_sigmoid_loss": True,
        "train_epochs": 100,
        "train_batch_size": 64,
        "train_lr_encoder": 1e-6,
        "train_lr_head": 1e-3,
        "patience": 15,
        "min_delta": 0.001,
        "save_every": 5,
        "save_best_only": True,
    },
    "eval": {
        "few_shot_samples": [10, 20, 50, 100],
        "few_shot_runs": 5,
        "eval_modes": ["linear_probe", "finetune"],
    },
}

# Ghost keys the reference reads via getattr but never declares (SURVEY quirk Q6),
# with their effective defaults.
GHOST_KEY_DEFAULTS = {
    "Racc": 16384.0,
    "Rgyro": 16.4,
    "pad_short_sequences": True,
    "require_video": False,
    "imu_original_rate": None,
    "video_channel_first": False,
}


def test_reference_field_parity():
    cfg = Config()
    for section, expected in REFERENCE_DEFAULTS.items():
        obj = getattr(cfg, section)
        for key, value in expected.items():
            assert getattr(obj, key) == value, f"{section}.{key}"


def test_ghost_keys_declared():
    cfg = Config()
    for key, value in GHOST_KEY_DEFAULTS.items():
        assert hasattr(cfg.data, key), key
        assert getattr(cfg.data, key) == value, key


def test_save_load_roundtrip(tmp_path):
    cfg = Config()
    cfg.training.pretrain_epochs = 7
    cfg.model.num_classes = 11
    cfg.data.video_resize = (96, 96)
    cfg.paths.base_output = tmp_path / "out"
    cfg.paths.__post_init__()
    p = tmp_path / "config.json"
    cfg.save(p)

    loaded = Config.load(p)
    assert loaded.training.pretrain_epochs == 7
    assert loaded.model.num_classes == 11
    assert loaded.data.video_resize == (96, 96)
    assert Path(loaded.paths.base_output) == tmp_path / "out"
    # Derived dirs recomputed from the loaded base_output.
    assert Path(loaded.paths.preprocessed_dir) == tmp_path / "out" / "preprocessed"


def test_cli_override():
    cfg = Config()
    cfg.override("training.pretrain_lr", "0.005")
    assert cfg.training.pretrain_lr == 0.005
    cfg.override("data.normalize_imu", "false")
    assert cfg.data.normalize_imu is False
    cfg.override("model.classifier_hidden_dims", "[64, 32]")
    assert cfg.model.classifier_hidden_dims == [64, 32]


def test_to_dict_is_json_serializable(tmp_path):
    cfg = Config()
    json.dumps(cfg.to_dict(), default=str)


def test_no_fs_side_effects_on_construction(tmp_path, monkeypatch):
    monkeypatch.chdir(tmp_path)
    cfg = Config()
    cfg.paths.base_output = tmp_path / "never_created"
    cfg.paths.__post_init__()
    assert not (tmp_path / "never_created").exists()
    cfg.paths.ensure_dirs()
    assert (tmp_path / "never_created" / "results").exists()


def test_override_none_default_fields():
    """None-default fields coerce JSON-style literals; paths stay strings; 'none'
    resets any field (VERDICT r1 weak #6)."""
    from tpuhar.config import Config

    cfg = Config()
    cfg.override("data.imu_original_rate", "100")
    assert cfg.data.imu_original_rate == 100 and isinstance(
        cfg.data.imu_original_rate, int
    )
    cfg.override("data.imu_original_rate", "none")
    assert cfg.data.imu_original_rate is None
    cfg.override("model.video_weights_path", "/some/ckpt.pth")
    assert cfg.model.video_weights_path == "/some/ckpt.pth"
    cfg.override("data.imu_original_rate", "12.5")
    assert cfg.data.imu_original_rate == 12.5
