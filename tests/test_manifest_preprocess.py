"""Manifest parsing + offline preprocessing on the synthetic fixture."""
from pathlib import Path

import numpy as np
import pandas as pd
import pytest

from tpuhar.data import manifest as M
from tpuhar.data.preprocess import Preprocessor


def test_parse_split_line_basic():
    line = (
        "yourdataset_path/data/27_open_close_door/"
        "27_open_close_door_2022_05_05_16_05_51 418 419 26"
    )
    info = M.parse_split_line(line)
    assert info.class_dir == "27_open_close_door"
    assert info.class_num == 27
    assert info.class_name == "open_close_door"
    assert info.sample_prefix == "27_open_close_door_2022_05_05_16_05_51"
    assert info.sensor_path.endswith(".csv") and info.sensor_path.startswith("sensor")
    assert info.video_path.endswith(".mp4") and info.video_path.startswith("video")
    assert (info.start, info.end, info.label) == (418, 419, 26)


def test_parse_split_line_swaps_reversed_bounds():
    info = M.parse_split_line("x/data/1_a/1_a_s 10 5 1")
    assert (info.start, info.end) == (5, 10)


def test_parse_split_line_nonnumeric_class():
    info = M.parse_split_line("x/data/walking/walking_s 0 1 3")
    assert info.class_num == -1
    assert info.class_name == "walking"


@pytest.mark.parametrize(
    "bad", ["tooshort 1 2", "no_data_dir/cls/samp 0 1 2", "x/data/only 0 1 2"]
)
def test_parse_split_line_rejects_malformed(bad):
    with pytest.raises(M.SplitLineError):
        M.parse_split_line(bad)


def test_estimate_start_frame():
    # window_idx * (stride/sr) * fps (preprocessing.py:245-250)
    assert M.estimate_start_frame(0, 125, 50, 25) == 0
    assert M.estimate_start_frame(1, 125, 50, 25) == 62  # round(2.5*25)
    assert M.estimate_start_frame(2, 125, 50, 25) == 125


def test_few_shot_sampler():
    df = pd.DataFrame(
        {
            "class_name": ["a"] * 10 + ["b"] * 3,
            "label": [0] * 10 + [1] * 3,
            "x": range(13),
        }
    )
    s = M.FewShotSampler(df)
    out = s.sample_k_per_class(5, seed=0)
    assert (out["class_name"] == "a").sum() == 5
    assert (out["class_name"] == "b").sum() == 3  # fewer than k → all
    out2 = s.sample_k_per_class(5, seed=0)
    assert list(out["x"]) == list(out2["x"])  # seeded determinism


def test_class_weights():
    df = pd.DataFrame({"label": [0] * 8 + [1] * 2})
    w = M.get_class_weights(df)
    np.testing.assert_allclose(w, [10 / (2 * 8), 10 / (2 * 2)])


# ---------------------------------------------------------------------------------
# Offline preprocessing end-to-end on the synthetic fixture
# ---------------------------------------------------------------------------------
def test_preprocess_split_artifacts(synthetic_config):
    cfg = synthetic_config
    pp = Preprocessor(cfg)
    df = pp.preprocess_split("train", save=True)

    assert len(df) > 0
    assert list(df.columns) == M.METADATA_COLUMNS
    # metadata CSV written
    csv_path = Path(cfg.paths.preprocessed_dir) / "train_metadata.csv"
    assert csv_path.exists()
    reloaded = pd.read_csv(csv_path)
    assert len(reloaded) == len(df)

    # each window file exists with shape (250, 6) float32
    row = df.iloc[0]
    w = np.load(row["imu_window_path"])
    assert w.shape == (cfg.data.imu_window_size, cfg.data.imu_channels)
    assert w.dtype == np.float32
    assert row["imu_shape_0"] == 250 and row["imu_shape_1"] == 6
    # synthetic fixture always writes videos
    assert bool(row["video_exists"])


def test_device_and_host_backends_agree(synthetic_config):
    cfg = synthetic_config
    pp_dev = Preprocessor(cfg)
    df_dev = pp_dev.preprocess_split("val", save=False)

    cfg.data.featurize_backend = "host"
    pp_host = Preprocessor(cfg)
    df_host = pp_host.preprocess_split("val", save=False)

    assert len(df_dev) == len(df_host)
    assert list(df_dev["label"]) == list(df_host["label"])
    assert list(df_dev["window_idx"]) == list(df_host["window_idx"])

    # and the actual window tensors agree numerically
    cfg.data.featurize_backend = "device"
    raw = pp_dev.load_raw_imu(df_dev.iloc[0]["sensor_path"])
    wins_dev = pp_dev.make_windows(raw)
    cfg.data.featurize_backend = "host"
    wins_host = pp_host.make_windows(raw)
    assert len(wins_dev) == len(wins_host)
    for a, b in zip(wins_dev, wins_host):
        np.testing.assert_allclose(a, b, atol=2e-4)


def test_run_full_preprocessing_stats(synthetic_config):
    pp = Preprocessor(synthetic_config)
    results = pp.run_full_preprocessing()
    assert set(results) == {"train", "val", "test"}
    stats_path = Path(synthetic_config.paths.preprocessed_dir) / "preprocessing_stats.json"
    assert stats_path.exists()
    import json

    stats = json.loads(stats_path.read_text())
    assert stats["total_windows"] == sum(len(df) for df in results.values())
    assert stats["skipped_samples"] == 0
    assert len(stats["classes_found"]) == 4


def test_window_scope_matches_serving_featurization(synthetic_config):
    """zscore_scope='window': offline windows == the serving engine's featurization of
    the same raw slices, bit-for-bit (ADVICE r1: train/serve input skew)."""
    import numpy as np

    from tpuhar.data.preprocess import Preprocessor
    from tpuhar.ops.featurize import featurize_windows

    cfg = synthetic_config
    cfg.data.zscore_scope = "window"
    pre = Preprocessor(cfg)
    rng = np.random.default_rng(0)
    raw = rng.normal(0, 8000, size=(700, 6)).astype(np.float32)
    windows = pre.make_windows(raw)
    w, s = cfg.data.imu_window_size, cfg.data.imu_stride
    assert len(windows) == (700 - w) // s + 1
    for i, win in enumerate(windows):
        served = np.swapaxes(
            np.asarray(
                featurize_windows(
                    raw[None, i * s : i * s + w],
                    kernel_size=cfg.data.median_filter_kernel,
                    normalize=cfg.data.normalize_imu,
                    racc=cfg.data.Racc,
                    rgyro=cfg.data.Rgyro,
                )
            )[0],
            0, 1,
        )
        np.testing.assert_array_equal(win, served)


def test_window_scope_pads_short_sequences(synthetic_config):
    import numpy as np

    from tpuhar.data.preprocess import Preprocessor

    cfg = synthetic_config
    cfg.data.zscore_scope = "window"
    pre = Preprocessor(cfg)
    raw = np.random.default_rng(1).normal(0, 8000, size=(60, 6)).astype(np.float32)
    windows = pre.make_windows(raw)
    assert len(windows) == 1
    assert windows[0].shape == (cfg.data.imu_window_size, 6)


def test_device_truncation_counted(synthetic_config, capsys):
    """Sequences past max_sequence_length increment a visible counter (ADVICE r1)."""
    import numpy as np

    from tpuhar.data.preprocess import Preprocessor

    cfg = synthetic_config
    cfg.data.featurize_backend = "device"
    cfg.data.max_sequence_length = 512
    pre = Preprocessor(cfg)
    raw = np.random.default_rng(2).normal(0, 8000, size=(2000, 6)).astype(np.float32)
    out = pre.make_windows_batch([raw])
    assert pre.preprocessing_stats["truncated_sequences"] == 1
    assert "truncated" in capsys.readouterr().out
    w, s = cfg.data.imu_window_size, cfg.data.imu_stride
    assert len(out[0]) == (512 - w) // s + 1
