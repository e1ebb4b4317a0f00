"""Raw serving streams (tpuhar/data/raw_stream.py): the CLI `--mode serve` /
bench_serving_stream input path.

The critical contract: ``RawWindowReader``'s slicing math must equal the
preprocessor's — with ``zscore_scope="window"`` the engine's on-device
featurization of a reader window must then reproduce the offline featurized
window bit-for-bit (the train==serve closure extended to the RAW manifest path).
"""
import numpy as np
import pytest

from tpuhar.data.preprocess import Preprocessor
from tpuhar.data.raw_stream import RawWindowReader, raw_serving_stream


@pytest.fixture()
def preprocessed(synthetic_config):
    cfg = synthetic_config
    cfg.data.zscore_scope = "window"
    cfg.data.video_frames_per_window = 4
    dfs = {
        s: Preprocessor(cfg).preprocess_split(s, save=True)
        for s in ("train", "test")
    }
    return cfg, dfs


def test_reader_matches_preprocessor_windows(preprocessed):
    from tpuhar.ops.featurize import featurize_windows
    from tpuhar.data.loader import load_imu_window

    cfg, dfs = preprocessed
    df = dfs["test"].head(8)
    reader = RawWindowReader(cfg)
    for row in df.itertuples():
        raw = reader.window(row)
        assert raw.shape == (cfg.data.imu_window_size, cfg.data.imu_channels)
        served = np.asarray(
            featurize_windows(
                raw[None],
                kernel_size=cfg.data.median_filter_kernel,
                normalize=cfg.data.normalize_imu,
                racc=cfg.data.Racc,
                rgyro=cfg.data.Rgyro,
            )
        )[0]  # (C, T) — the model/loader convention
        offline = load_imu_window(
            row.imu_window_path, cfg.paths.preprocessed_dir,
            cfg.data.imu_channels, cfg.data.imu_window_size,
        )
        np.testing.assert_array_equal(offline, served)


def test_stream_imu_only_batching(preprocessed):
    cfg, dfs = preprocessed
    df = dfs["test"]
    batches = list(raw_serving_stream(cfg, df, batch_size=4, with_video=False))
    assert sum(len(b[0]) for b in batches) == len(df)
    assert all(len(b) == 1 for b in batches)
    assert batches[0][0].shape[1:] == (
        cfg.data.imu_window_size, cfg.data.imu_channels,
    )


def test_stream_fusion_pairs_and_max_windows(preprocessed):
    cfg, dfs = preprocessed
    df = dfs["test"]
    got = 0
    for imu, video in raw_serving_stream(
        cfg, df, batch_size=4, with_video=True, max_windows=6
    ):
        assert len(imu) == len(video)
        assert video.dtype == np.uint8
        assert video.shape[1] == cfg.data.video_frames_per_window
        got += len(imu)
    assert 6 <= got <= 8  # stops at the first batch boundary past max_windows
