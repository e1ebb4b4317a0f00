"""Loader units: clip decoding, IMU window robustness, batch contracts."""
from pathlib import Path

import numpy as np
import pytest

from tpuhar.data.loader import BatchLoader, decode_clip, load_imu_window


@pytest.fixture(scope="module")
def indexed_video(tmp_path_factory):
    """An mp4 whose frame index is encoded in the pixel intensity (idx*2)."""
    import cv2

    path = tmp_path_factory.mktemp("vid") / "indexed.mp4"
    w = cv2.VideoWriter(str(path), cv2.VideoWriter_fourcc(*"mp4v"), 25.0, (48, 48))
    for i in range(100):
        w.write(np.full((48, 48, 3), i * 2, dtype=np.uint8))
    w.release()
    return path


def _mean_index(frame):
    return frame.mean() / 2.0


def test_decode_clip_uniform_selection(indexed_video):
    clip = decode_clip(
        indexed_video, 10, num_frames=8, window_seconds=2.0,
        fallback_fps=25.0, resize_hw=(48, 48),
    )
    assert clip.shape == (8, 48, 48, 3)
    # window = 2s*25fps = 50 frames → linspace(10, 59, 8)
    expected = np.linspace(10, 59, 8).astype(int)
    got = np.array([_mean_index(f) for f in clip])
    # lossy mp4 shifts levels by a constant; check spacing and absolute-with-slack
    np.testing.assert_allclose(got, expected, atol=2.5)
    np.testing.assert_allclose(np.diff(got), np.diff(expected), atol=1.0)


def test_decode_clip_clamps_past_end(indexed_video):
    clip = decode_clip(
        indexed_video, 90, num_frames=4, window_seconds=2.0,
        fallback_fps=25.0, resize_hw=(48, 48),
    )
    got = np.array([_mean_index(f) for f in clip])
    assert got.max() <= 100.0
    assert got.min() >= 87.5  # codec level shift


def test_decode_clip_resizes(indexed_video):
    clip = decode_clip(
        indexed_video, 0, num_frames=2, window_seconds=1.0,
        fallback_fps=25.0, resize_hw=(24, 32),
    )
    assert clip.shape == (2, 24, 32, 3)


def test_decode_clip_missing_is_black(tmp_path):
    clip = decode_clip(
        tmp_path / "nope.mp4", 0, num_frames=4, window_seconds=5.0,
        fallback_fps=25.0, resize_hw=(32, 32),
    )
    assert clip.shape == (4, 32, 32, 3)
    assert clip.max() == 0


def test_decode_clip_corrupt_is_black(tmp_path):
    bad = tmp_path / "corrupt.mp4"
    bad.write_bytes(b"this is not a video")
    clip = decode_clip(
        bad, 0, num_frames=4, window_seconds=5.0,
        fallback_fps=25.0, resize_hw=(32, 32),
    )
    assert clip.max() == 0


# ---------------------------------------------------------------------------------
# IMU window robustness (reference datasets.py:105-145 semantics)
# ---------------------------------------------------------------------------------
def test_load_imu_window_happy(tmp_path, rng):
    w = rng.normal(size=(250, 6)).astype(np.float32)
    np.save(tmp_path / "w.npy", w)
    out = load_imu_window(str(tmp_path / "w.npy"), tmp_path, 6, 250)
    np.testing.assert_array_equal(out, w.T)


def test_load_imu_window_transposed_input(tmp_path, rng):
    w = rng.normal(size=(6, 250)).astype(np.float32)  # (C,T) on disk
    np.save(tmp_path / "w.npy", w)
    out = load_imu_window(str(tmp_path / "w.npy"), tmp_path, 6, 250)
    np.testing.assert_array_equal(out, w)  # transpose-detected


def test_load_imu_window_pad_crop(tmp_path, rng):
    w = rng.normal(size=(100, 4)).astype(np.float32)  # short + narrow
    np.save(tmp_path / "w.npy", w)
    out = load_imu_window(str(tmp_path / "w.npy"), tmp_path, 6, 250)
    assert out.shape == (6, 250)
    np.testing.assert_array_equal(out[:4, :100], w.T)
    assert out[4:].sum() == 0 and out[:, 100:].sum() == 0


def test_load_imu_window_missing_is_zeros(tmp_path):
    out = load_imu_window("missing.npy", tmp_path, 6, 250)
    assert out.shape == (6, 250) and out.sum() == 0


def test_load_imu_window_garbage_is_zeros(tmp_path):
    np.save(tmp_path / "w.npy", np.zeros((2, 2, 2)))  # wrong ndim
    out = load_imu_window(str(tmp_path / "w.npy"), tmp_path, 6, 250)
    assert out.sum() == 0


# ---------------------------------------------------------------------------------
# Batch contracts
# ---------------------------------------------------------------------------------
def test_loader_drop_last_and_padding(synthetic_config):
    from tpuhar.data.preprocess import Preprocessor

    cfg = synthetic_config
    df = Preprocessor(cfg).preprocess_split("train", save=True)
    n = len(df)
    bs = 8
    train = BatchLoader(
        df, cfg, mode="classification", batch_size=bs, shuffle=True,
        drop_last=True, prefetch=0,
    )
    assert len(train) == n // bs
    batches = list(train)
    assert all(b["imu"].shape == (bs, 6, 250) for b in batches)
    assert all(int(b["n_valid"]) == bs for b in batches)

    ev = BatchLoader(df, cfg, mode="classification", batch_size=bs, prefetch=0)
    last = list(ev)[-1]
    assert last["imu"].shape == (bs, 6, 250)  # padded static shape
    assert int(last["n_valid"]) == n - (len(ev) - 1) * bs

    # shuffled order differs across epochs but is deterministic per epoch
    train.set_epoch(0)
    order0 = [b["idx"].tolist() for b in train]
    train.set_epoch(1)
    order1 = [b["idx"].tolist() for b in train]
    train.set_epoch(0)
    order0b = [b["idx"].tolist() for b in train]
    assert order0 == order0b
    assert order0 != order1


def test_loader_prefetch_matches_sync(synthetic_config):
    from tpuhar.data.preprocess import Preprocessor

    cfg = synthetic_config
    df = Preprocessor(cfg).preprocess_split("val", save=True)
    sync = BatchLoader(df, cfg, mode="classification", batch_size=4, prefetch=0)
    pre = BatchLoader(df, cfg, mode="classification", batch_size=4, prefetch=2)
    a = [b["imu"] for b in sync]
    b = [x["imu"] for x in pre]
    assert len(a) == len(b)
    for x, y in zip(a, b):
        np.testing.assert_array_equal(x, y)


def test_process_pool_decode_matches_threaded(synthetic_config):
    """decode_processes=2 must produce byte-identical batches to the in-process
    thread decode (VERDICT r1 #8: multi-core host feeding path)."""
    import numpy as np

    from tpuhar.data.loader import BatchLoader
    from tpuhar.data.preprocess import Preprocessor

    cfg = synthetic_config
    df = Preprocessor(cfg).preprocess_split("train", save=True)
    kw = dict(mode="cross_modal", batch_size=4, prefetch=0)
    threaded = list(BatchLoader(df.head(8), cfg, **kw))
    pooled = list(BatchLoader(df.head(8), cfg, decode_processes=2, **kw))
    assert len(threaded) == len(pooled)
    for bt, bp in zip(threaded, pooled):
        np.testing.assert_array_equal(bt["video"], bp["video"])
        np.testing.assert_array_equal(bt["imu"], bp["imu"])


def test_loader_fusion_mode_carries_video_and_labels(synthetic_config):
    """``mode="fusion"`` = cross_modal batch (imu+video) + classification labels —
    the supervised training surface for the north-star FusionClassifier."""
    from tpuhar.data.preprocess import Preprocessor

    cfg = synthetic_config
    df = Preprocessor(cfg).preprocess_split("val", save=True)
    H, W = cfg.data.video_resize
    T = cfg.data.video_frames_per_window
    bs = 4
    fused = list(BatchLoader(df, cfg, mode="fusion", batch_size=bs, prefetch=0))
    assert all(b["video"].shape == (bs, T, H, W, 3) for b in fused)
    assert all(b["video"].dtype == np.uint8 for b in fused)
    assert all(b["label"].shape == (bs,) for b in fused)

    # imu/label agree with classification mode, video with cross_modal mode
    cls = list(BatchLoader(df, cfg, mode="classification", batch_size=bs, prefetch=0))
    cm = list(BatchLoader(df, cfg, mode="cross_modal", batch_size=bs, prefetch=0))
    for f, c, v in zip(fused, cls, cm):
        np.testing.assert_array_equal(f["imu"], c["imu"])
        np.testing.assert_array_equal(f["label"], c["label"])
        np.testing.assert_array_equal(f["video"], v["video"])
