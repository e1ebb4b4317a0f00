"""Offline frame extraction: cached JPEG clips match the online decoder."""
from pathlib import Path

import numpy as np
import pytest

from tpuhar.data.frames import FrameBankReader, FrameBankWriter
from tpuhar.data.loader import BatchLoader, decode_clip
from tpuhar.data.preprocess import Preprocessor


def test_frame_bank_roundtrip(tmp_path, rng):
    """Writer extracts the exact frames decode_clip would pick; reader reproduces
    them up to JPEG loss."""
    import cv2

    vid = tmp_path / "v.mp4"
    w = cv2.VideoWriter(str(vid), cv2.VideoWriter_fourcc(*"mp4v"), 25.0, (64, 64))
    for i in range(120):
        w.write(np.full((64, 64, 3), min(i * 2, 255), dtype=np.uint8))
    w.release()

    writer = FrameBankWriter(
        tmp_path / "frames.bin", num_frames=8, resize_hw=(64, 64)
    )
    starts = [0, 62]
    writer.add_video(vid, starts, window_seconds=2.0, fallback_fps=25.0)
    table = writer.finalize(tmp_path / "idx.npy")
    assert table.shape == (2, 8, 2)
    assert (table >= 0).all()

    reader = FrameBankReader(tmp_path / "frames.bin", tmp_path / "idx.npy")
    for wi, start in enumerate(starts):
        cached = reader.read_clip(wi, (64, 64))
        online = decode_clip(
            vid, start, num_frames=8, window_seconds=2.0,
            fallback_fps=25.0, resize_hw=(64, 64),
        )
        diff = np.abs(cached.astype(int) - online.astype(int)).mean()
        assert diff < 6.0, f"window {wi}: mean abs diff {diff}"
    reader.close()


def test_frame_bank_missing_video_sentinel(tmp_path):
    writer = FrameBankWriter(tmp_path / "f.bin", num_frames=4, resize_hw=(32, 32))
    writer.add_missing(3)
    writer.add_video(
        tmp_path / "nope.mp4", [0], window_seconds=5.0, fallback_fps=25.0
    )
    table = writer.finalize(tmp_path / "i.npy")
    assert table.shape == (4, 4, 2)
    assert (table == -1).all()


def test_preprocess_writes_frame_bank(synthetic_config):
    cfg = synthetic_config
    assert cfg.data.extract_frames
    pp = Preprocessor(cfg)
    df = pp.preprocess_split("train", save=True)
    base = Path(cfg.paths.preprocessed_dir)
    assert (base / "train_frames.bin").exists()
    idx = np.load(base / "train_frame_index.npy")
    assert idx.shape[0] == len(df)
    assert idx.shape[1] == cfg.data.video_frames_per_window
    # fixture always has videos → every window has frames
    assert (idx[:, :, 0] >= 0).all()


def test_loader_uses_frame_bank(synthetic_config, monkeypatch):
    cfg = synthetic_config
    pp = Preprocessor(cfg)
    df = pp.preprocess_split("val", save=True)

    loader = BatchLoader(df, cfg, mode="cross_modal", batch_size=4, prefetch=0)
    assert loader._frame_banks is not None

    # cached clips should match online decode within JPEG tolerance
    batch = next(iter(loader))
    import tpuhar.data.loader as L

    row = df.iloc[int(batch["idx"][0])]
    online = decode_clip(
        Path(cfg.paths.base_input) / row["video_path"],
        int(row["start_frame"]),
        num_frames=cfg.data.video_frames_per_window,
        window_seconds=cfg.data.imu_window_size / cfg.data.imu_sampling_rate,
        fallback_fps=float(cfg.data.video_fps),
        resize_hw=tuple(cfg.data.video_resize),
    )
    cached = batch["video"][0]
    # the fixture's frames are noise, which JPEG mangles pixel-wise; the per-frame
    # mean intensities (the class tint signal) must survive the cache round trip
    np.testing.assert_allclose(
        cached.reshape(cached.shape[0], -1).mean(1),
        online.reshape(online.shape[0], -1).mean(1),
        atol=4.0,
    )

    # and the bank path must actually be exercised: poison decode_clip
    def boom(*a, **k):
        raise AssertionError("online decoder should not be called")

    monkeypatch.setattr(L, "decode_clip", boom)
    loader2 = BatchLoader(df, cfg, mode="cross_modal", batch_size=4, prefetch=0)
    _ = list(loader2)


def test_frame_bank_channel_order_matches_online(tmp_path):
    """Regression: cached clips must be RGB like the online decoder's.

    The writer used to convert BGR→RGB before imencode (which assumes BGR) while
    the reader also flipped after imdecode — a double flip returning
    channel-swapped clips (red came back blue).  The old roundtrip test used
    gray frames (all channels equal), hiding it; this one uses a saturated color.
    """
    import cv2

    vid = tmp_path / "v.mp4"
    w = cv2.VideoWriter(str(vid), cv2.VideoWriter_fourcc(*"mp4v"), 25.0, (64, 64))
    frame_bgr = np.zeros((64, 64, 3), np.uint8)
    frame_bgr[..., 2] = 230  # red in BGR order
    for _ in range(60):
        w.write(frame_bgr)
    w.release()

    writer = FrameBankWriter(tmp_path / "frames.bin", num_frames=4, resize_hw=(64, 64))
    writer.add_video(vid, [0], window_seconds=2.0, fallback_fps=25.0)
    writer.finalize(tmp_path / "idx.npy")
    reader = FrameBankReader(tmp_path / "frames.bin", tmp_path / "idx.npy")
    cached = reader.read_clip(0, (64, 64))
    online = decode_clip(
        vid, 0, num_frames=4, window_seconds=2.0, fallback_fps=25.0,
        resize_hw=(64, 64),
    )
    reader.close()
    # both must be RGB: red channel hot, blue cold
    for name, clip in (("cached", cached), ("online", online)):
        r, b = float(clip[..., 0].mean()), float(clip[..., 2].mean())
        assert r > 150 and b < 80, f"{name} clip not RGB: R={r:.0f} B={b:.0f}"
    diff = np.abs(cached.astype(int) - online.astype(int)).mean()
    assert diff < 6.0, f"cached vs online mean abs diff {diff}"


def test_legacy_bank_without_sidecar_served_unflipped(tmp_path):
    """Banks written before the channel fix (no v2 sidecar) store true RGB under
    cv2's BGR label; the reader must serve them WITHOUT its flip (and never
    through the native RGB decoder)."""
    import cv2

    # simulate the pre-fix writer: imencode fed the RGB array (treating it as BGR)
    red_rgb = np.zeros((32, 32, 3), np.uint8)
    red_rgb[..., 0] = 230
    ok, buf = cv2.imencode(".jpg", red_rgb, [cv2.IMWRITE_JPEG_QUALITY, 90])
    assert ok
    data = buf.tobytes()
    (tmp_path / "f.bin").write_bytes(data)
    np.save(tmp_path / "i.npy", np.asarray([[[0, len(data)]]], np.int64))
    # no .meta.json sidecar → legacy

    reader = FrameBankReader(tmp_path / "f.bin", tmp_path / "i.npy")
    assert reader.legacy_color
    clip = reader.read_clip(0, (32, 32))
    r, b = float(clip[0, ..., 0].mean()), float(clip[0, ..., 2].mean())
    assert r > 150 and b < 80, f"legacy clip not served as RGB: R={r:.0f} B={b:.0f}"
    reader.close()

    # v2 sidecar present → current semantics (flip) — written by finalize()
    writer = FrameBankWriter(tmp_path / "g.bin", num_frames=1, resize_hw=(32, 32))
    writer.rows.append(np.asarray([[0, 1]], np.int64))  # dummy row to trigger save
    writer.finalize(tmp_path / "j.npy")
    assert (tmp_path / "j.meta.json").exists()
