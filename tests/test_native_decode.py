"""Native batched JPEG decoder: build, parity with cv2, fallback semantics."""
import numpy as np
import pytest

from tpuhar import native


requires_native = pytest.mark.skipif(
    not native.decode_available(), reason="no C toolchain / libjpeg on this host"
)


def _encode(imgs_rgb):
    """cv2-encode RGB images exactly as the frame bank writer does (BGR input)."""
    import cv2

    blob = b""
    offs, lens = [], []
    for img in imgs_rgb:
        ok, buf = cv2.imencode(".jpg", img[..., ::-1], [cv2.IMWRITE_JPEG_QUALITY, 90])
        assert ok
        data = buf.tobytes()
        offs.append(len(blob))
        lens.append(len(data))
        blob += data
    return blob, np.asarray(offs, np.int64), np.asarray(lens, np.int64)


@requires_native
def test_native_matches_cv2(rng):
    import cv2

    H, W, n = 48, 64, 5
    imgs = (rng.random((n, H, W, 3)) * 255).astype(np.uint8)
    blob, offs, lens = _encode(imgs)

    got = native.decode_jpeg_bank(blob, offs, lens, H, W)
    assert got is not None and got.shape == (n, H, W, 3)

    for i in range(n):
        buf = np.frombuffer(blob[offs[i] : offs[i] + lens[i]], np.uint8)
        want = cv2.imdecode(buf, cv2.IMREAD_COLOR)[..., ::-1]  # BGR → RGB
        # both are libjpeg-turbo; allow a couple LSB for version/IDCT differences
        diff = np.abs(got[i].astype(int) - want.astype(int)).max()
        assert diff <= 3, f"image {i}: maxdiff {diff}"


@requires_native
def test_native_gaps_and_threads(rng):
    H, W = 32, 32
    imgs = (rng.random((4, H, W, 3)) * 255).astype(np.uint8)
    blob, offs, lens = _encode(imgs)
    offs = np.concatenate([offs[:2], [0], offs[2:]])
    lens = np.concatenate([lens[:2], [0], lens[2:]])  # gap in the middle

    got1 = native.decode_jpeg_bank(blob, offs, lens, H, W, threads=1)
    got2 = native.decode_jpeg_bank(blob, offs, lens, H, W, threads=3)
    assert got1 is not None and got2 is not None
    assert (got1[2] == 0).all(), "gap must decode to black"
    np.testing.assert_array_equal(got1, got2)


@requires_native
def test_native_dim_mismatch_returns_none(rng):
    imgs = (rng.random((2, 32, 32, 3)) * 255).astype(np.uint8)
    blob, offs, lens = _encode(imgs)
    assert native.decode_jpeg_bank(blob, offs, lens, 48, 48) is None


@requires_native
def test_read_clip_native_matches_cv2(tmp_path, rng):
    """FrameBankReader: backend='native' == backend='cv2' on a real bank."""
    import cv2

    from tpuhar.data.frames import FrameBankReader, FrameBankWriter

    vid = tmp_path / "v.mp4"
    w = cv2.VideoWriter(str(vid), cv2.VideoWriter_fourcc(*"mp4v"), 25.0, (64, 64))
    for i in range(80):
        frame = np.zeros((64, 64, 3), np.uint8)
        frame[..., i % 3] = 50 + 2 * i
        w.write(frame)
    w.release()

    writer = FrameBankWriter(tmp_path / "f.bin", num_frames=6, resize_hw=(64, 64))
    writer.add_video(vid, [0, 40], window_seconds=2.0, fallback_fps=25.0)
    writer.finalize(tmp_path / "i.npy")

    reader = FrameBankReader(tmp_path / "f.bin", tmp_path / "i.npy")
    for row in range(2):
        a = reader.read_clip(row, (64, 64), backend="native")
        b = reader.read_clip(row, (64, 64), backend="cv2")
        diff = np.abs(a.astype(int) - b.astype(int)).max()
        assert diff <= 3, f"row {row}: maxdiff {diff}"
    # stored 64×64, requested 32×32 → native must refuse; auto falls back + resizes
    c = reader.read_clip(0, (32, 32), backend="auto")
    assert c.shape == (6, 32, 32, 3) and c.any()
    with pytest.raises(RuntimeError):
        reader.read_clip(0, (32, 32), backend="native")
    reader.close()
