"""Golden tests: on-device featurization ops vs their scipy/numpy references."""
import numpy as np
import pytest
import scipy.signal as signal

import jax.numpy as jnp

from tpuhar.ops import featurize as F


def test_raw_to_physical(rng):
    raw = rng.normal(0, 10000, size=(100, 6)).astype(np.float32)
    out = np.asarray(F.raw_to_physical(jnp.asarray(raw)))
    expected = np.concatenate([raw[:, :3] / 16384.0, raw[:, 3:] / 16.4], axis=1)
    np.testing.assert_allclose(out, expected, rtol=1e-6)


@pytest.mark.parametrize("k", [3, 5, 7])
def test_median_filter_matches_scipy(rng, k):
    x = rng.normal(size=(257, 6)).astype(np.float32)
    out = np.asarray(F.median_filter_time(jnp.asarray(x), k))
    expected = np.stack(
        [signal.medfilt(x[:, c], kernel_size=k) for c in range(6)], axis=1
    )
    np.testing.assert_allclose(out, expected, atol=1e-7)


def test_median_filter_even_kernel_bumped(rng):
    x = rng.normal(size=(64, 3)).astype(np.float32)
    out4 = np.asarray(F.median_filter_time(jnp.asarray(x), 4))
    out5 = np.asarray(F.median_filter_time(jnp.asarray(x), 5))
    np.testing.assert_array_equal(out4, out5)


def test_median_filter_identity_k1(rng):
    x = rng.normal(size=(50, 2)).astype(np.float32)
    np.testing.assert_array_equal(np.asarray(F.median_filter_time(jnp.asarray(x), 1)), x)


def test_zscore_matches_reference_formula(rng):
    x = rng.normal(3.0, 2.0, size=(300, 6)).astype(np.float32)
    out = np.asarray(F.zscore_time(jnp.asarray(x)))
    mean = x.mean(axis=0, keepdims=True)
    std = x.std(axis=0, keepdims=True) + 1e-8
    np.testing.assert_allclose(out, (x - mean) / std, atol=1e-5)


def test_masked_zscore_equals_cropped_zscore(rng):
    T, valid = 512, 300
    x = np.zeros((T, 6), dtype=np.float32)
    x[:valid] = rng.normal(1.0, 3.0, size=(valid, 6))
    out = np.asarray(F.masked_zscore_time(jnp.asarray(x), jnp.asarray(valid)))
    expected = np.asarray(F.zscore_time(jnp.asarray(x[:valid])))
    np.testing.assert_allclose(out[:valid], expected, atol=1e-4)


def test_window_slice_matches_loop(rng):
    x = rng.normal(size=(700, 6)).astype(np.float32)
    out = np.asarray(F.window_slice(jnp.asarray(x), 250, 125))
    expected = np.stack([x[s : s + 250] for s in range(0, 700 - 250 + 1, 125)])
    assert out.shape == expected.shape == (4, 250, 6)
    np.testing.assert_array_equal(out, expected)


def test_window_slice_padded_counts():
    x = jnp.zeros((1024, 6))
    _, n = F.window_slice_padded(x, jnp.asarray(700), 250, 125)
    assert int(n) == 4
    _, n = F.window_slice_padded(x, jnp.asarray(100), 250, 125)  # short → padded → 1
    assert int(n) == 1
    _, n = F.window_slice_padded(x, jnp.asarray(0), 250, 125)
    assert int(n) == 0


@pytest.mark.parametrize("n_in,n_out", [(500, 250), (250, 500), (501, 250), (100, 333)])
def test_fourier_resample_matches_scipy(rng, n_in, n_out):
    x = rng.normal(size=(n_in, 3)).astype(np.float32)
    out = np.asarray(F.fourier_resample(jnp.asarray(x), n_out))
    expected = np.stack(
        [signal.resample(x[:, c], n_out) for c in range(3)], axis=1
    ).astype(np.float32)
    np.testing.assert_allclose(out, expected, atol=2e-4)


def test_preprocess_sequence_matches_host_chain(rng):
    """Full fused device pipeline vs the reference's scipy chain on a padded sequence."""
    n = 700
    raw = rng.normal(0, 8000, size=(n, 6)).astype(np.float32)

    # host reference chain (preprocessing.py:156-243)
    imu = np.concatenate([raw[:, :3] / 16384.0, raw[:, 3:] / 16.4], axis=1).astype(
        np.float32
    )
    filt = np.stack(
        [signal.medfilt(imu[:, c], kernel_size=5) for c in range(6)], axis=1
    )
    mean, std = filt.mean(0, keepdims=True), filt.std(0, keepdims=True) + 1e-8
    norm = (filt - mean) / std
    expected = np.stack([norm[s : s + 250] for s in range(0, n - 250 + 1, 125)])

    padded = np.zeros((1024, 6), dtype=np.float32)
    padded[:n] = raw
    windows, n_valid = F.preprocess_sequence(
        jnp.asarray(padded), jnp.asarray(n), window=250, stride=125
    )
    assert int(n_valid) == expected.shape[0]
    np.testing.assert_allclose(
        np.asarray(windows[: int(n_valid)]), expected, atol=1e-4
    )


def test_preprocess_sequence_short_padded(rng):
    """Sequences shorter than the window yield one zero-padded window (pad_short_sequences)."""
    n = 100
    raw = rng.normal(0, 8000, size=(n, 6)).astype(np.float32)
    padded = np.zeros((256, 6), dtype=np.float32)
    padded[:n] = raw
    windows, n_valid = F.preprocess_sequence(
        jnp.asarray(padded), jnp.asarray(n), window=250, stride=125
    )
    assert int(n_valid) == 1
    w = np.asarray(windows[0])
    assert np.abs(w[n + 2 :]).max() == 0.0  # padding normalized away then re-zeroed
    assert np.abs(w[:n]).sum() > 0


def test_stft_featurize_shapes(rng):
    x = rng.normal(size=(2, 250, 6)).astype(np.float32)
    out = F.stft_featurize(jnp.asarray(x), nperseg=64, hop=32)
    n_frames = (250 - 64) // 32 + 1
    assert out.shape == (2, 6, n_frames, 33)
    assert np.isfinite(np.asarray(out)).all()


def test_stft_featurize_tone_peak():
    """A pure tone concentrates energy in the right STFT bin."""
    sr, f0 = 50.0, 10.0
    t = np.arange(256) / sr
    x = np.sin(2 * np.pi * f0 * t).astype(np.float32)[:, None]
    out = np.asarray(F.stft_featurize(jnp.asarray(x), nperseg=64, hop=32))
    # bin spacing = sr / nperseg; expect peak at f0 / (sr/64) = 12.8 → bin 13
    peak_bins = out[0].argmax(axis=-1)
    assert np.all(np.abs(peak_bins - 12.8) <= 1)


def test_featurize_windows_serving_path(rng):
    raw = rng.normal(0, 8000, size=(3, 250, 6)).astype(np.float32)
    out = np.asarray(F.featurize_windows(jnp.asarray(raw)))
    assert out.shape == (3, 6, 250)
    # spot-check one batch element against the host chain with per-window stats
    imu = np.concatenate(
        [raw[1, :, :3] / 16384.0, raw[1, :, 3:] / 16.4], axis=1
    ).astype(np.float32)
    filt = np.stack(
        [signal.medfilt(imu[:, c], kernel_size=5) for c in range(6)], axis=1
    )
    norm = (filt - filt.mean(0, keepdims=True)) / (filt.std(0, keepdims=True) + 1e-8)
    np.testing.assert_allclose(out[1], norm.T, atol=1e-4)


def test_auto_platform_honors_default_device_scope():
    """Regression: in a TPU process, serving_quant's CPU-side recalibration jits
    the serving forward under ``jax.default_device(cpu)`` — the Pallas TPU kernel
    must NOT be selected there ("Only interpret mode is supported on CPU
    backend", hit live 2026-08-18).  The dispatch must honor the explicit
    default-device config over ``jax.devices()[0]``."""
    import jax

    from tpuhar.ops.fused_window import _auto_platform

    with jax.default_device(jax.devices("cpu")[0]):
        assert _auto_platform() == "cpu"
