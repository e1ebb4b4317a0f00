"""Synthetic fixture generator knobs: difficulty, label noise, frequency jitter.

The hard fixture exists so the accuracy head-to-head can FAIL (VERDICT r2); these
tests pin the properties that make it hard — overlapping per-sequence frequencies,
no amplitude cue, train-only label noise — without training anything.
"""
import numpy as np
import pytest

from tpuhar.data.synthetic import _synth_sequence, generate_synthetic_dataset


def _dominant_freq(seq: np.ndarray, fs: float = 50.0) -> float:
    """Peak FFT frequency of channel 0 (the 1x-harmonic accelerometer channel)."""
    x = seq[:, 0] - seq[:, 0].mean()
    spec = np.abs(np.fft.rfft(x * np.hanning(len(x))))
    freqs = np.fft.rfftfreq(len(x), 1.0 / fs)
    return float(freqs[spec.argmax()])


def test_hard_classes_overlap_easy_classes_do_not():
    rng = np.random.default_rng(0)
    n = 4000  # long sequence -> fine FFT resolution (0.0125 Hz)
    easy = {c: [_dominant_freq(_synth_sequence(rng, n, c)[0]) for _ in range(8)]
            for c in (2, 3)}
    hard = {c: [_dominant_freq(_synth_sequence(rng, n, c, difficulty="hard")[0])
                for _ in range(8)] for c in (2, 3)}
    # easy: class frequency bands are disjoint by construction (0.7 Hz gap)
    assert max(easy[2]) < min(easy[3])
    # hard: +-0.09 Hz jitter vs 0.12 Hz gap -> the observed ranges overlap
    assert max(hard[2]) > min(hard[3]) - 0.02


def test_hard_removes_amplitude_cue():
    rng = np.random.default_rng(1)
    amp = {d: [np.abs(_synth_sequence(rng, 1000, c, difficulty=d)[0][:, :3]).mean()
               for c in range(4)] for d in ("easy", "hard")}
    spread = {d: (max(a) - min(a)) / np.mean(a) for d, a in amp.items()}
    # easy amplitudes grow with class index (a trivial cue); hard shares them
    assert spread["easy"] > 2 * spread["hard"]


def test_freq_jitter_override_widens_spread():
    rng = np.random.default_rng(2)
    f_default = [_dominant_freq(_synth_sequence(rng, 4000, 2, difficulty="hard")[0])
                 for _ in range(12)]
    f_wide = [_dominant_freq(_synth_sequence(rng, 4000, 2, difficulty="hard",
                                             freq_jitter=0.25)[0]) for _ in range(12)]
    assert np.ptp(f_wide) > np.ptp(f_default)


def test_label_noise_train_only(tmp_path):
    root = generate_synthetic_dataset(
        tmp_path / "ds", num_classes=4, samples_per_class=6, seq_len=300,
        with_video=False, difficulty="hard", label_noise=0.5, seed=3,
    )

    def flipped(split):
        out = 0
        for line in (root / f"{split}.txt").read_text().splitlines():
            path, _, _, label = line.rsplit(" ", 3)
            true = int(path.split("/")[-2].split("_")[0])
            out += int(label) != true
        return out

    assert flipped("train") > 0  # 50% noise over 24 lines: P(none)=2^-24
    assert flipped("val") == 0 and flipped("test") == 0


def test_difficulty_validation():
    with pytest.raises(ValueError, match="difficulty"):
        generate_synthetic_dataset("/tmp/nope", difficulty="medium")


def test_cross_modal_coupling_pulses_at_sequence_freq(tmp_path):
    """With coupling on, the video brightness pulse tracks the sequence's IMU
    frequency (instance-level shared structure); off, all sequences pulse at the
    fixed 16-frame period regardless of their IMU frequency."""
    import cv2

    for coupled in (False, True):
        root = generate_synthetic_dataset(
            tmp_path / f"ds{coupled}", num_classes=2, samples_per_class=2,
            seq_len=1500, difficulty="hard", seed=7,
            cross_modal_coupling=coupled,
        )
        pulse = {}
        for ci in range(2):
            cdir = f"{ci}_activity{ci}"
            vid = root / "video" / cdir / f"{cdir}_train_0.mp4"
            cap = cv2.VideoCapture(str(vid))
            means = []
            while True:
                ok, frame = cap.read()
                if not ok:
                    break
                means.append(frame.mean())
            cap.release()
            x = np.asarray(means) - np.mean(means)
            spec = np.abs(np.fft.rfft(x * np.hanning(len(x))))
            fps = 25.0
            freqs = np.fft.rfftfreq(len(x), 1.0 / fps)
            pulse[ci] = float(freqs[spec[1:].argmax() + 1])
            # the IMU sequence's own frequency
            seq = np.loadtxt(
                root / "sensor" / cdir / f"{cdir}_train_0.csv", delimiter=","
            )
            imu_f = _dominant_freq(seq)
            if coupled:
                assert abs(pulse[ci] - imu_f) < 0.1, (ci, pulse[ci], imu_f)
        if not coupled:
            # fixed 16-frame period at 25 fps = 1.5625 Hz for every sequence
            for ci, f in pulse.items():
                assert abs(f - 25.0 / 16.0) < 0.1, (ci, f)


def test_coupling_strength_scales_pulse_amplitude(tmp_path):
    """coupling_strength multiplies the brightness-pulse amplitude (the
    strength-1.0 pulse is unlearnable — docs/BENCHMARKS.md 'Article
    workflow'); the spectral peak at the pulse frequency must scale ~linearly."""
    import cv2

    def pulse_power(strength):
        root = generate_synthetic_dataset(
            tmp_path / f"s{strength:g}", num_classes=1, samples_per_class=1,
            seq_len=1500, difficulty="hard", seed=11,
            cross_modal_coupling=True, coupling_strength=strength,
        )
        cdir = "0_activity0"
        cap = cv2.VideoCapture(str(root / "video" / cdir / f"{cdir}_train_0.mp4"))
        means = []
        while True:
            ok, frame = cap.read()
            if not ok:
                break
            means.append(frame.mean())
        cap.release()
        x = np.asarray(means) - np.mean(means)
        spec = np.abs(np.fft.rfft(x * np.hanning(len(x))))
        return float(spec[1:].max())

    p1, p4 = pulse_power(1.0), pulse_power(4.0)
    assert p4 > 2.5 * p1, (p1, p4)
