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
    easy = {c: [_dominant_freq(_synth_sequence(rng, n, c)) for _ in range(8)]
            for c in (2, 3)}
    hard = {c: [_dominant_freq(_synth_sequence(rng, n, c, difficulty="hard"))
                for _ in range(8)] for c in (2, 3)}
    # easy: class frequency bands are disjoint by construction (0.7 Hz gap)
    assert max(easy[2]) < min(easy[3])
    # hard: +-0.09 Hz jitter vs 0.12 Hz gap -> the observed ranges overlap
    assert max(hard[2]) > min(hard[3]) - 0.02


def test_hard_removes_amplitude_cue():
    rng = np.random.default_rng(1)
    amp = {d: [np.abs(_synth_sequence(rng, 1000, c, difficulty=d)[:, :3]).mean()
               for c in range(4)] for d in ("easy", "hard")}
    spread = {d: (max(a) - min(a)) / np.mean(a) for d, a in amp.items()}
    # easy amplitudes grow with class index (a trivial cue); hard shares them
    assert spread["easy"] > 2 * spread["hard"]


def test_freq_jitter_override_widens_spread():
    rng = np.random.default_rng(2)
    f_default = [_dominant_freq(_synth_sequence(rng, 4000, 2, difficulty="hard"))
                 for _ in range(12)]
    f_wide = [_dominant_freq(_synth_sequence(rng, 4000, 2, difficulty="hard",
                                             freq_jitter=0.25)) for _ in range(12)]
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
